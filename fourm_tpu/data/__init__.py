from .modality_info import (
    MODALITY_INFO,
    ModalitySpec,
    generate_uint15_hash,
    get_modality,
)
from .transforms import (
    UnifiedDataTransform,
    default_modality_transforms,
    divae_modality_transforms,
    get_transform_key,
)
from .masking import TransferMasking, UnifiedMasking
from .batching import batch_mod_dicts, make_empty_mod
from .datasets import (
    MixtureDataset,
    MultiModalDatasetFolder,
    ShardedTarDataset,
    batched_loader,
    braceexpand,
    build_fm_pretraining_dataset,
    repeat_dataset,
)
from .pretrain_utils import (
    build_mixture_loader,
    get_train_dataset,
    make_unified_masking,
    setup_sampling_mod_info,
)
from .loader import MultiprocessLoader
