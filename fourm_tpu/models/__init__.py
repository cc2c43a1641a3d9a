from .fourm import FourM, FourMConfig, MODEL_REGISTRY, create_fourm_config
from .embeddings import (
    ImageEncoderEmbedding,
    ImageTokenDecoderEmbedding,
    ImageTokenEncoderEmbedding,
    SequenceDecoderEmbedding,
    SequenceEmbEncoderEmbedding,
    SequenceEncoderEmbedding,
)
from .fm_vit import FourMViT, FourMViTConfig, params_from_fourm, vit_config_from_registry
from .lora import apply_lora, fuse_lora, init_lora_params, lora_param_count
