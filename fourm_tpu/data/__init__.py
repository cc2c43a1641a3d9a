from .modality_info import (
    MODALITY_INFO,
    ModalitySpec,
    generate_uint15_hash,
    get_modality,
)
