from .fourm import FourM, FourMConfig, MODEL_REGISTRY, create_fourm_config
from .embeddings import (
    ImageEncoderEmbedding,
    ImageTokenDecoderEmbedding,
    ImageTokenEncoderEmbedding,
    SequenceDecoderEmbedding,
    SequenceEmbEncoderEmbedding,
    SequenceEncoderEmbedding,
)
