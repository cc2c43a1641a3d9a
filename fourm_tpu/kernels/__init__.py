from .attention import pallas_attention
from .vq_codebook import pallas_nearest_code, pallas_nearest_code_cosine
