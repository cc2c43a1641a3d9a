from .posemb import build_1d_sincos_posemb, build_2d_sincos_posemb
from .transformer import (
    Attention,
    Block,
    CrossAttention,
    CrossAttentionBlock,
    DecoderBlock,
    DropPath,
    GatedMlp,
    LayerNorm,
    Mlp,
    dot_product_attention,
    mask_to_bias,
    softmax1,
)
from .token_select import (
    adapt_decoder_attention_mask,
    compact_position_ids,
    gather_tokens,
    select_tokens,
)
from .sampling import sample_tokens, top_k_top_p_filtering
