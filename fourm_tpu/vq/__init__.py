from .quantizer import VectorQuantize, euclidean_distance_logits, kmeans, l2norm
from .scheduling import (
    PNDMScheduler,
    pndm_sample,
    pndm_step,
    DDIMScheduler,
    DDPMScheduler,
    DiffusionScheduler,
    diffusion_sample,
    enforce_zero_terminal_snr,
    make_alphas_cumprod,
    scaled_cosine_alphas,
    spaced_timesteps,
)
from .uvit import UVIT_PRESETS, UViT, build_uvit
from .vit_models import VIT_SIZES, ViTDecoder, ViTEncoder, build_vit_decoder, build_vit_encoder
from .mlp_models import BottleneckMLP, StandardMLP, build_mlp
from .vqvae import (
    VQ,
    VQVAE,
    DiVAE,
    VQControlNet,
    controlnet_decode_quant,
    controlnet_decode_tokens,
    divae_decode_quant,
    divae_decode_tokens,
)
from .controlnet import (
    AutoencoderKL,
    Token2VAE,
    ControlNetCond,
    controlnet_params_from_unet,
    vqcontrolnet_trainable_mask,
)
from .memcodes import Memcodes
from .unet import PatchedUNetCondCat, UNetModel, unet_patched
from .loader import get_image_tokenizer
from .percept_losses import (LPIPS, VGG16Features, feature_perceptual_loss,
    frechet_distance, import_lpips_state, inception_score, load_lpips, ms_ssim)
