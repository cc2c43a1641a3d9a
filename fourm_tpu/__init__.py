"""4M-TPU: a TPU-native (JAX / XLA / Pallas / pjit) any-to-any multimodal framework.

A from-scratch rebuild of the capabilities of apple/ml-4m (4M & 4M-21, massively
multimodal masked modeling) designed for TPU hardware: fixed-shape jitted compute,
SPMD over `jax.sharding.Mesh`, Pallas kernels on the hot paths.

Layer map (mirrors reference `fourm/` — see SURVEY.md §1 and PARITY.md):
  ops/       transformer & math primitives (reference: fourm/models/fm_utils.py)
  models/    FourM encoder-decoder + embeddings (reference: fourm/models/)
  data/      modality registry, masking engine, datasets (reference: fourm/data/)
  vq/        tokenizer subsystem (reference: fourm/vq/)
  generate/  chained any-to-any generation engine (reference: fourm/models/generate.py)
  parallel/  mesh / sharding / train-step builders (reference: DDP+FSDP scripts)
  utils/     optim, schedules, checkpointing, logging, config
  kernels/   Pallas TPU kernels
  native/    C++ runtime components (tar-shard reader)
  cli/       training / generation / pre-tokenization entry points
"""

__version__ = "0.1.0"

# Top-level convenience API (lazy heavy imports happen inside submodules)
from .models import FourM, FourMConfig, create_fourm_config  # noqa: F401


def load_sampler(fm_path: str, tokenizers=None, text_tokenizer_path=None, **kw):
    """One-call setup: released 4M safetensors -> ready FourMSampler."""
    from .api import FourMSampler
    from .utils.checkpoint import load_fourm_safetensors
    from .utils.text_tokenizer import load_tokenizer

    config, variables = load_fourm_safetensors(fm_path)
    text_tokenizer = load_tokenizer(text_tokenizer_path) if text_tokenizer_path else None
    return FourMSampler(
        fm=(FourM(config), variables), tokenizers=tokenizers,
        text_tokenizer=text_tokenizer, **kw,
    )
