"""4M-TPU: a TPU-native (JAX / XLA / Pallas / pjit) any-to-any multimodal framework.

A from-scratch rebuild of the capabilities of apple/ml-4m (4M & 4M-21, massively
multimodal masked modeling) designed for TPU hardware: fixed-shape jitted compute,
SPMD over `jax.sharding.Mesh`, Pallas kernels on the hot paths.

Layer map (mirrors reference `fourm/` — see SURVEY.md §1):
  ops/       transformer & math primitives (reference: fourm/models/fm_utils.py)
  models/    FourM encoder-decoder + embeddings (reference: fourm/models/)
  data/      modality registry, masking engine, datasets (reference: fourm/data/)
  vq/        tokenizer subsystem (reference: fourm/vq/)
  generate/  chained any-to-any generation engine (reference: fourm/models/generate.py)
  parallel/  mesh / sharding / train-step builders (reference: DDP+FSDP scripts)
  utils/     optim, schedules, checkpointing, logging, config
  kernels/   Pallas TPU kernels
"""

__version__ = "0.1.0"
