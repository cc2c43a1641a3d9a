#!/usr/bin/env python
"""Entry point: FSDP-style 4M pre-training.

In this framework DDP vs FSDP is just the mesh shape (parallel/mesh.py): this
alias defaults the fsdp axis to all devices (full ZeRO sharding), matching the
reference run_training_4m_fsdp.py use case for L/XL models.
"""
import sys

import jax

from fourm_tpu.cli.train_4m import main

if __name__ == "__main__":
    if not any(a.startswith("--fsdp") for a in sys.argv[1:]):
        sys.argv.append(f"--fsdp={len(jax.devices())}")
    main()
