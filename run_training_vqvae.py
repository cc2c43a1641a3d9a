#!/usr/bin/env python
"""Entry point: python run_training_vqvae.py ... (delegates to fourm_tpu.cli.train_vqvae)."""
from fourm_tpu.cli.train_vqvae import main

if __name__ == "__main__":
    main()
