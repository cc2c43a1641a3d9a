#!/usr/bin/env python
"""Entry point: DiVAE tokenizer training = train_vqvae with --model_type divae."""
import sys

from fourm_tpu.cli.train_vqvae import main

if __name__ == "__main__":
    sys.argv.insert(1, "--model_type=divae")
    main()
