#!/usr/bin/env python
"""Entry point: VQControlNet detokenizer training (reference
run_training_vqcontrolnet.py)."""
from fourm_tpu.cli.train_vqcontrolnet import main

if __name__ == "__main__":
    main()
