#!/usr/bin/env python
"""Entry point: python run_training_4m.py ... (delegates to fourm_tpu.cli.train_4m)."""
from fourm_tpu.cli.train_4m import main

if __name__ == "__main__":
    main()
