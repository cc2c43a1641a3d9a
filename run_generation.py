#!/usr/bin/env python
"""Entry point: python run_generation.py ... (delegates to fourm_tpu.cli.generate)."""
from fourm_tpu.cli.generate import main

if __name__ == "__main__":
    main()
