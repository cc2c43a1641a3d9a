#!/usr/bin/env python
"""Entry point: python save_vq_tokens.py ... (delegates to fourm_tpu.cli.save_vq_tokens)."""
from fourm_tpu.cli.save_vq_tokens import main

if __name__ == "__main__":
    main()
