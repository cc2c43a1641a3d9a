#!/usr/bin/env python
"""Entry point: python train_wordpiece_tokenizer.py ... (delegates to fourm_tpu.cli.train_text_tokenizer)."""
from fourm_tpu.cli.train_text_tokenizer import main

if __name__ == "__main__":
    main()
