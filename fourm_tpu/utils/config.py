"""Two-stage config system: CLI > YAML > code defaults.

Equivalent of reference run_training_4m.py:224-238: a pre-parser reads --config,
the YAML is injected as argparse defaults, then the full CLI is parsed so explicit
flags win. Layered configs (main -> data_config -> per-dataset alphas_config) are
resolved by the data glue (data/pretrain_utils.py).
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, List, Optional

import yaml


def parse_args_with_config(parser: argparse.ArgumentParser, args: Optional[List[str]] = None):
    """Parse args with optional --config YAML defaults injection."""
    args = sys.argv[1:] if args is None else args
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default=None, type=str)
    known, remaining = pre.parse_known_args(args)
    parser.add_argument("--config", default=None, type=str,
                        help="YAML config; CLI flags override its values")
    if known.config is not None:
        with open(known.config) as f:
            cfg = yaml.safe_load(f) or {}
        unknown = [k for k in cfg if not any(
            a.dest == k for a in parser._actions
        )]
        if unknown:
            raise ValueError(f"unknown config keys: {unknown}")
        parser.set_defaults(**cfg)
    return parser.parse_args(args)


def load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def expand_run_name(name: str, config_path: Optional[str]) -> str:
    """'auto' run names derive from the config path (reference run_name.py:14-28)."""
    if name != "auto" or not config_path:
        return name
    parts = config_path.replace(".yaml", "").split("/")
    if "cfgs" in parts:
        parts = parts[parts.index("cfgs") + 1:]
    return "-".join(parts)
