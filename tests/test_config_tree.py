"""Config-tree validation (VERDICT round 1, item 8): every cfgs/default YAML
parses; model configs reference existing data/alphas configs, registered model
names, and known modalities."""

import glob
import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CFGS = sorted(glob.glob(os.path.join(REPO, "cfgs", "default", "**", "*.yaml"),
                            recursive=True))


def test_tree_is_populated():
    assert len(ALL_CFGS) >= 55
    families = {p.split("cfgs/default/")[1].split("/")[0] for p in ALL_CFGS}
    assert families == {"4m", "generation", "tokenization"}


@pytest.mark.parametrize("path", ALL_CFGS, ids=lambda p: p.split("cfgs/default/")[1])
def test_yaml_parses(path):
    with open(path) as f:
        cfg = yaml.safe_load(f)
    assert isinstance(cfg, dict) and cfg


def test_model_configs_resolve():
    from fourm_tpu.data.modality_info import MODALITY_INFO
    from fourm_tpu.models.fourm import MODEL_REGISTRY

    for path in glob.glob(os.path.join(REPO, "cfgs/default/4m/models/**/*.yaml"),
                          recursive=True):
        cfg = yaml.safe_load(open(path))
        assert cfg["model"] in MODEL_REGISTRY, path
        assert os.path.exists(os.path.join(REPO, cfg["data_config"])), path
        for field in ("in_domains", "out_domains"):
            for mod in cfg[field].split("-"):
                assert mod in MODALITY_INFO, f"{path}: unknown modality {mod}"
        data_cfg = yaml.safe_load(open(os.path.join(REPO, cfg["data_config"])))
        for name, ds in data_cfg["train"]["datasets"].items():
            ac = ds.get("alphas_config")
            if ac:
                assert os.path.exists(os.path.join(REPO, ac)), f"{path}: {ac}"


def test_alphas_configs_parse_through_sampling_setup():
    from fourm_tpu.data.pretrain_utils import setup_sampling_mod_info

    for path in glob.glob(os.path.join(REPO, "cfgs/default/4m/data/**/*.yaml"),
                          recursive=True):
        data_cfg = yaml.safe_load(open(path))
        for name, ds in data_cfg["train"]["datasets"].items():
            if ds.get("alphas_config"):
                ds = dict(ds)
                ds["alphas_config"] = os.path.join(REPO, ds["alphas_config"])
            mods, in_a, tgt_a, keep, weights = setup_sampling_mod_info(ds)
            assert mods
            assert all(len(v) >= 1 for v in in_a.values())


def test_tokenization_configs_match_cli_flags():
    from fourm_tpu.cli.train_vqcontrolnet import get_parser as cn_parser
    from fourm_tpu.cli.train_vqvae import get_parser as vq_parser

    vq_flags = {a.dest for a in vq_parser()._actions}
    cn_flags = {a.dest for a in cn_parser()._actions}
    for path in glob.glob(os.path.join(REPO, "cfgs/default/tokenization/**/*.yaml"),
                          recursive=True):
        cfg = yaml.safe_load(open(path))
        flags = cn_flags if "vqcontrolnet" in path else vq_flags
        unknown = set(cfg) - flags - {"run_name"}
        assert not unknown, f"{path}: flags unknown to the CLI: {unknown}"


def test_generation_configs_match_cli_flags():
    from fourm_tpu.cli.generate import get_parser

    flags = {a.dest for a in get_parser()._actions}
    for path in glob.glob(os.path.join(REPO, "cfgs/default/generation/settings_*/*.yaml")):
        cfg = yaml.safe_load(open(path))
        unknown = set(cfg) - flags - {"name"}
        assert not unknown, f"{path}: flags unknown to generate CLI: {unknown}"
    for path in glob.glob(os.path.join(REPO, "cfgs/default/generation/models/*.yaml")):
        cfg = yaml.safe_load(open(path))
        unknown = set(cfg) - flags
        assert not unknown, f"{path}: flags unknown to generate CLI: {unknown}"
    for path in glob.glob(os.path.join(REPO, "cfgs/default/generation/data/*.yaml")):
        cfg = yaml.safe_load(open(path))
        unknown = set(cfg) - flags - {"data_name", "num_log_images"}
        assert not unknown, f"{path}: flags unknown to generate CLI: {unknown}"
