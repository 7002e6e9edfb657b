"""Config preset + dotlist merging (OmegaConf-parity semantics)."""
import os

import pytest

from wildgaussians_tpu.config import (Config, config_to_yaml,
                                      config_from_yaml_str, load_config_yaml,
                                      merge_config)

CFG_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "wildgaussians_tpu", "configs")


def test_default_preset():
    cfg = load_config_yaml(os.path.join(CFG_DIR, "default.yml"))
    assert cfg.iterations == 70000
    assert cfg.num_sky_gaussians == 50000
    assert cfg.uncertainty_mode == "dino"
    assert cfg.appearance_enabled is True
    # non-overridden fields keep dataclass defaults
    assert cfg.kernel_size == 0.1
    assert cfg.densify_grad_threshold == 0.0002


def test_nerfonthego_preset_overrides_only_listed_fields():
    cfg = load_config_yaml(os.path.join(CFG_DIR, "nerfonthego.yml"))
    assert cfg.appearance_enabled is False
    assert cfg.num_sky_gaussians == 100000
    # iterations NOT in the preset -> dataclass default (reference semantics)
    assert cfg.iterations == 30000


def test_phototourism_preset():
    cfg = load_config_yaml(os.path.join(CFG_DIR, "phototourism.yml"))
    assert cfg.iterations == 200000
    assert cfg.densify_until_iter == 100000
    assert cfg.opacity_reset_interval == 15000


def test_dotlist_coercion():
    cfg = merge_config(Config(), {"iterations": "123", "appearance_enabled": "false",
                                  "kernel_size": "0.25",
                                  "uncertainty_dino_max_size": "none"})
    assert cfg.iterations == 123 and cfg.appearance_enabled is False
    assert cfg.kernel_size == 0.25
    assert cfg.uncertainty_dino_max_size is None


def test_unknown_field_rejected():
    with pytest.raises(ValueError):
        merge_config(Config(), {"not_a_field": 1})


def test_yaml_roundtrip():
    cfg = merge_config(Config(), {"iterations": 42, "sh_degree": 2})
    cfg2 = config_from_yaml_str(config_to_yaml(cfg))
    assert cfg2 == cfg
