"""Config system tests: JSON load, overrides, unknown-key rejection, save."""
import json

import pytest

from keypointnerf_tpu.utils import ExperimentConfig, load_config, save_config


def test_default_config():
    cfg = load_config(None)
    assert cfg.model.n_coarse == 64
    assert cfg.model.sp_type == "rel_z_decay"
    assert cfg.optim.learning_rate == 5e-4
    assert cfg.loss.lambda_l1 == 10.0
    assert cfg.max_epochs == 30


def test_load_json_with_nested(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "name": "exp1",
        "model": {"n_coarse": 32, "sp_sigma": 0.2},
        "optim": {"learning_rate": 1e-3},
    }))
    cfg = load_config(str(p))
    assert cfg.name == "exp1"
    assert cfg.model.n_coarse == 32
    assert cfg.model.sp_sigma == 0.2
    assert cfg.model.n_fine == 64  # default preserved
    assert cfg.optim.learning_rate == 1e-3


def test_overrides():
    cfg = load_config(None, overrides={"optim.learning_rate": 2e-4, "model.patch_h": 32})
    assert cfg.optim.learning_rate == 2e-4
    assert cfg.model.patch_h == 32


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"model": {"n_coarse_typo": 1}}))
    with pytest.raises(KeyError):
        load_config(str(p))


def test_save_config_stamps_git(tmp_path):
    cfg = load_config(None)
    path = save_config(cfg, str(tmp_path))
    d = json.loads(open(path).read())
    assert "__git_head__" in d
    assert d["model"]["n_coarse"] == 64
