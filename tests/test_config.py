"""Config composition tests: defaults, group swaps, dot-list overrides."""
import os

import pytest

from bubbleformer_tpu.config import load_config


def test_default_composition():
    cfg = load_config([])
    assert cfg["model_cfg"]["name"] == "filmavit"
    assert cfg["data_cfg"]["dataset"] == "singlebubble_saturated"
    assert cfg["optim_cfg"]["name"] == "lion"
    assert cfg["scheduler_cfg"]["name"] == "cosine_warmup"
    assert cfg["mesh_cfg"] == {"data": -1, "model": 1}
    assert cfg["seed"] == 42


def test_group_swap_and_value_overrides():
    cfg = load_config(
        [
            "model_cfg=avit_big",
            "optim_cfg=adamw",
            "batch_size=16",
            "model_cfg.params.drop_path=0.1",
            "data_cfg.time_window=7",
            "use_wandb=true",
        ]
    )
    assert cfg["model_cfg"]["name"] == "avit"
    assert cfg["model_cfg"]["params"]["embed_dim"] == 768
    assert cfg["model_cfg"]["params"]["drop_path"] == 0.1
    assert cfg["optim_cfg"]["params"]["weight_decay"] == 1e-2
    assert cfg["batch_size"] == 16
    assert cfg["data_cfg"]["time_window"] == 7
    assert cfg["use_wandb"] is True


def test_env_expansion(monkeypatch):
    monkeypatch.setenv("BUBBLEML_DIR", "/my/data")
    cfg = load_config(["data_cfg=poolboiling_saturated"])
    assert cfg["data_cfg"]["train_paths"][0].startswith("/my/data/")


def test_every_group_file_loads():
    from bubbleformer_tpu.config import DEFAULT_CONFIG_DIR

    for group in ("data_cfg", "model_cfg", "optim_cfg", "scheduler_cfg", "mesh_cfg"):
        for fname in os.listdir(os.path.join(DEFAULT_CONFIG_DIR, group)):
            name = fname.removesuffix(".yaml")
            cfg = load_config([f"{group}={name}"])
            assert cfg[group] is not None


def test_bad_override_rejected():
    with pytest.raises(ValueError):
        load_config(["notakeyvalue"])
