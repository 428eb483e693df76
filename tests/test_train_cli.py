"""End-to-end train-CLI test on the virtual CPU mesh, including SP.

The reference exposes its only distributed strategy entirely through
Trainer config (``reference/scripts/train.py:159-166``); the TPU build's
equivalent is the ``mesh_cfg`` group.  This drives the real entry point
``scripts/train.py`` as a subprocess with ``mesh_cfg=dp_sp`` (data=4 x
spatial=2 on the 8-device CPU mesh) over generated BubbleML-shaped sample
trajectories and asserts the run trains, validates, checkpoints, and
actually enabled the spatial sharding hint.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def samples_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli_samples"))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_sample_data.py"),
            "--out", out, "--n", "2", "--frames", "24", "--size", "64",
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    return out


def test_train_cli_dp_sp_end_to_end(samples_dir, tmp_path):
    log_dir = str(tmp_path / "logs")
    env = dict(os.environ)
    env.update(
        BUBBLEML_SAMPLES=samples_dir,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    proc = subprocess.run(
        [
            sys.executable, "-u",
            os.path.join(REPO, "scripts", "train.py"),
            "data_cfg=samples_smoke",
            "model_cfg=avit_tiny",
            "optim_cfg=adamw",
            "mesh_cfg=dp_sp",
            "max_epochs=1",
            "batch_size=4",
            "limit_train_batches=2",
            "limit_val_batches=1",
            f"log_dir={log_dir}",
            "use_wandb=false",
            "native_loader=false",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    # SP actually enabled from mesh_cfg alone (the pretty-printed config
    # carries the auto-injected sharding hint).
    assert "spatial_shard_axis" in proc.stdout, proc.stdout

    run_dir = os.path.join(log_dir, "avit_samples_smoke_local")
    metrics = os.path.join(run_dir, "metrics.csv")
    assert os.path.exists(metrics), os.listdir(log_dir)
    rows = open(metrics).read().strip().splitlines()
    assert len(rows) >= 2, rows  # header + at least one logged step
    # A resumable checkpoint was written.
    ckpts = [d for d in os.listdir(run_dir) if d.startswith(("last", "hpc_ckpt"))]
    assert ckpts, os.listdir(run_dir)
