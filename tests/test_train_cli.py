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

import numpy as np
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


def test_loader_shards_disjoint_equal_length():
    """Per-process loader shards partition the permutation with no overlap
    and EQUAL lengths (unequal lengths deadlock the collectives: one rank
    would run an extra step per epoch)."""
    from bubbleformer_tpu.data.pipeline import DataLoader

    class _FakeDataset:
        def __len__(self):
            return 23  # not divisible by the process count

    for count in (2, 3):
        shards = [
            DataLoader(
                _FakeDataset(), batch_size=2, shuffle=True, seed=7,
                process_index=i, process_count=count,
            )._local_indices()
            for i in range(count)
        ]
        lengths = {len(s) for s in shards}
        assert lengths == {23 // count}, lengths
        flat = np.concatenate(shards)
        assert len(np.unique(flat)) == len(flat), "overlapping shards"


def test_train_cli_two_process_e2e(samples_dir, tmp_path):
    """Real 2-process world driving the actual train CLI end to end (VERDICT
    r2 stretch item): emulated SLURM rank env on the CPU backend (1 device
    per process -> 2-way DP across processes).  Asserts both ranks train and
    exit cleanly, the global batch is assembled from disjoint per-process
    shards (process-local data path in ``Trainer._put_batch``), logging is
    single-leader, and one shared checkpoint is written."""
    log_dir = str(tmp_path / "logs2p")
    base = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith("SLURM") and k != "XLA_FLAGS"
    }
    base.update(
        BUBBLEML_SAMPLES=samples_dir,
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO + os.pathsep + base.get("PYTHONPATH", ""),
        SLURM_JOB_ID="4343",
        SLURM_STEP_NODELIST="localhost",
        SLURM_NTASKS="2",
        SLURM_STEP_NUM_NODES="1",
    )
    argv = [
        sys.executable, "-u",
        os.path.join(REPO, "scripts", "train.py"),
        "data_cfg=samples_smoke",
        "model_cfg=avit_tiny",
        "optim_cfg=adamw",
        "max_epochs=1",
        "batch_size=2",
        "limit_train_batches=2",
        "limit_val_batches=1",
        f"log_dir={log_dir}",
        "use_wandb=false",
        "native_loader=false",
    ]
    procs = []
    for rank in range(2):
        env = dict(base, SLURM_PROCID=str(rank), SLURM_LOCALID=str(rank))
        procs.append(
            subprocess.Popen(
                argv, env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        # Every rank joined the same 2-process world and trains the global
        # batch assembled from its own disjoint shard.
        assert f"process {rank}/2: 2 train batches/epoch" in out, out
        assert "local batch 2 (global 4)" in out, out
    # Single-leader logging: the pretty-printed config and epoch summaries
    # come from rank 0 only.
    assert "max_epochs" in outs[0]
    assert "max_epochs" not in outs[1], outs[1]
    assert "epoch 0:" in outs[0]
    assert "epoch 0:" not in outs[1], outs[1]

    run_dir = os.path.join(log_dir, "avit_samples_smoke_4343")
    rows = open(os.path.join(run_dir, "metrics.csv")).read().strip().splitlines()
    assert len(rows) >= 2, rows
    assert [d for d in os.listdir(run_dir) if d.startswith("last")], os.listdir(run_dir)


@pytest.mark.slow
def test_train_cli_two_process_dp_sp(samples_dir, tmp_path):
    """Sequence parallelism ACROSS process boundaries (VERDICT r3 stretch
    item 10): 2 processes x 4 virtual CPU devices each, ``mesh_cfg=dp_sp``
    -> a global 4(data) x 1 x 2(spatial) mesh whose data axis spans both
    processes.  The spatial all-gathers of column attention ride the
    cross-process collectives; asserts both ranks train and exit cleanly
    with the sharding hint enabled."""
    log_dir = str(tmp_path / "logs_sp2p")
    base = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith("SLURM") and k != "XLA_FLAGS"
    }
    base.update(
        BUBBLEML_SAMPLES=samples_dir,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=REPO + os.pathsep + base.get("PYTHONPATH", ""),
        SLURM_JOB_ID="4747",
        SLURM_STEP_NODELIST="localhost",
        SLURM_NTASKS="2",
        SLURM_STEP_NUM_NODES="1",
    )
    argv = [
        sys.executable, "-u",
        os.path.join(REPO, "scripts", "train.py"),
        "data_cfg=samples_smoke",
        "model_cfg=avit_tiny",
        "optim_cfg=adamw",
        "mesh_cfg=dp_sp",
        "max_epochs=1",
        "batch_size=2",
        "limit_train_batches=2",
        "limit_val_batches=1",
        f"log_dir={log_dir}",
        "use_wandb=false",
        "native_loader=false",
    ]
    procs = []
    for rank in range(2):
        env = dict(base, SLURM_PROCID=str(rank), SLURM_LOCALID=str(rank))
        procs.append(
            subprocess.Popen(
                argv, env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    # 900 s: the 8-virtual-device two-process compile takes ~4 min alone on
    # this 1-core host and has been observed to exceed 600 s when another
    # heavy process shares the core.
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"process {rank}/2: 2 train batches/epoch" in out, out
    assert "spatial_shard_axis" in outs[0], outs[0]
    run_dir = os.path.join(log_dir, "avit_samples_smoke_4747")
    rows = open(os.path.join(run_dir, "metrics.csv")).read().strip().splitlines()
    assert len(rows) >= 2, rows
