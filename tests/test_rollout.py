"""Rollout tests: the on-device lax.scan rollout must equal the reference's
python-loop feedback semantics (predictions fed back as inputs)."""
import jax
import jax.numpy as jnp
import numpy as np

from bubbleformer_tpu.inference import make_rollout_fn, rollout_targets
from bubbleformer_tpu.models import get_model

TINY = dict(
    input_fields=4,
    output_fields=4,
    time_window=2,
    patch_size=4,
    embed_dim=24,
    num_heads=4,
    processor_blocks=1,
    drop_path=0.0,
)


def test_scan_rollout_matches_python_loop():
    model = get_model("avit", **TINY)
    x0 = jax.random.normal(jax.random.key(0), (1, 2, 4, 16, 16))
    v = model.init({"params": jax.random.key(1)}, x0)

    rollout = make_rollout_fn(model, num_windows=4)
    preds_scan = np.asarray(rollout(v, x0))

    # Reference semantics (inference.py:239-252): feed last prediction back.
    window = x0
    preds_loop = []
    for _ in range(4):
        window = model.apply(v, window)
        preds_loop.append(np.asarray(window))
    np.testing.assert_allclose(preds_scan, np.stack(preds_loop), atol=1e-5, rtol=1e-4)


def test_conditioned_rollout():
    model = get_model("filmavit", num_fluid_params=9, **TINY)
    x0 = jax.random.normal(jax.random.key(0), (1, 2, 4, 16, 16))
    cond = jnp.ones((1, 9))
    v = model.init({"params": jax.random.key(1)}, x0, cond)
    rollout = make_rollout_fn(model, num_windows=3, conditioned=True)
    preds = rollout(v, x0, cond)
    assert preds.shape == (3, 1, 2, 4, 16, 16)


def test_rollout_targets_alignment(tmp_path):
    """Ground-truth windows must align with rollout strides."""
    import h5py

    from bubbleformer_tpu.data import BubbleForecast

    path = str(tmp_path / "traj.hdf5")
    t_total = 30
    with h5py.File(path, "w") as f:
        for field in ["dfun", "temperature", "velx", "vely"]:
            # Encode the timestep in the data for easy verification.
            data = np.arange(t_total, dtype=np.float32)[:, None, None] * np.ones(
                (t_total, 8, 8), dtype=np.float32
            )
            f.create_dataset(field, data=data)

    tw, start_time = 2, 3
    ds = BubbleForecast(
        [path],
        input_fields=["dfun"],
        output_fields=["dfun"],
        norm="none",
        time_window=tw,
        start_time=start_time,
    )
    ds.normalize()
    targets, timesteps = rollout_targets(ds, 0, num_windows=3)
    assert targets.shape == (6, 1, 8, 8)
    # Window k's target covers frames start_time + (k+1)*tw + [0, tw).
    np.testing.assert_array_equal(
        timesteps, np.arange(start_time + tw, start_time + 4 * tw)
    )
    np.testing.assert_allclose(targets[:, 0, 0, 0], timesteps.astype(np.float32))


import subprocess
import sys

import pytest


@pytest.mark.slow
def test_physics_gate_end_to_end(tmp_path):
    """The full train->rollout->physics-metrics gate passes its tolerances.

    Counterpart of the reference's notebook eval loop
    (scripts/inference_autoregressive.ipynb cells 8-10), asserted.
    Run explicitly: pytest -m slow tests/test_rollout.py
    """
    out = tmp_path / "physics.json"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys; sys.path.insert(0, '.')\n"
        f"sys.argv = ['physics_gate', '--out', r'{out}', '--epochs', '1', '--windows', '5']\n"
        "from scripts.physics_gate import main\n"
        "main()\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    import json

    metrics = json.loads(out.read_text())
    assert metrics["ok"], metrics["failures"]
