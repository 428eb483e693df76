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


def test_in_scan_metrics_match_post_hoc():
    """make_rollout_metrics_fn (metrics inside the scan, no prediction stack)
    must equal the post-hoc utils.metrics evaluation of make_rollout_fn."""
    from bubbleformer_tpu.inference import make_rollout_metrics_fn
    from bubbleformer_tpu.utils.metrics import (
        eikonal_residual_per_step,
        relative_l2_per_field,
        vapor_fraction,
    )

    model = get_model("avit", **TINY)
    x0 = jax.random.normal(jax.random.key(0), (2, 2, 4, 16, 16))
    v = model.init({"params": jax.random.key(1)}, x0)
    nw, dfun_idx, dx = 3, 0, 1.0 / 16.0

    preds = np.asarray(make_rollout_fn(model, nw)(v, x0))
    targets = jax.random.normal(jax.random.key(2), preds.shape)

    fn = make_rollout_metrics_fn(model, nw, dfun_index=dfun_idx, dx=dx, keep_preds=True)
    out = fn(v, x0, jnp.asarray(targets))

    np.testing.assert_allclose(np.asarray(out["preds"]), preds, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["final_window"]), preds[-1], atol=1e-5, rtol=1e-4)

    for k in range(nw):
        # rel_l2: batch-mean of the per-sample (T, C) relative L2.
        ref_rel = np.mean(
            [np.asarray(relative_l2_per_field(preds[k, b], targets[k, b])) for b in range(2)],
            axis=0,
        )
        np.testing.assert_allclose(np.asarray(out["rel_l2"][k]), ref_rel, atol=1e-5, rtol=1e-4)
        ref_eik = np.mean(
            [
                np.asarray(eikonal_residual_per_step(preds[k, b, :, dfun_idx], dx=dx))
                for b in range(2)
            ],
            axis=0,
        )
        np.testing.assert_allclose(np.asarray(out["eikonal"][k]), ref_eik, atol=1e-5, rtol=1e-4)
        ref_vf = np.mean(
            [np.asarray(vapor_fraction(preds[k, b, :, dfun_idx])) for b in range(2)], axis=0
        )
        np.testing.assert_allclose(
            np.asarray(out["vapor_fraction"][k]), ref_vf, atol=1e-6, rtol=1e-5
        )
        ref_drift = np.mean(
            np.abs(
                np.asarray(vapor_fraction(jnp.asarray(preds[k][:, :, dfun_idx])))
                - np.asarray(vapor_fraction(jnp.asarray(targets[k][:, :, dfun_idx])))
            ),
            axis=0,
        )
        np.testing.assert_allclose(
            np.asarray(out["vapor_drift"][k]), ref_drift, atol=1e-6, rtol=1e-5
        )

    # Without targets and without keep_preds: only dfun metrics, no stack.
    fn2 = make_rollout_metrics_fn(model, nw, dfun_index=dfun_idx, dx=dx)
    out2 = fn2(v, x0)
    assert set(out2) == {"eikonal", "vapor_fraction", "final_window"}
    np.testing.assert_allclose(
        np.asarray(out2["eikonal"]), np.asarray(out["eikonal"]), atol=1e-6, rtol=1e-5
    )


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
