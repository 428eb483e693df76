"""Utility smoke tests: parameter summary, plotting, metrics."""
import jax
import jax.numpy as jnp
import numpy as np


def test_parameter_table():
    from bubbleformer_tpu.utils.summary import count_parameters, parameter_table

    params = {
        "embed": {"kernel": np.zeros((2, 2, 4, 8)), "bias": np.zeros(8)},
        "head": {"kernel": np.zeros((8, 4))},
    }
    table = parameter_table(params)
    assert "embed/kernel" in table
    assert "total" in table
    assert count_parameters(params) == 2 * 2 * 4 * 8 + 8 + 32
    assert f"{2*2*4*8 + 8 + 32:,}" in table


def test_plot_utils_smoke(tmp_path):
    from bubbleformer_tpu.utils import plot_utils

    rng = np.random.default_rng(0)
    preds = rng.standard_normal((3, 4, 16, 16)).astype(np.float32)
    targets = rng.standard_normal((3, 4, 16, 16)).astype(np.float32)
    timesteps = np.arange(3)

    plot_utils.plot_bubbleml(preds, targets, timesteps, str(tmp_path), max_frames=1)
    assert (tmp_path / "relative_l2_error.png").exists()
    assert (tmp_path / "plots" / "0000.png").exists()

    overlay = plot_utils.bubble_interface_overlay(preds[0, 0])
    assert overlay.shape == (16, 16, 4)

    import matplotlib.pyplot as plt

    for fig in (
        plot_utils.sdf_panel(preds[:, 0]),
        plot_utils.temp_panel(preds[:, 1]),
        plot_utils.vel_panel(preds[:, 2:4].reshape(3, 2, 16, 16)),
    ):
        plt.close(fig)


def test_rel_l2_and_mass_metrics():
    from bubbleformer_tpu.utils.metrics import (
        mass_conservation_drift,
        relative_l2_per_field,
        vapor_fraction,
    )

    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.standard_normal((4, 2, 8, 8)).astype(np.float32))
    # Perfect prediction -> zero error and zero drift.
    rel = relative_l2_per_field(t, t)
    assert rel.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(rel), 0.0, atol=1e-6)
    assert float(mass_conservation_drift(t[:, 0], t[:, 0])) == 0.0
    vf = vapor_fraction(t[:, 0])
    assert vf.shape == (4,)
    assert ((np.asarray(vf) >= 0) & (np.asarray(vf) <= 1)).all()


def test_heatflux_custom_geometry():
    from bubbleformer_tpu.utils.heatflux import heatflux

    # 64-wide grid spanning x in [-8, -6] with default geometry has an empty
    # heater mask; a matched x_min/dx activates it.
    rng = np.random.default_rng(2)
    dfun = -np.ones((2, 8, 64), np.float32)  # all liquid
    temp = rng.uniform(50, 60, (2, 8, 64)).astype(np.float32)
    mean_default, _ = heatflux(dfun, temp, heater_temp=90)
    assert mean_default == 0.0  # empty mask
    mean_custom, max_custom = heatflux(dfun, temp, heater_temp=90, dx=0.25, x_min=-8.0)
    assert mean_custom > 0.0 and max_custom >= mean_custom
