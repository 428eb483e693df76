"""Physics evaluation metrics for rollouts.

Pure-JAX (jit-friendly) versions of every evaluation the reference performs
offline, plus the host-side KDE/KL heat-flux distribution comparison:

* per-field relative-L2 vs time (reference ``utils/plot_utils.py:31-34`` and
  ``scripts/inference.py:252``),
* eikonal SDF residual vs time (reference ``utils/losses.py:5-15``,
  evaluated over a rollout in ``scripts/inference_autoregressive.ipynb``),
* liquid/vapor mass conservation drift (BASELINE.md target metric),
* KL divergence of heat-flux PDFs via gaussian KDE + Simpson integration
  (reference ``examples/data_visualization.ipynb`` cell 4; host-side, scipy).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bubbleformer_tpu.utils.losses import eikonal_loss


def relative_l2_per_field(preds: jax.Array, targets: jax.Array) -> jax.Array:
    """(T, C, H, W) predictions/targets -> (T, C) relative L2 error."""
    diff = jnp.sqrt(jnp.sum((preds - targets) ** 2, axis=(-2, -1)))
    norm = jnp.sqrt(jnp.sum(targets**2, axis=(-2, -1)))
    return diff / norm


def eikonal_residual_per_step(phi: jax.Array, dx: float = 1.0 / 32.0) -> jax.Array:
    """(T, H, W) SDF rollout -> (T,) eikonal residual per step."""
    return jax.vmap(lambda p: eikonal_loss(p, dx=dx))(phi)


def vapor_fraction(dfun: jax.Array) -> jax.Array:
    """Fraction of the domain occupied by vapor (dfun > 0) per frame.

    A rollout that conserves mass keeps this quantity consistent with the
    simulation; drift is a standard failure mode of autoregressive forecasts.
    """
    return jnp.mean((dfun > 0).astype(jnp.float32), axis=(-2, -1))


def mass_conservation_drift(pred_dfun: jax.Array, target_dfun: jax.Array) -> jax.Array:
    """Mean absolute difference in vapor fraction over a (T, H, W) rollout."""
    return jnp.mean(jnp.abs(vapor_fraction(pred_dfun) - vapor_fraction(target_dfun)))


def heatflux_kl_divergence(
    sim_fluxes: np.ndarray, model_fluxes: np.ndarray, num_points: int = 512
) -> float:
    """KL(sim || model) between gaussian-KDE heat-flux PDFs (host-side).

    Mirrors the reference's notebook evaluation: fit a gaussian KDE to each
    sample set, evaluate both on a common support, integrate
    ``p * log(p / q)`` with Simpson's rule.
    """
    from scipy.integrate import simpson
    from scipy.stats import gaussian_kde

    sim_fluxes = np.asarray(sim_fluxes, dtype=np.float64)
    model_fluxes = np.asarray(model_fluxes, dtype=np.float64)
    if np.std(sim_fluxes) < 1e-12 or np.std(model_fluxes) < 1e-12:
        raise ValueError(
            "heat-flux samples are (near-)constant — KDE is undefined; check "
            "that the heater geometry (dx/x_min) matches the data domain"
        )
    kde_sim = gaussian_kde(sim_fluxes)
    kde_model = gaussian_kde(model_fluxes)

    lo = min(sim_fluxes.min(), model_fluxes.min())
    hi = max(sim_fluxes.max(), model_fluxes.max())
    span = hi - lo if hi > lo else 1.0
    xs = np.linspace(lo - 0.1 * span, hi + 0.1 * span, num_points)

    p = np.maximum(kde_sim(xs), 1e-12)
    q = np.maximum(kde_model(xs), 1e-12)
    p = p / simpson(p, x=xs)
    q = q / simpson(q, x=xs)
    return float(simpson(p * np.log(p / q), x=xs))
