"""Heater heat-flux physics metric.

Counterpart of reference ``bubbleformer/utils/heatflux.py:3-38``: FC-72 wall
heat flux ``q = 0.054 * (T_wall - T) / (dx * lc)`` with dx = 1/32,
lc = 7e-4, restricted to the heater extent x in [-5, 5] and the liquid phase
(``dfun < 0``), averaged along the wall row.

Provided both as numpy (host-side eval, drop-in parity) and as a pure-jnp
version usable inside jitted eval loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _heater_mask(nx: int = 512, dx: float = 1.0 / 32.0, x_min: float = -8.0) -> np.ndarray:
    x_centers = x_min + (np.arange(nx) + 0.5) * dx
    return (x_centers >= -5.0) & (x_centers <= 5.0)


def heatflux_series(
    dfun: np.ndarray,
    temp: np.ndarray,
    heater_temp: float,
    dx: float = 1.0 / 32.0,
    x_min: float = -8.0,
) -> np.ndarray:
    """Per-timestep wall-averaged heat flux for (T, H, W) fields.

    The per-frame samples feed the KDE/KL heat-flux distribution comparison
    (reference ``examples/data_visualization.ipynb`` cell 4); ``heatflux``
    reduces them to the reference's (mean, max) pair.
    """
    lc = 0.0007
    nx = dfun.shape[-1]
    mask_row = _heater_mask(nx=nx, dx=dx, x_min=x_min)

    heater_mask = np.broadcast_to(mask_row[None, None, :], dfun.shape)
    liquid_mask = dfun < 0
    temp_fields = (heater_mask & liquid_mask).astype(np.float64) * (heater_temp - temp)
    hflux_fields = 0.054 * (temp_fields / (dx * lc))
    return hflux_fields[:, 0, :].mean(axis=1)


def heatflux(
    dfun: np.ndarray,
    temp: np.ndarray,
    heater_temp: float,
    dx: float = 1.0 / 32.0,
    x_min: float = -8.0,
):
    """Mean and max wall heat flux over time for (T, H, W) fields.

    Defaults reproduce the reference's hardcoded FC-72 512-grid geometry
    (``heatflux.py:17-30``); pass ``dx``/``x_min`` for other domains.
    """
    hfluxes = heatflux_series(dfun, temp, heater_temp, dx=dx, x_min=x_min)
    return float(np.mean(hfluxes)), float(np.max(hfluxes))


def heatflux_jax(
    dfun: jax.Array,
    temp: jax.Array,
    heater_temp: float,
    dx: float = 1.0 / 32.0,
    x_min: float = -8.0,
):
    """jnp version of :func:`heatflux` for on-device evaluation."""
    lc = 0.0007
    nx = dfun.shape[-1]
    mask_row = jnp.asarray(_heater_mask(nx=nx, dx=dx, x_min=x_min))

    heater_mask = jnp.broadcast_to(mask_row[None, None, :], dfun.shape)
    liquid_mask = dfun < 0
    temp_fields = (heater_mask & liquid_mask).astype(jnp.float32) * (heater_temp - temp)
    hflux_fields = 0.054 * (temp_fields / (dx * lc))
    hfluxes = hflux_fields[:, 0, :].mean(axis=1)
    return jnp.mean(hfluxes), jnp.max(hfluxes)
