from bubbleformer_tpu.utils.heatflux import heatflux, heatflux_jax
from bubbleformer_tpu.utils.losses import LpLoss, eikonal_loss
from bubbleformer_tpu.utils.metrics import (
    eikonal_residual_per_step,
    heatflux_kl_divergence,
    mass_conservation_drift,
    relative_l2_per_field,
    vapor_fraction,
)
from bubbleformer_tpu.utils.schedulers import cosine_annealing, cosine_warmup, make_schedule

__all__ = [
    "heatflux",
    "heatflux_jax",
    "LpLoss",
    "eikonal_loss",
    "eikonal_residual_per_step",
    "heatflux_kl_divergence",
    "mass_conservation_drift",
    "relative_l2_per_field",
    "vapor_fraction",
    "cosine_annealing",
    "cosine_warmup",
    "make_schedule",
]
