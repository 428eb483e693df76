#!/usr/bin/env python3
"""Heat-flux distribution analysis: simulation vs model rollout.

Script counterpart of the reference's ``examples/data_visualization.ipynb``
cell 4: compute per-frame wall heat flux for simulated and predicted
(dfun, temperature) fields, fit gaussian KDEs, plot the two PDFs, and report
KL(sim || model) via Simpson integration.

    python examples/heatflux_analysis.py --rollout rollout_eval/rollout_eval.npz \
        --heater-temp 95 --out heatflux_eval
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from bubbleformer_tpu.utils.heatflux import heatflux
from bubbleformer_tpu.utils.metrics import heatflux_kl_divergence


def per_frame_fluxes(dfun: np.ndarray, temp: np.ndarray, heater_temp: float) -> np.ndarray:
    """Wall heat flux per frame (mean over the wall row), (T,)."""
    fluxes = []
    for t in range(dfun.shape[0]):
        mean_flux, _ = heatflux(dfun[t : t + 1], temp[t : t + 1], heater_temp)
        fluxes.append(mean_flux)
    return np.asarray(fluxes)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rollout", required=True, help="npz from examples/autoregressive_rollout.py")
    ap.add_argument("--heater-temp", type=float, required=True)
    ap.add_argument("--sdf-index", type=int, default=0)
    ap.add_argument("--temp-index", type=int, default=1)
    ap.add_argument("--out", default="heatflux_eval")
    args = ap.parse_args()

    data = np.load(args.rollout)
    preds, targets = data["preds"], data["targets"]

    sim_fluxes = per_frame_fluxes(
        targets[:, args.sdf_index], targets[:, args.temp_index], args.heater_temp
    )
    model_fluxes = per_frame_fluxes(
        preds[:, args.sdf_index], preds[:, args.temp_index], args.heater_temp
    )
    try:
        kl = heatflux_kl_divergence(sim_fluxes, model_fluxes)
    except ValueError as e:
        print(f"KL analysis not applicable: {e}")
        print(f"sim  heat flux: mean {sim_fluxes.mean():.3f} max {sim_fluxes.max():.3f}")
        print(f"model heat flux: mean {model_fluxes.mean():.3f} max {model_fluxes.max():.3f}")
        return

    os.makedirs(args.out, exist_ok=True)
    from scipy.stats import gaussian_kde

    lo = min(sim_fluxes.min(), model_fluxes.min())
    hi = max(sim_fluxes.max(), model_fluxes.max())
    span = (hi - lo) or 1.0
    xs = np.linspace(lo - 0.1 * span, hi + 0.1 * span, 512)
    plt.figure(figsize=(10, 6))
    plt.plot(xs, gaussian_kde(sim_fluxes)(xs), label="simulation")
    plt.plot(xs, gaussian_kde(model_fluxes)(xs), label="model")
    plt.xlabel("wall heat flux"), plt.ylabel("density"), plt.legend(), plt.grid(True)
    plt.title(f"Heat-flux PDFs, KL(sim||model) = {kl:.4f}")
    plt.savefig(os.path.join(args.out, "heatflux_pdfs.png")), plt.close()

    print(f"sim  heat flux: mean {sim_fluxes.mean():.3f} max {sim_fluxes.max():.3f}")
    print(f"model heat flux: mean {model_fluxes.mean():.3f} max {model_fluxes.max():.3f}")
    print(f"KL(sim || model) = {kl:.5f}")


if __name__ == "__main__":
    main()
