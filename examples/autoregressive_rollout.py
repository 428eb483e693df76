#!/usr/bin/env python3
"""Autoregressive rollout analysis with physics evaluation.

Script counterpart of the reference's ``scripts/inference_autoregressive.ipynb``:
roll a trained model forward hundreds of steps fully on device, then compare
model vs simulation with per-field relative-L2, the eikonal SDF residual over
time (model and simulation), and vapor-fraction (mass conservation) curves.

    python examples/autoregressive_rollout.py --ckpt logs/run/last \
        --data Twall_91.hdf5 --model-cfg avit_small --steps 500 --out rollout_eval
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from bubbleformer_tpu.config import load_config
from bubbleformer_tpu.data import BubbleForecast
from bubbleformer_tpu.inference import make_rollout_fn, rollout_targets
from bubbleformer_tpu.training import ConditionedForecastModule, ForecastModule
from bubbleformer_tpu.training.checkpoint import CheckpointManager
from bubbleformer_tpu.utils.metrics import (
    eikonal_residual_per_step,
    relative_l2_per_field,
    vapor_fraction,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--model-cfg", default="avit_small")
    ap.add_argument("--data-cfg", default="singlebubble")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--start-time", type=int, default=100)
    ap.add_argument("--out", default="rollout_eval")
    args = ap.parse_args()

    cfg = load_config([f"model_cfg={args.model_cfg}", f"data_cfg={args.data_cfg}"])
    data_cfg = dict(cfg["data_cfg"])
    conditioned = data_cfg["return_fluid_params"]

    dataset = BubbleForecast(
        [args.data],
        input_fields=data_cfg["input_fields"],
        output_fields=data_cfg["output_fields"],
        norm="none",
        downsample_factor=data_cfg["downsample_factor"],
        time_window=data_cfg["time_window"],
        start_time=args.start_time,
        return_fluid_params=conditioned,
    )
    dataset.normalize()
    tw = dataset.time_window
    num_windows = args.steps // tw

    module_cls = ConditionedForecastModule if conditioned else ForecastModule
    module = module_cls(
        model_cfg=cfg["model_cfg"],
        data_cfg=data_cfg,
        optim_cfg=cfg["optim_cfg"],
        scheduler_cfg=cfg["scheduler_cfg"],
        total_steps=1,
        normalization_constants=(dataset.diff_terms, dataset.div_terms),
    )
    first = dataset[0]
    batch = tuple(np.asarray(p)[None] for p in first)
    target_state = module.init_state(jax.random.key(0), batch)
    params, norm = CheckpointManager(use_async=False).restore_params(
        args.ckpt, target_state.params, (dataset.diff_terms, dataset.div_terms)
    )
    if norm is not None:
        dataset.normalize(*norm)

    rollout = make_rollout_fn(module.model, num_windows, conditioned=conditioned)
    if conditioned:
        preds = rollout({"params": params}, jnp.asarray(batch[0]), jnp.asarray(batch[2]))
    else:
        preds = rollout({"params": params}, jnp.asarray(batch[0]))
    preds = np.asarray(preds)[:, 0].reshape(-1, *preds.shape[3:])  # (T_total, C, H, W)
    targets, timesteps = rollout_targets(dataset, 0, num_windows)

    os.makedirs(args.out, exist_ok=True)
    fields = data_cfg["output_fields"]

    # Relative L2 per field over time.
    rel = np.asarray(relative_l2_per_field(jnp.asarray(preds), jnp.asarray(targets)))
    plt.figure(figsize=(10, 6))
    for c, name in enumerate(fields):
        plt.plot(timesteps, rel[:, c], label=name)
    plt.xlabel("timestep"), plt.ylabel("relative L2"), plt.legend(), plt.grid(True)
    plt.title("Rollout relative L2 per field")
    plt.savefig(os.path.join(args.out, "relative_l2.png")), plt.close()

    if "dfun" in fields:
        c = fields.index("dfun")
        # Eikonal residual over time: model vs simulation (ipynb cells 8-10).
        eik_model = np.asarray(eikonal_residual_per_step(jnp.asarray(preds[:, c])))
        eik_sim = np.asarray(eikonal_residual_per_step(jnp.asarray(targets[:, c])))
        plt.figure(figsize=(10, 6))
        plt.plot(timesteps, eik_model, label="model")
        plt.plot(timesteps, eik_sim, label="simulation")
        plt.xlabel("timestep"), plt.ylabel("eikonal residual"), plt.legend(), plt.grid(True)
        plt.title("Eikonal residual of the SDF over time")
        plt.savefig(os.path.join(args.out, "eikonal.png")), plt.close()

        vf_model = np.asarray(vapor_fraction(jnp.asarray(preds[:, c])))
        vf_sim = np.asarray(vapor_fraction(jnp.asarray(targets[:, c])))
        plt.figure(figsize=(10, 6))
        plt.plot(timesteps, vf_model, label="model")
        plt.plot(timesteps, vf_sim, label="simulation")
        plt.xlabel("timestep"), plt.ylabel("vapor fraction"), plt.legend(), plt.grid(True)
        plt.title("Mass conservation: vapor fraction over time")
        plt.savefig(os.path.join(args.out, "vapor_fraction.png")), plt.close()

    np.savez(
        os.path.join(args.out, "rollout_eval.npz"),
        preds=preds,
        targets=targets,
        timesteps=timesteps,
        relative_l2=rel,
    )
    print(f"wrote evaluation to {args.out}")


if __name__ == "__main__":
    main()
