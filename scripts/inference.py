#!/usr/bin/env python3
"""Autoregressive rollout inference.

TPU-native counterpart of reference ``scripts/inference.py:176-266``, but the
rollout is one on-device ``lax.scan`` (no host round-trip per window,
contrast reference ``inference.py:244-247``) and the entry is a proper CLI
instead of a hardcoded script body.

    python scripts/inference.py --ckpt logs/run/last --data test.hdf5 \
        --model avit_small --steps 500 --save-dir out/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Persistent compilation cache (full-step XLA compiles are minutes through
# remote-compile relays; cached executables rerun in seconds).
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bubbleformer")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from bubbleformer_tpu.config import load_config
from bubbleformer_tpu.data import BubbleForecast
from bubbleformer_tpu.inference import make_rollout_fn, rollout_targets
from bubbleformer_tpu.training import (
    ConditionedForecastModule,
    ForecastModule,
)
from bubbleformer_tpu.utils.losses import LpLoss
from bubbleformer_tpu.utils.metrics import (
    eikonal_residual_per_step,
    mass_conservation_drift,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="Orbax checkpoint directory")
    ap.add_argument("--data", required=True, help="trajectory HDF5 to roll out on")
    ap.add_argument("--model-cfg", default="avit_small", help="model config group name")
    ap.add_argument("--data-cfg", default="singlebubble", help="data config group name")
    ap.add_argument("--steps", type=int, default=500, help="total rollout timesteps")
    ap.add_argument("--start-time", type=int, default=100)
    ap.add_argument("--save-dir", default="rollout_out")
    ap.add_argument("--plot", action="store_true")
    ap.add_argument(
        "--in-scan-metrics",
        action="store_true",
        help="compute physics metrics inside the rollout scan instead of "
        "stacking all predictions in HBM — use for long forecasts (saves "
        "num_windows x window bytes of device memory; no predictions.npz)",
    )
    args = ap.parse_args()

    cfg = load_config([f"model_cfg={args.model_cfg}", f"data_cfg={args.data_cfg}"])
    data_cfg = dict(cfg["data_cfg"])
    data_cfg["start_time"] = args.start_time

    dataset = BubbleForecast(
        filenames=[args.data],
        input_fields=data_cfg["input_fields"],
        output_fields=data_cfg["output_fields"],
        norm="none",
        downsample_factor=data_cfg["downsample_factor"],
        time_window=data_cfg["time_window"],
        start_time=args.start_time,
        return_fluid_params=data_cfg["return_fluid_params"],
    )
    dataset.normalize()
    tw = dataset.time_window
    num_windows = args.steps // tw

    conditioned = data_cfg["return_fluid_params"]
    module_cls = ConditionedForecastModule if conditioned else ForecastModule
    module = module_cls(
        model_cfg=cfg["model_cfg"],
        data_cfg=data_cfg,
        optim_cfg=cfg["optim_cfg"],
        scheduler_cfg=cfg["scheduler_cfg"],
        total_steps=1,
        normalization_constants=(dataset.diff_terms, dataset.div_terms),
    )

    # Restore parameters (norm constants ride along in the checkpoint).
    from bubbleformer_tpu.training.checkpoint import CheckpointManager

    first = dataset[0]
    batch = tuple(np.asarray(p)[None] for p in first)
    rng = jax.random.key(0)
    target_state = module.init_state(rng, batch)
    ckpt = CheckpointManager(use_async=False)
    # Params-only partial restore: independent of the optimizer the
    # checkpoint was trained with.
    params, norm = ckpt.restore_params(
        args.ckpt, target_state.params, (dataset.diff_terms, dataset.div_terms)
    )
    if norm is not None:
        dataset.normalize(*norm)

    variables = {"params": params}
    if target_state.batch_stats is not None:
        variables["batch_stats"] = target_state.batch_stats

    sdf_idx = (
        data_cfg["output_fields"].index("dfun")
        if "dfun" in data_cfg["output_fields"]
        else None
    )
    init_window = jnp.asarray(batch[0])
    targets, timesteps = rollout_targets(dataset, 0, num_windows)

    if args.in_scan_metrics:
        from bubbleformer_tpu.inference import make_rollout_metrics_fn

        fn = make_rollout_metrics_fn(
            module.model, num_windows, dfun_index=sdf_idx, conditioned=conditioned
        )
        # (num_windows * tw, C, H, W) -> (num_windows, 1, tw, C, H, W)
        tgt = jnp.asarray(targets).reshape(num_windows, tw, *targets.shape[1:])[:, None]
        if conditioned:
            out = fn(variables, init_window, tgt, jnp.asarray(batch[2]))
        else:
            out = fn(variables, init_window, tgt)
        for k in range(num_windows):
            print(f"window {k}: relative L2 = {float(out['rel_l2'][k].mean()):.4f}")
        if sdf_idx is not None:
            print(
                "eikonal residual (mean over rollout): "
                f"{float(out['eikonal'].mean()):.4f}"
            )
            print(f"vapor-fraction drift: {float(out['vapor_drift'].mean()):.5f}")
        os.makedirs(args.save_dir, exist_ok=True)
        np.savez(
            os.path.join(args.save_dir, "metrics.npz"),
            final_window=np.asarray(out["final_window"]),
            timesteps=timesteps,
            **{
                k: np.asarray(v)
                for k, v in out.items()
                if k != "final_window"
            },
        )
        print(f"saved rollout metrics to {args.save_dir}")
        return

    rollout = make_rollout_fn(module.model, num_windows, conditioned=conditioned)
    if conditioned:
        preds = rollout(variables, init_window, jnp.asarray(batch[2]))
    else:
        preds = rollout(variables, init_window)
    # (num_windows, 1, T, C, H, W) -> (num_windows*T, C, H, W)
    preds = np.asarray(preds)[:, 0].reshape(-1, *preds.shape[3:])

    criterion = LpLoss(d=2, p=2, reduce_dims=[0, 1], reductions=["mean", "mean"])
    for k in range(num_windows):
        sl = slice(k * tw, (k + 1) * tw)
        err = float(criterion(jnp.asarray(preds[sl]), jnp.asarray(targets[sl])))
        print(f"window {k}: relative L2 = {err:.4f}")

    if sdf_idx is not None:
        eik = eikonal_residual_per_step(jnp.asarray(preds[:, sdf_idx]))
        drift = mass_conservation_drift(
            jnp.asarray(preds[:, sdf_idx]), jnp.asarray(targets[:, sdf_idx])
        )
        print(f"eikonal residual (mean over rollout): {float(eik.mean()):.4f}")
        print(f"vapor-fraction drift: {float(drift):.5f}")

    os.makedirs(args.save_dir, exist_ok=True)
    np.savez(
        os.path.join(args.save_dir, "predictions.npz"),
        preds=preds,
        targets=targets,
        timesteps=timesteps,
    )
    if args.plot:
        from bubbleformer_tpu.utils.plot_utils import plot_bubbleml

        plot_bubbleml(preds, targets, timesteps, args.save_dir)
    print(f"saved rollout to {args.save_dir}")


if __name__ == "__main__":
    main()
