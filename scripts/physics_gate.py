#!/usr/bin/env python3
"""End-to-end physics gate: train -> rollout -> physics metrics -> tolerances.

Replaces the reference's manual notebook workflow
(``scripts/inference_autoregressive.ipynb`` cells 8-10: rollout + eikonal
residual + field errors) with one asserted command.  Trains an AViT-tiny on
synthetic boiling-shaped trajectories, rolls out ``--windows`` windows with
the on-device ``lax.scan``, computes the physics metrics the reference
defines (eikonal residual of the SDF field, ``utils/losses.py:5-15``;
vapor-fraction/mass drift; per-window relative L2), asserts recorded
tolerances and writes the numbers to ``PHYSICS_r{N}.json``.

    python scripts/physics_gate.py --out PHYSICS_r02.json
    make physics
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Run on CPU by default: the gate asserts learning/physics, not speed, and
# the environment's axon TPU plugin ignores JAX_PLATFORMS=cpu — forcing it
# in-process keeps the gate off the (single, possibly busy) TPU chip.
# Set BUBBLEFORMER_PHYSICS_TPU=1 to run on the chip instead.
if not os.environ.get("BUBBLEFORMER_PHYSICS_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

# Round-3 learning gate (VERDICT r2 item 4): the round-2 tolerances admitted
# a model *worse than predicting zeros* (rel-L2 of the zero predictor is 1.0
# by construction of the relative norm).  The gate (a) records the
# untrained-init rollout as the trivial baseline, (b) trains long enough to
# beat it, and asserts the trained model's final-window rollout rel-L2 < 1.0
# AND mean rel-L2 < 0.9x the untrained rollout.
#
# Round-4 re-tightening (VERDICT r3 item 7): eikonal max set to 2x the
# r03-recorded measurement (29.4) — the r03 bound of 120 had drifted to
# admit a 4x regression; and the remaining reference physics metrics are now
# asserted too: wall heat flux of the denormalized predicted rollout
# (``utils/heatflux.py``, reference ``heatflux.py:3-38``) must be finite and
# within a factor-band of the simulation's, and KL(sim || model) of the
# per-frame heat-flux distributions (reference
# ``examples/data_visualization.ipynb`` cell 4) must be finite and bounded.
# Tolerance rule (adopted round 5 after three rounds of slack drift —
# rel-L2 in r2, eikonal in r3, the heat-flux band in r4): every tolerance
# is set to <= 2x its latest recorded measurement, and re-tightened when a
# new measurement lands.  Latest measurements: eikonal 29.4 (r03), heat-flux
# mean ratio 1.06 (PHYSICS_r04.json: pred 3197 vs sim 3022), KL 3.71 (r04).
TOLERANCES = {
    "rollout_rel_l2_final_max": 1.0,   # must beat the zero predictor
    "untrained_improvement_min": 0.9,  # mean rel-L2 < 0.9x untrained
    "eikonal_residual_max": 60.0,      # 2x the r03-measured 29.4
    "vapor_fraction_drift_max": 0.5,
    "heatflux_mean_ratio_band": 2.0,   # 2x rule; r04 measured ratio 1.06
    "heatflux_kl_max": 5.0,            # ~1.35x the r04-measured 3.71
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PHYSICS_r05.json")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--train-batches", type=int, default=50)
    ap.add_argument("--warmup-iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=10)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="physics_gate_")
    samples_dir = os.path.join(workdir, "samples")

    # 1. Synthetic boiling-shaped trajectories (same generator the demo uses).
    from scripts.make_sample_data import main as make_samples_main  # noqa: E402

    make_samples_main(["--out", samples_dir, "--n", "2", "--frames", "80"])

    # 2. Train avit_tiny for a couple of epochs via the real CLI path.
    os.environ["BUBBLEML_SAMPLES"] = samples_dir
    from scripts.train import main as train_main  # noqa: E402

    log_dir = os.path.join(workdir, "logs")
    train_main([
        "data_cfg=samples_smoke",
        "model_cfg=avit_tiny",
        "optim_cfg=adamw",
        f"max_epochs={args.epochs}",
        "batch_size=4",
        f"limit_train_batches={args.train_batches}",
        "limit_val_batches=2",
        f"log_dir={log_dir}",
        "use_wandb=false",
        # The default schedule warms up over 1000 iters (reference-sized for
        # multi-day runs); this gate's whole budget is a few hundred steps,
        # so without this override the model trains at ~0 learning rate and
        # cannot beat the zero predictor (measured: 128 steps ended at
        # lr 3e-5 of 2.5e-4, train loss 4.26 -> 4.12, rollout rel-L2 1.05
        # vs untrained 1.04).
        f"scheduler_cfg.params.warmup_iters={args.warmup_iters}",
    ])

    # 3. Rollout on the held-out trajectory, fully on device.
    import jax.numpy as jnp

    from bubbleformer_tpu.config import load_config
    from bubbleformer_tpu.data import BubbleForecast
    from bubbleformer_tpu.inference import make_rollout_fn, rollout_targets
    from bubbleformer_tpu.training import ForecastModule
    from bubbleformer_tpu.training.checkpoint import CheckpointManager
    from bubbleformer_tpu.utils.losses import LpLoss
    from bubbleformer_tpu.utils.metrics import (
        eikonal_residual_per_step,
        mass_conservation_drift,
    )

    cfg = load_config(["model_cfg=avit_tiny", "data_cfg=samples_smoke"])
    data_cfg = dict(cfg["data_cfg"])
    dataset = BubbleForecast(
        filenames=[os.path.join(samples_dir, "sample_2.hdf5")],
        input_fields=data_cfg["input_fields"],
        output_fields=data_cfg["output_fields"],
        norm=data_cfg["normalize"],
        downsample_factor=data_cfg["downsample_factor"],
        time_window=data_cfg["time_window"],
        start_time=5,
        return_fluid_params=False,
    )
    dataset.normalize()
    tw = dataset.time_window

    module = ForecastModule(
        model_cfg=cfg["model_cfg"],
        data_cfg=data_cfg,
        optim_cfg=cfg["optim_cfg"],
        scheduler_cfg=cfg["scheduler_cfg"],
        total_steps=1,
        normalization_constants=(dataset.diff_terms, dataset.div_terms),
    )
    inp, _ = dataset[0]
    init = jnp.asarray(np.asarray(inp))[None]
    variables = module.model.init(
        {"params": __import__("jax").random.key(0)}, init
    )
    ckpt_dir = os.path.join(log_dir, "avit_samples_smoke_local", "last")
    params, _ = CheckpointManager(use_async=False).restore_params(
        ckpt_dir, variables["params"], None
    )

    rollout = make_rollout_fn(module.model, args.windows, conditioned=False)
    # rollout_targets returns FRAME-flat (windows*tw, C, H, W); fold to
    # per-window (windows, tw, C, H, W) to align with the rollout's windows.
    # (Round-4 fix: the r02/r03 gates indexed the flat array per *window*,
    # silently broadcasting one target frame against each tw-frame
    # prediction window in the rel-L2 — the recorded per-window curves were
    # frame-vs-window comparisons, not window-vs-window.)
    targets_flat, _ = rollout_targets(dataset, 0, args.windows)
    targets = np.asarray(targets_flat).reshape(
        args.windows, tw, *targets_flat.shape[1:]
    )
    lp = LpLoss(d=2, p=2, reduce_dims=[0, 1], reductions=["mean", "mean"])

    def rollout_rel_l2(p):
        preds = np.asarray(rollout({"params": p}, init))[:, 0]
        return preds, [
            float(lp(jnp.asarray(preds[i]), jnp.asarray(targets[i])))
            for i in range(args.windows)
        ]

    # Trivial baseline: the untrained init's rollout (a predict-zeros model
    # scores rel-L2 = 1.0 per window by construction; an untrained net is
    # usually near or above that).  The learning assertion below requires
    # the trained model to beat both.
    _, rel_l2_untrained = rollout_rel_l2(variables["params"])

    # 4. Physics metrics (reference formulas) on the trained model.
    preds, rel_l2 = rollout_rel_l2(params)
    dfun_idx = data_cfg["output_fields"].index("dfun")
    flat_pred = preds.reshape(-1, *preds.shape[2:])  # (W*T, C, H, W)
    eik = np.asarray(eikonal_residual_per_step(jnp.asarray(flat_pred[:, dfun_idx])))
    flat_tgt = targets.reshape(-1, *targets.shape[2:])
    drift = float(
        mass_conservation_drift(
            jnp.asarray(flat_pred[:, dfun_idx]), jnp.asarray(flat_tgt[:, dfun_idx])
        )
    )

    # Wall heat flux + KL of flux PDFs, on DENORMALIZED fields (physical
    # units — std-normalization shifts dfun's zero level, which would corrupt
    # the liquid mask the flux formula depends on).
    from bubbleformer_tpu.utils.heatflux import heatflux_series
    from bubbleformer_tpu.utils.metrics import heatflux_kl_divergence

    temp_idx = data_cfg["output_fields"].index("temperature")
    with open(os.path.join(samples_dir, "sample_2.json")) as f:
        heater_temp = float(json.load(f)["heater"]["wallTemp"])

    def denorm(a, field):
        return a * dataset.div_terms[field] + dataset.diff_terms[field]

    # Synthetic [0,1]^2 domain mapped onto the reference heater geometry
    # (domain x in [-8, 8], heater x in [-5, 5]; reference heatflux.py:17-30).
    hf_kwargs = dict(heater_temp=heater_temp, dx=16.0 / flat_pred.shape[-1], x_min=-8.0)
    hf_pred = heatflux_series(
        denorm(flat_pred[:, dfun_idx], "dfun"),
        denorm(flat_pred[:, temp_idx], "temperature"), **hf_kwargs,
    )
    hf_sim = heatflux_series(
        denorm(flat_tgt[:, dfun_idx], "dfun"),
        denorm(flat_tgt[:, temp_idx], "temperature"), **hf_kwargs,
    )
    try:
        hf_kl = heatflux_kl_divergence(hf_sim, hf_pred)
    except ValueError:
        hf_kl = float("nan")

    mean_trained = float(np.mean(rel_l2))
    mean_untrained = float(np.mean(rel_l2_untrained))
    metrics = {
        "rollout_rel_l2_per_window": [round(v, 4) for v in rel_l2],
        "rollout_rel_l2_final": round(rel_l2[-1], 4),
        "rollout_rel_l2_mean": round(mean_trained, 4),
        "rollout_rel_l2_untrained_per_window": [
            round(v, 4) for v in rel_l2_untrained
        ],
        "rollout_rel_l2_untrained_mean": round(mean_untrained, 4),
        "eikonal_residual_mean": round(float(eik.mean()), 4),
        "vapor_fraction_drift": round(drift, 5),
        "heatflux_pred_mean": round(float(np.mean(hf_pred)), 2),
        "heatflux_pred_max": round(float(np.max(hf_pred)), 2),
        "heatflux_sim_mean": round(float(np.mean(hf_sim)), 2),
        "heatflux_sim_max": round(float(np.max(hf_sim)), 2),
        "heatflux_kl_sim_vs_model": round(hf_kl, 4) if np.isfinite(hf_kl) else None,
        "windows": args.windows,
        "time_window": tw,
        "train_epochs": args.epochs,
        "train_batches_per_epoch": args.train_batches,
        "tolerances": TOLERANCES,
    }

    failures = []
    if rel_l2[-1] > TOLERANCES["rollout_rel_l2_final_max"]:
        failures.append(
            f"final rel_l2 {rel_l2[-1]:.3f} > "
            f"{TOLERANCES['rollout_rel_l2_final_max']} (zero-predictor level)"
        )
    if mean_trained > TOLERANCES["untrained_improvement_min"] * mean_untrained:
        failures.append(
            f"mean rel_l2 {mean_trained:.3f} not < "
            f"{TOLERANCES['untrained_improvement_min']}x untrained "
            f"{mean_untrained:.3f} (no learning)"
        )
    if not np.isfinite(eik).all() or eik.mean() > TOLERANCES["eikonal_residual_max"]:
        failures.append(f"eikonal {eik.mean():.1f} > {TOLERANCES['eikonal_residual_max']}")
    if not np.isfinite(drift) or abs(drift) > TOLERANCES["vapor_fraction_drift_max"]:
        failures.append(f"drift {drift:.3f} > {TOLERANCES['vapor_fraction_drift_max']}")
    hf_pm, hf_sm = float(np.mean(hf_pred)), float(np.mean(hf_sim))
    band = TOLERANCES["heatflux_mean_ratio_band"]
    if not (np.isfinite(hf_pred).all() and np.isfinite(hf_sim).all()):
        failures.append("non-finite heat flux in rollout")
    elif hf_sm <= 0.0:
        # Sign guard: the band is a ratio test and assumes positive sim
        # flux; a ~0/negative sim mean (possible on synthetic data where
        # temperature can exceed heater_temp) would make the band
        # empty/inverted and fail spuriously even on an exact match.
        failures.append(f"sim mean heat flux {hf_sm:.2f} <= 0 (band undefined)")
    elif not (1.0 / band <= hf_pm / hf_sm <= band):
        failures.append(
            f"pred mean heat flux {hf_pm:.1f} outside {band}x band of sim {hf_sm:.1f}"
        )
    if not np.isfinite(hf_kl) or hf_kl > TOLERANCES["heatflux_kl_max"]:
        failures.append(f"heat-flux KL {hf_kl} > {TOLERANCES['heatflux_kl_max']}")
    metrics["ok"] = not failures
    metrics["failures"] = failures

    with open(args.out, "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
