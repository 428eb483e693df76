#!/usr/bin/env python3
"""Headline benchmark: FiLMAViT-small training throughput on one chip.

Measures the jitted train step (forward + backward + optimizer, bf16
activations, remat'd scanned blocks) of the flagship FiLMAViT-small on
512x512 BubbleML-shaped synthetic data — the workload class the reference
trains with Lightning/DDP on A100s (SURVEY.md §6; the reference publishes no
numbers, so the recorded baseline is this benchmark's first TPU measurement,
stored in BENCH_BASELINE.json).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "samples/s/chip", "vs_baseline": N, ...}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# bf16 peak matmul throughput per chip.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e
    "cpu": 1e12,
}


def peak_flops_for(device) -> float:
    kind = getattr(device, "device_kind", "cpu")
    for key, val in PEAK_FLOPS.items():
        if key.lower() in str(kind).lower():
            return val
    return 197e12


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--time-window", type=int, default=5)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--model-cfg", default="film_avit_small")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from bubbleformer_tpu.config import load_config
    from bubbleformer_tpu.data import synthetic_batch
    from bubbleformer_tpu.parallel import make_mesh
    from bubbleformer_tpu.training import (
        ConditionedForecastModule,
        ForecastModule,
        Trainer,
    )

    cfg = load_config([f"model_cfg={args.model_cfg}", "optim_cfg=lion"])
    conditioned = cfg["model_cfg"]["name"] == "filmavit"
    data_cfg = {
        "input_fields": ["dfun", "temperature", "velx", "vely"],
        "output_fields": ["dfun", "temperature", "velx", "vely"],
        "time_window": args.time_window,
    }
    module_cls = ConditionedForecastModule if conditioned else ForecastModule
    module = module_cls(
        model_cfg=cfg["model_cfg"],
        data_cfg=data_cfg,
        optim_cfg=cfg["optim_cfg"],
        scheduler_cfg=cfg["scheduler_cfg"],
        total_steps=10_000,
        compute_dtype=args.dtype,
    )

    n_fluid = cfg["model_cfg"]["params"].get("num_fluid_params") if conditioned else None
    batch = synthetic_batch(
        args.batch, args.time_window, 4, args.size, args.size, num_fluid_params=n_fluid
    )

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}, model: {args.model_cfg}, "
        f"batch {args.batch} x {args.time_window}x4x{args.size}x{args.size}, {args.dtype}")

    mesh = make_mesh(data=1, model=1, devices=[dev])
    trainer = Trainer(module, log_dir="/tmp/bench_logs", mesh=mesh, async_checkpoint=False)
    state = trainer.init_state(batch)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    log(f"params: {n_params/1e6:.2f}M")

    b = trainer._put_batch(batch)
    rng = jax.random.key(0)

    # FLOPs of the compiled step from XLA cost analysis.
    step_flops = None
    try:
        lowered = jax.jit(module.make_train_step(), donate_argnums=0).lower(state, b, rng)
        cost = lowered.compile().cost_analysis()
        if cost:
            step_flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:  # noqa: BLE001
        log(f"cost analysis unavailable: {e}")

    t0 = time.time()
    state, m = trainer._train_step(state, b, rng)
    jax.block_until_ready(m["loss"])
    log(f"compile+first step: {time.time()-t0:.1f}s, loss {float(m['loss']):.4f}")

    # Warmup.
    for _ in range(3):
        state, m = trainer._train_step(state, b, rng)
    jax.block_until_ready(m["loss"])

    t0 = time.time()
    for _ in range(args.steps):
        state, m = trainer._train_step(state, b, rng)
    jax.block_until_ready(m["loss"])
    dt = (time.time() - t0) / args.steps

    samples_per_sec = args.batch / dt
    mfu = (step_flops / dt / peak_flops_for(dev)) if step_flops else None
    log(f"step time: {dt*1e3:.1f} ms, samples/s/chip: {samples_per_sec:.2f}"
        + (f", MFU: {mfu*100:.1f}%" if mfu else ""))

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f).get("samples_per_sec_per_chip")
        if baseline:
            vs_baseline = samples_per_sec / baseline

    result = {
        "metric": f"{args.model_cfg}_{args.size}px_tw{args.time_window}_train_throughput",
        "value": round(samples_per_sec, 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(vs_baseline, 3),
        "step_ms": round(dt * 1e3, 2),
        "mfu": round(mfu, 4) if mfu else None,
        "params_m": round(n_params / 1e6, 2),
        "device": str(dev.device_kind),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
