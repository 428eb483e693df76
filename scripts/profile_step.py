#!/usr/bin/env python3
"""Capture + parse a per-op TPU profile of the flagship train step.

Runs the same jitted train step as bench.py, traces a few steps with
jax.profiler, then parses the xplane proto locally (jax.profiler.ProfileData
— no tensorboard server) and prints per-op self-times aggregated by op name
and by category, so kernel work is driven by measured hotspots instead of
arithmetic (DESIGN.md round-3 target list).

    python scripts/profile_step.py --batch 4 --size 512
    python scripts/profile_step.py --top 60 --xspace /tmp/profile_step/...
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bubbleformer")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def capture(args) -> str:
    import numpy as np

    from bubbleformer_tpu.config import load_config
    from bubbleformer_tpu.data import synthetic_batch
    from bubbleformer_tpu.parallel import make_mesh
    from bubbleformer_tpu.training import (
        ConditionedForecastModule,
        ForecastModule,
        Trainer,
    )

    cfg = load_config([f"model_cfg={args.model_cfg}", "optim_cfg=lion"])
    cfg["model_cfg"]["params"]["attn_impl"] = args.attn_impl
    if args.scan_blocks:
        cfg["model_cfg"]["params"]["scan_blocks"] = True
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
    n_fluid = (
        cfg["model_cfg"]["params"].get("num_fluid_params") if conditioned else None
    )
    batch = synthetic_batch(
        args.batch, args.time_window, 4, args.size, args.size,
        num_fluid_params=n_fluid,
    )
    mesh = make_mesh(data=1, model=1, devices=[jax.devices()[0]])
    trainer = Trainer(
        module, log_dir="/tmp/bench_logs", mesh=mesh, async_checkpoint=False
    )
    state = trainer.init_state(batch)
    b = trainer._put_batch(batch)
    rng = jax.random.key(0)

    if args.scanned:
        # Trace the SCANNED device-only loop (the recorded bench metric).
        # Per-call traces overweight donation-boundary relayouts that do
        # not exist on the scanned path (measured round 4: a 7.4 ms
        # whole-parameter re-tile appeared per-call only) — profile what
        # you optimize.
        train_step = module.make_train_step()

        def scan_steps(s):
            def body(carry, _):
                s2, mtr = train_step(carry, b, rng)
                return s2, mtr["loss"]
            return jax.lax.scan(body, s, None, length=args.trace_steps)

        scan_fn = jax.jit(scan_steps, donate_argnums=0)
        t0 = time.time()
        state, losses = scan_fn(state)
        _ = float(losses[-1])
        log(f"compile+first scanned loop: {time.time() - t0:.1f}s")
        os.makedirs(args.out, exist_ok=True)
        jax.profiler.start_trace(args.out)
        state, losses = scan_fn(state)
        _ = float(losses[-1])
        jax.profiler.stop_trace()
    else:
        t0 = time.time()
        state, m = trainer._train_step(state, b, rng)
        _ = float(m["loss"])
        log(f"compile+first step: {time.time() - t0:.1f}s")
        for _ in range(3):
            state, m = trainer._train_step(state, b, rng)
        _ = float(m["loss"])

        os.makedirs(args.out, exist_ok=True)
        jax.profiler.start_trace(args.out)
        for _ in range(args.trace_steps):
            state, m = trainer._train_step(state, b, rng)
        _ = float(m["loss"])
        jax.profiler.stop_trace()
    paths = sorted(
        glob.glob(os.path.join(args.out, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no xplane.pb written under {args.out}")
    log(f"trace: {paths[-1]}")
    return paths[-1]


_CATEGORIES = [
    ("pallas", re.compile(r"tpu_custom_call|custom-call")),
    ("matmul", re.compile(r"dot|conv")),
    ("copy/relayout", re.compile(r"copy|transpose|bitcast|reshape")),
    ("allreduce", re.compile(r"all-reduce|reduce-scatter|all-gather")),
    ("fusion", re.compile(r"fusion")),
]


def parse(xspace_path: str, top: int, trace_steps: int):
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(xspace_path, "rb").read()
    )
    per_op = defaultdict(float)
    examples = {}
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/module summary lines.
            if "step" in lname or "module" in lname.replace("xla modules", "x"):
                pass
            for ev in line.events:
                dur = ev.duration_ns / 1e6  # ms
                name = ev.name
                stats = {}
                try:
                    for k, v in ev.stats:
                        stats[k] = v
                except Exception:
                    pass
                if line.name.startswith("XLA Ops") or "hlo_category" in stats:
                    key = re.sub(r"\.\d+", "", name)
                    per_op[key] += dur
                    total += dur
                    if key not in examples and stats:
                        examples[key] = stats
    if not per_op:
        # Fallback: aggregate every line, noting line names.
        for plane in pd.planes:
            for line in plane.lines:
                for ev in line.events:
                    per_op[f"{plane.name}/{line.name}/{ev.name}"] += (
                        ev.duration_ns / 1e6
                    )
        total = sum(per_op.values())

    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"\n== top {top} ops by total time over {trace_steps} steps "
          f"(sum {total:.1f} ms, {total/max(trace_steps,1):.2f} ms/step)")
    for name, ms in rows[:top]:
        cat = next((c for c, rx in _CATEGORIES if rx.search(name)), "other")
        print(f"{ms/max(trace_steps,1):9.3f} ms/step  [{cat:14s}] {name[:140]}")

    by_cat = defaultdict(float)
    for name, ms in rows:
        cat = next((c for c, rx in _CATEGORIES if rx.search(name)), "other")
        by_cat[cat] += ms
    print("\n== by category (ms/step)")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{ms/max(trace_steps,1):9.3f}  {cat}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--time-window", type=int, default=5)
    ap.add_argument("--model-cfg", default="film_avit_small")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--attn-impl", default="auto")
    ap.add_argument("--scan-blocks", action="store_true")
    ap.add_argument("--trace-steps", type=int, default=5)
    ap.add_argument(
        "--scanned",
        action="store_true",
        help="trace the scanned device-only loop (the bench metric) instead "
        "of per-call steps — per-call traces overweight donation-boundary "
        "relayouts",
    )
    ap.add_argument("--out", default="/tmp/profile_step")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--xspace", default=None, help="parse an existing trace")
    args = ap.parse_args()

    path = args.xspace or capture(args)
    parse(path, args.top, args.trace_steps)


if __name__ == "__main__":
    main()
