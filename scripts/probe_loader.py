#!/usr/bin/env python3
"""Host input-pipeline throughput probe at training scale.

Round-2 sized the native loader at 92.6 ms/batch against a 232 ms device
step (DESIGN.md); the step is now ~110 ms and falling, so this re-measures
the feed rate at the current scale (VERDICT round-2 item 6).  Generates
512^2 BubbleML-shaped trajectories, then times the DataLoader (native
C/OpenMP batch assembly over memmap caches, 8 workers) end to end.

    python scripts/probe_loader.py --batch 4 --size 512 --frames 30
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--trajs", type=int, default=2)
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    from bubbleformer_tpu.data import BubbleForecast, DataLoader

    tmp = tempfile.mkdtemp(prefix="loader_probe_")
    subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "make_sample_data.py"),
            "--out", tmp, "--n", str(args.trajs),
            "--frames", str(args.frames), "--size", str(args.size),
        ],
        check=True, capture_output=True,
    )
    fields = ["dfun", "temperature", "velx", "vely"]
    ds = BubbleForecast(
        filenames=[os.path.join(tmp, f"sample_{i+1}.hdf5") for i in range(args.trajs)],
        input_fields=fields, output_fields=fields,
        norm="std", time_window=5, start_time=0,
    )
    ds.normalize()

    results = {}
    for native in (False, True):
        if native and not ds.enable_native():
            print("native loader unavailable", file=sys.stderr)
            continue
        loader = DataLoader(
            ds, batch_size=args.batch, shuffle=True, seed=0,
            num_workers=args.workers,
        )
        it = iter(loader)
        for _ in range(3):  # warm page cache + workers
            next(it)
        t0 = time.time()
        got = 0
        while got < args.batches:
            try:
                next(it)
            except StopIteration:
                loader.set_epoch(got)
                it = iter(loader)
                continue
            got += 1
        dt = (time.time() - t0) / args.batches
        key = "native" if native else "numpy"
        results[key] = {
            "ms_per_batch": round(dt * 1e3, 1),
            "samples_per_sec": round(args.batch / dt, 1),
        }
        print(f"{key}: {dt*1e3:.1f} ms/batch ({args.batch/dt:.1f} samples/s host)",
              flush=True)

    print(json.dumps({
        "batch": args.batch, "size": args.size, "workers": args.workers,
        **results,
    }))


if __name__ == "__main__":
    main()
