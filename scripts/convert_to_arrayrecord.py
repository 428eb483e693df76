#!/usr/bin/env python3
"""Convert BubbleML HDF5 trajectories to ArrayRecord shards for streaming.

One record per timestep: the stacked ``(num_fields, H, W)`` frame as raw
bytes, plus a JSON sidecar carrying the field order, frame shape/dtype,
trajectory length, per-field one-pass statistics (so ``normalize()`` needs
no startup scan) and the fluid-parameter dict when a ``<name>.json`` file
sits next to the trajectory (the layout ``scripts/flashx_util.py`` writes).

    python scripts/convert_to_arrayrecord.py --out /data/arrec \
        Twall-100.hdf5 Twall-103.hdf5 --fields dfun temperature velx vely

The output pairs load through
:class:`bubbleformer_tpu.data.arrayrecord.ArrayRecordForecast` (same sample
semantics as the HDF5 ``BubbleForecast``) and through grain's native
``ArrayRecordDataSource``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import h5py as h5
import numpy as np

from bubbleformer_tpu.data.dataset import DEFAULT_FIELDS
from bubbleformer_tpu.data.arrayrecord import sidecar_path


def convert_file(
    src: str,
    out_dir: str,
    fields: list[str],
    dtype: str = "float32",
    group_size: int = 16,
) -> str:
    from array_record.python.array_record_module import ArrayRecordWriter

    base = os.path.splitext(os.path.basename(src))[0]
    dst = os.path.join(out_dir, base + ".arrayrecord")
    np_dtype = np.dtype(dtype)

    with h5.File(src, "r") as f:
        traj_len = f[fields[0]].shape[0]
        frame_hw = f[fields[0]].shape[1:]
        stats = {
            name: {"count": 0, "total": 0.0, "total_sq": 0.0,
                   "min": np.inf, "max": -np.inf}
            for name in fields
        }
        writer = ArrayRecordWriter(dst, f"group_size:{group_size}")
        try:
            for t in range(traj_len):
                frame = np.stack(
                    [np.asarray(f[name][t], dtype=np.float64) for name in fields]
                )
                for ci, name in enumerate(fields):
                    s = stats[name]
                    block = frame[ci]
                    s["count"] += block.size
                    s["total"] += float(block.sum())
                    s["total_sq"] += float((block * block).sum())
                    s["min"] = min(s["min"], float(block.min()))
                    s["max"] = max(s["max"], float(block.max()))
                writer.write(frame.astype(np_dtype).tobytes())
        finally:
            writer.close()

    side = {
        "source": os.path.abspath(src),
        "fields": fields,
        "frame_shape": [len(fields), *frame_hw],
        "frame_dtype": dtype,
        "traj_len": int(traj_len),
        "stats": {},
    }
    for name, s in stats.items():
        mean = s["total"] / s["count"]
        var = max(s["total_sq"] / s["count"] - mean * mean, 0.0)
        side["stats"][name] = {
            "count": int(s["count"]),
            "mean": mean,
            "std": float(np.sqrt(var)),
            "min": s["min"],
            "max": s["max"],
        }
    params_json = src.replace(".hdf5", ".json")
    if os.path.exists(params_json):
        with open(params_json, "r", encoding="utf-8") as f:
            side["fluid_params"] = json.load(f)
    with open(sidecar_path(dst), "w", encoding="utf-8") as f:
        json.dump(side, f)
    return dst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sources", nargs="+", help="HDF5 trajectory files")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--fields", nargs="+", default=DEFAULT_FIELDS)
    ap.add_argument(
        "--dtype", default="float32", choices=["float32", "float16"],
        help="stored frame dtype (float16 halves shard size; samples are "
        "decoded to float32 either way)",
    )
    ap.add_argument("--group-size", type=int, default=16,
                    help="records per compressed chunk (higher = better "
                    "compression, coarser random reads)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for src in args.sources:
        dst = convert_file(src, args.out, list(args.fields), args.dtype,
                           args.group_size)
        size_mb = os.path.getsize(dst) / 1e6
        print(f"{src} -> {dst} ({size_mb:.1f} MB)")


if __name__ == "__main__":
    main()
