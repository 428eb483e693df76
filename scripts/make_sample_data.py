#!/usr/bin/env python3
"""Synthesize small BubbleML-shaped sample trajectories for smoke runs.

Produces HDF5 files with the reference sample layout (fields
dfun/temperature/velx/vely, (T, H, W) float32 — like the reference's
committed ``samples/sample_{1,2}.hdf5`` fixtures) plus fluid-parameter JSON
sidecars, but with *synthetic* physics: a rising, oscillating bubble whose
SDF is exact (so the eikonal residual of the ground truth is ~0), a thermal
plume, and a divergence-free-ish velocity field.

    python scripts/make_sample_data.py --out samples/ --n 2 --frames 50 --size 64
"""
from __future__ import annotations

import argparse
import json
import os

import h5py
import numpy as np


def bubble_trajectory(frames: int, size: int, seed: int):
    rng = np.random.default_rng(seed)
    ys, xs = np.meshgrid(
        np.linspace(0, 1, size), np.linspace(0, 1, size), indexing="ij"
    )
    cx0, cy0 = rng.uniform(0.35, 0.65), rng.uniform(0.15, 0.3)
    radius = rng.uniform(0.08, 0.15)
    rise = rng.uniform(0.008, 0.012)
    wobble = rng.uniform(0.01, 0.03)

    dfun = np.empty((frames, size, size), np.float32)
    temp = np.empty_like(dfun)
    velx = np.empty_like(dfun)
    vely = np.empty_like(dfun)
    for t in range(frames):
        cx = cx0 + wobble * np.sin(0.3 * t)
        cy = cy0 + rise * t
        r = np.sqrt((xs - cx) ** 2 + (ys - cy) ** 2)
        dfun[t] = (radius - r).astype(np.float32)  # >0 inside bubble (vapor)
        temp[t] = (
            60.0
            + 30.0 * np.exp(-(((xs - cx) / 0.2) ** 2) - ((ys - 0.0) / 0.3) ** 2)
            + rng.normal(0, 0.2, (size, size))
        ).astype(np.float32)
        # Potential-flow-ish field around the bubble + buoyant updraft.
        theta = np.arctan2(ys - cy, xs - cx)
        speed = 0.1 * np.exp(-((r / (2 * radius)) ** 2))
        velx[t] = (speed * np.cos(theta) + rng.normal(0, 0.005, (size, size))).astype(
            np.float32
        )
        vely[t] = (
            speed * np.sin(theta)
            + 0.05 * np.exp(-(((xs - cx) / 0.25) ** 2))
            + rng.normal(0, 0.005, (size, size))
        ).astype(np.float32)
    return {"dfun": dfun, "temperature": temp, "velx": velx, "vely": vely}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="samples")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    for i in range(args.n):
        path = os.path.join(args.out, f"sample_{i + 1}.hdf5")
        fields = bubble_trajectory(args.frames, args.size, args.seed + i)
        with h5py.File(path, "w") as f:
            for name, data in fields.items():
                f.create_dataset(name, data=data)
        params = {
            "inv_reynolds": 0.0084,
            "cpgas": 0.83,
            "mugas": 1.0,
            "rhogas": 0.0083,
            "thcogas": 0.25,
            "stefan": 0.063,
            "prandtl": 8.34,
            "heater": {"nucWaitTime": 0.4, "wallTemp": 91.0 + i},
        }
        with open(path.replace(".hdf5", ".json"), "w") as f:
            json.dump(params, f, indent=2)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
