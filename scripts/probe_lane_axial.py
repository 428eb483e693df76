#!/usr/bin/env python3
"""Probe + microbench for the lane-major axial attention formulation.

DESIGN.md round-3 target: rewrite the axial stack (rows + columns) in the
temporal megakernel's lane-major ``(C, T*N)`` layout, with the W x W / H x H
pair work expressed as circular lane rolls of the whole k/v slab.  Unlike the
temporal case (rolls at stride N = tile-aligned multiples of 1024 lanes), the
axial rolls are sub-tile: stride 1 (rows) and stride W = 32 (columns), and
must stay *within* each W-block / N-block.  A within-block circular roll
decomposes into two whole-slab rolls + a lane select:

    within_roll(x, r)[.., g*W + w] = x[.., g*W + (w+r) % W]
                                   = where(w < W - r, roll(x, r), roll(x, r-W))

and circular within-block rolls cover every (i, j) attention pair exactly
once in W offsets (not the 2W-1 signed offsets the DESIGN sketch assumed) —
for full bidirectional attention, j = (i+r) % W sweeps all j as r sweeps
0..W-1, with the per-(position, offset) T5 bias looked up at the true
relative position, so no masking is ever needed.

This script answers, on the real chip, the two questions that decide whether
the kernel is worth its backward:
  1. do sub-tile lane rolls lower in Mosaic (bf16 + f32) and are they correct;
  2. what does the full 64-offset fwd attention core cost per block at the
     flagship shape (B=4, T=5, 32x32 grid, C=384, heads=6) — the current
     fused_block spends ~7.6 ms/block fwd+bwd on the whole branch.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bubbleformer")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _roll(x, cut):
    """Whole-slab circular lane roll left by ``cut`` (static)."""
    if not cut:
        return x
    return jnp.concatenate([x[:, cut:], x[:, :cut]], axis=1)


def _within_roll(x, r, block, total):
    """Circular roll by r within each ``block``-lane group."""
    if not r:
        return x
    if block == total:
        return _roll(x, r)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, total), 1) % block
    return jnp.where(lane < block - r, _roll(x, r), _roll(x, r - block + total))


# ---------------------------------------------------------------- probes


def probe_within_roll(dtype):
    C, H, W, T = 16, 8, 32, 2
    TN = T * H * W
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, TN)).astype(np.float32), dtype)

    def kernel(x_ref, o1_ref, o2_ref):
        xv = x_ref[...]
        o1_ref[...] = _within_roll(xv, 5, W, TN)         # row roll, stride 1
        o2_ref[...] = _within_roll(xv, 3 * W, H * W, TN)  # col roll, stride W

    o1, o2 = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((C, TN), dtype)] * 2,
    )(x)
    xf = np.asarray(x.astype(jnp.float32)).reshape(C, T * H, W)
    ref1 = np.roll(xf, -5, axis=2).reshape(C, TN)
    xf2 = np.asarray(x.astype(jnp.float32)).reshape(C, T, H, W)
    ref2 = np.roll(xf2, -3, axis=2).reshape(C, TN)
    e1 = float(np.max(np.abs(np.asarray(o1.astype(jnp.float32)) - ref1)))
    e2 = float(np.max(np.abs(np.asarray(o2.astype(jnp.float32)) - ref2)))
    return max(e1, e2) < 1e-6, f"row_err={e1:.1e} col_err={e2:.1e}"


# ------------------------------------------------- fwd attention core bench


def _core_kernel(q_ref, kv_ref, bx_ref, by_ref, sc_ref, o_ref, *, heads, d,
                 t_len, h, w):
    """Lane-major axial attention core: rows + columns averaged.

    q: (C, TN) f32-ish input (plays the post-qk-LN query), kv: (2C, TN).
    bx: (W*heads, TN) row bias lane table; by: (H*heads, TN) column table.
    sc: (C, 2) per-head-constant attn-scale columns [row | col].
    """
    c = heads * d
    n = h * w
    tn = n  # one frame per grid step; T folded into the grid
    scaling = d**-0.5
    q = q_ref[...].astype(jnp.float32)

    def seg(x):
        return jnp.sum(x.reshape(heads, d, tn), axis=1)

    def expand(x):
        return jnp.broadcast_to(
            x.reshape(heads, 1, tn), (heads, d, tn)
        ).reshape(c, tn)

    out = None
    for axis, (noff, block, stride, b_ref, s_col) in enumerate(
        [(w, w, 1, bx_ref, sc_ref[:, 0:1]), (h, n, w, by_ref, sc_ref[:, 1:2])]
    ):
        logits = []
        for r in range(noff):
            k_r = _within_roll(kv_ref[0:c, :], r * stride, block, tn)
            logits.append(
                seg(q * k_r) * scaling
                + b_ref[r * heads : (r + 1) * heads, :]
            )
        m = logits[0]
        for r in range(1, noff):
            m = jnp.maximum(m, logits[r])
        exps = [jnp.exp(l - m) for l in logits]
        z = exps[0]
        for r in range(1, noff):
            z = z + exps[r]
        inv_z = 1.0 / z
        pv = None
        vmean = None
        for r in range(noff):
            v_r = _within_roll(kv_ref[c : 2 * c, :], r * stride, block, tn)
            pv_c = expand(exps[r] * inv_z) * v_r
            pv = pv_c if pv is None else pv + pv_c
            vmean = v_r.astype(jnp.float32) if vmean is None else vmean + v_r
        vmean = vmean * (1.0 / noff)
        o = s_col * pv + (1.0 - s_col) * vmean
        out = o if out is None else (out + o) * 0.5
    o_ref[...] = out.astype(o_ref.dtype)


def bench_core(args):
    heads, d = args.heads, args.embed_dim // args.heads
    c = heads * d
    h = w = args.grid
    t_len = args.tw
    n = h * w
    bt = args.batch * t_len
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((bt, c, n)).astype(np.float32), dtype)
    kv = jnp.asarray(
        rng.standard_normal((bt, 2 * c, n)).astype(np.float32), dtype
    )
    bx = jnp.asarray(
        rng.standard_normal((w * heads, n)).astype(np.float32) * 0.1
    )
    by = jnp.asarray(
        rng.standard_normal((h * heads, n)).astype(np.float32) * 0.1
    )
    sc = jnp.asarray(rng.uniform(0.5, 1.5, (c, 2)).astype(np.float32))

    slab = pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (1, 2 * c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )

    def kern(q_ref, kv_ref, bx_ref, by_ref, sc_ref, o_ref):
        _core_kernel(
            q_ref.at[0], kv_ref.at[0], bx_ref, by_ref, sc_ref, o_ref.at[0],
            heads=heads, d=d, t_len=t_len, h=h, w=w,
        )

    call = pl.pallas_call(
        kern,
        grid=(bt,),
        in_specs=[slab, kv_spec, const((w * heads, n)),
                  const((h * heads, n)), const((c, 2))],
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct((bt, c, n), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )

    nsteps = args.steps

    @jax.jit
    def run(q, kv):
        def body(carry, _):
            qq, kk = carry
            o = call(qq, kk, bx, by, sc)
            return (o, kk), jnp.sum(o[0, 0, :8].astype(jnp.float32))

        _, vals = jax.lax.scan(body, (q, kv), None, length=nsteps)
        return vals[-1]

    t0 = time.time()
    _ = float(run(q, kv))
    compile_s = time.time() - t0
    t0 = time.time()
    _ = float(run(q, kv))
    dt = (time.time() - t0) / nsteps
    return dt, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--tw", type=int, default=5)
    ap.add_argument("--grid", type=int, default=32)
    ap.add_argument("--embed-dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        try:
            ok, detail = probe_within_roll(dt)
            log(f"within_roll {dt_name}: {'OK' if ok else 'MISMATCH'} {detail}")
        except Exception as e:  # noqa: BLE001
            log(f"within_roll {dt_name}: FAIL {type(e).__name__}: "
                + str(e).replace("\n", " | ")[:300])

    if not args.skip_bench:
        dt, compile_s = bench_core(args)
        print(
            json.dumps(
                {
                    "probe": "lane_axial_core_fwd",
                    "ms_per_call": round(dt * 1e3, 3),
                    "compile_s": round(compile_s, 1),
                    "batch": args.batch,
                    "offsets": 2 * args.grid,
                    "note": "one call = rows+cols attention core fwd for the "
                    "whole (B, C, T*N) activation set; multiply by 12 for "
                    "the stack-share estimate",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
