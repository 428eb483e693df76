#!/usr/bin/env python3
"""Forward-only probe: fused Pallas pyramid stage vs the XLA 6-D fold.

DESIGN.md r05 leaves one named pyramid lever: a Pallas stage kernel that
fuses [InstanceNorm-apply + GELU of the previous stage] + [s2d fold] +
[stage matmul] + [IN statistics of the new stage] into one pass over the
feature map — deleting the 6-D transpose copy and the separate stat
reduction pass.  Per the round-3/round-5 gate methodology (lane-roll, px:
measure the forward in isolation BEFORE writing a backward), this probe
measures ONLY the forward of one 256^2 stage at the flagship shape:

* ``xla``    — pointwise(norm+gelu) -> 6-D fold -> matmul -> stats.
* ``pallas`` — the fused kernel: per grid step, a (2*hb, W, C) row block
  is normalized+gelu'd, folded via static strided views (4 partial
  matmuls, no lane concat), matmul'd, written, and its per-image stat
  row accumulated across the grid.

Numerics are asserted identical to bf16 rounding in interpret mode.

    python scripts/probe_pyramid_pallas.py --steps 30
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


def _stage_kernel(y_ref, mean_ref, inv_ref, k_ref, o_ref, s1_ref, s2_ref,
                  *, hb, w, c, f):
    """One grid step: rows [2*hb] of the input image -> rows [hb] of the
    output; per-image stat rows accumulate across the row-block grid."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref[...])
        s2_ref[...] = jnp.zeros_like(s2_ref[...])

    y = y_ref[0].astype(jnp.float32)  # (2hb, W, C)
    xn = (y - mean_ref[0, 0]) * inv_ref[0, 0]
    # PROBE NOTE: Mosaic implements neither erf nor erfc, so exact GELU
    # cannot lower in-kernel; the probe uses tanh-approximate GELU in BOTH
    # variants (timing-equivalent).  Shipping this kernel would need a
    # polynomial erf — an extra cost the probe's timing does not include.
    yn = jax.nn.gelu(xn, approximate=True).astype(y_ref.dtype)
    y4 = yn.reshape(hb, 2, w // 2, 2, c)
    acc = None
    for dy in (0, 1):
        for dx in (0, 1):
            part = jax.lax.dot_general(
                y4[:, dy, :, dx, :].reshape(hb * (w // 2), c),
                k_ref[(dy * 2 + dx) * c : (dy * 2 + dx + 1) * c, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    o_ref[0] = acc.reshape(hb, w // 2, f).astype(o_ref.dtype)
    s1_ref[0] += jnp.sum(acc, axis=0, keepdims=True)
    s2_ref[0] += jnp.sum(acc * acc, axis=0, keepdims=True)


@functools.lru_cache(maxsize=None)
def _make_stage(bt, h, w, c, f, hb, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    grid = (bt, h // (2 * hb))
    in_spec = pl.BlockSpec(
        (1, 2 * hb, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    stat_in = pl.BlockSpec(
        (1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    k_spec = pl.BlockSpec(
        (4 * c, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, hb, w // 2, f), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    stat_out = pl.BlockSpec(
        (1, 1, f), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_stage_kernel, hb=hb, w=w, c=c, f=f),
        grid=grid,
        in_specs=[in_spec, stat_in, stat_in, k_spec],
        out_specs=[out_spec, stat_out, stat_out],
        out_shape=[
            jax.ShapeDtypeStruct((bt, h // 2, w // 2, f), dtype),
            jax.ShapeDtypeStruct((bt, 1, f), jnp.float32),
            jax.ShapeDtypeStruct((bt, 1, f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=interpret,
    )


def stage_pallas(y0, mean, inv, k, hb=32, interpret=None):
    bt, h, w, c = y0.shape
    f = k.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    call = _make_stage(bt, h, w, c, f, hb, str(y0.dtype), bool(interpret))
    out, s1, s2 = call(
        y0, mean[:, None, :], inv[:, None, :], k.reshape(4 * c, f)
    )
    n = (h // 2) * (w // 2)
    mu = s1[:, 0] / n
    var = jnp.maximum(s2[:, 0] / n - mu * mu, 0.0)
    return out, mu, var


def stage_xla(y0, mean, inv, k):
    bt, h, w, c = y0.shape
    yn = jax.nn.gelu(
        (y0.astype(jnp.float32) - mean[:, None, None, :])
        * inv[:, None, None, :],
        approximate=True,  # match the kernel variant (see probe note)
    ).astype(y0.dtype)
    yn = yn.reshape(bt, h // 2, 2, w // 2, 2, c)
    yn = jnp.transpose(yn, (0, 1, 3, 2, 4, 5)).reshape(bt, h // 2, w // 2, 4 * c)
    out = jnp.dot(yn, k.reshape(4 * c, k.shape[-1]),
                  preferred_element_type=jnp.float32)
    f32 = out
    mu = jnp.mean(f32, axis=(1, 2))
    var = jnp.maximum(jnp.mean(f32 * f32, axis=(1, 2)) - mu * mu, 0.0)
    return out.astype(y0.dtype), mu, var


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bt", type=int, default=20)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--cin", type=int, default=96)
    ap.add_argument("--cout", type=int, default=96)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--hb", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    y0 = jnp.asarray(
        rng.standard_normal((args.bt, args.size, args.size, args.cin)).astype(
            np.float32
        )
    ).astype(jnp.bfloat16)
    mean = jnp.asarray(rng.standard_normal((args.bt, args.cin)).astype(np.float32)) * 0.1
    inv = jnp.asarray(rng.uniform(0.8, 1.2, (args.bt, args.cin)).astype(np.float32))
    k = jnp.asarray(
        (rng.standard_normal((2, 2, args.cin, args.cout)) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)

    # Numerics (small slice, interpret on CPU / compiled on TPU).
    o_x, mu_x, var_x = stage_xla(y0[:2], mean[:2], inv[:2], k)
    o_p, mu_p, var_p = stage_pallas(y0[:2], mean[:2], inv[:2], k, hb=args.hb)
    err = float(jnp.max(jnp.abs(o_x.astype(jnp.float32) - o_p.astype(jnp.float32))))
    err_s = float(jnp.max(jnp.abs(var_x - var_p)))
    log(f"stage agreement: out {err:.2e}, var {err_s:.2e}")
    assert err < 0.05 and err_s < 0.05, (err, err_s)

    results = {"agreement_out": err, "agreement_var": err_s}
    for name, fn in [("xla", stage_xla), ("pallas", stage_pallas)]:
        def run(y0, mean, inv, k):
            o, mu, var = fn(y0, mean, inv, k)
            return (
                jnp.sum(o.astype(jnp.float32)) + jnp.sum(mu) + jnp.sum(var)
            )

        def scan_steps(y0, mean, inv, k, n):
            def body(c, _):
                l = run(y0 + (c * 1e-8).astype(y0.dtype), mean, inv, k)
                return l.astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return out

        fjit = jax.jit(lambda *a: scan_steps(*a, args.steps))
        t0 = time.time()
        _ = float(fjit(y0, mean, inv, k))
        log(f"{name}: compile+first {time.time()-t0:.1f}s")
        t0 = time.time()
        _ = float(fjit(y0, mean, inv, k))
        dt = (time.time() - t0) / args.steps * 1e3
        log(f"{name}: {dt:.3f} ms per stage fwd")
        results[name + "_fwd_ms"] = round(dt, 3)

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
