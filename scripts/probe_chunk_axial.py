#!/usr/bin/env python3
"""Probe + microbench for the lane-major CHUNK-MATMUL axial formulation.

Second candidate for the round-3 axial rewrite (the first — VPU within-block
lane rolls, ``scripts/probe_lane_axial.py`` — measured 2.72 ms/block fwd for
the 64-offset core; with a backward at the temporal kernel's measured
bwd:fwd ratio that lands the branch ~9 ms/block, losing to fused_block's
7.6).  This formulation keeps the temporal megakernel's lane-major ``(C, N)``
slab layout for all staging/norms/projections (the ~3.4 ms/block of glue the
packed kernels pay) but runs the pair work on the MXU:

* row attention: per (head, 128-lane chunk) matmuls straight off the slab —
  ``S = dot(q_c (d,128), k_c (d,128), contract sublanes)`` -> (128i, 128j),
  a single native MXU tile with only 4x block-diag waste (vs 24x for the
  head-packed XLA-boundary kernels, which needed few-big-dispatch shapes);
  invalid cross-W-block pairs are masked by the constant per-head bias table;
  ``pv = dot(v_c (d,128), P (128i,128j), contract lanes x lanes)``.
* column attention: the same machinery on a transposed slab, where the
  (h-major -> w-major) lane permutation is ONE exact MXU matmul per slab
  (0/1 matrix; bf16 products with one nonzero term are exact).
* the window mean of v (attn_scale low-frequency term) is one block-diag
  constant matmul per axis: ``vm = dot(v (C,N), Mblk (N,N) = kron(I, 1/W))``.

This script answers, on the real chip:
  1. do the two dot_general transpose combos (contract 0x0, contract 1x1)
     lower in Mosaic and produce correct values from strided slab slices;
  2. is the 0/1 permutation matmul bit-exact in bf16;
  3. what the full fwd attention core (rows + columns, softmax, attn_scale
     blend) costs per block at the flagship shape — target <= 1 ms vs the
     packed kernel's isolated 1.92 ms fwd and the lane-roll probe's 2.72.
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


# ---------------------------------------------------------------- probes


def probe_dot_combos():
    """Contract-dim0 x dim0 and dim1 x dim1 dot_generals on slab slices."""
    d, c, n, ch = 64, 384, 1024, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32), jnp.bfloat16)

    def kernel(x_ref, y_ref, s_ref, pv_ref):
        q = x_ref[0:d, 0:ch]
        k = y_ref[0:d, 0:ch]
        v = y_ref[d : 2 * d, 0:ch]
        s = jax.lax.dot_general(
            q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        s_ref[...] = s
        p = jax.nn.softmax(s, axis=-1)
        pv_ref[...] = jax.lax.dot_general(
            v, p.astype(v.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    s, pv = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((ch, ch), jnp.float32),
            jax.ShapeDtypeStruct((d, ch), jnp.float32),
        ],
    )(x, y)
    xf = np.asarray(x.astype(jnp.float32))
    yf = np.asarray(y.astype(jnp.float32))
    s_ref = xf[0:d, 0:ch].T @ yf[0:d, 0:ch]
    e1 = float(np.max(np.abs(np.asarray(s) - s_ref)))
    p_ref = np.asarray(jax.nn.softmax(jnp.asarray(s_ref), axis=-1))
    pv_ref = yf[d : 2 * d, 0:ch] @ p_ref.astype(np.float32).T
    e2 = float(np.max(np.abs(np.asarray(pv) - pv_ref)))
    # bf16 operands: tolerances are bf16-mantissa-scale.
    ok = e1 < 0.25 and e2 < 0.25
    return ok, f"s_err={e1:.2e} pv_err={e2:.2e}"


def probe_perm_matmul():
    """0/1 lane-permutation matmul (h-major -> w-major) is exact in bf16."""
    c, h, w = 384, 32, 32
    n = h * w
    rng = np.random.default_rng(1)
    xf = rng.standard_normal((c, n)).astype(np.float32)
    x = jnp.asarray(xf, jnp.bfloat16)
    # P[i, j] = 1 where j = (i % w) * h + i // w  (lane i h-major -> w-major).
    i = np.arange(n)
    perm = (i % w) * h + i // w
    p_np = np.zeros((n, n), np.float32)
    p_np[i, perm] = 1.0
    p = jnp.asarray(p_np, jnp.bfloat16)

    def kernel(x_ref, p_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], p_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    o = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n), jnp.bfloat16),
    )(x, p)
    ref = np.asarray(x.astype(jnp.float32)).reshape(c, h, w).transpose(0, 2, 1)
    err = float(
        np.max(np.abs(np.asarray(o.astype(jnp.float32)) - ref.reshape(c, n)))
    )
    return err == 0.0, f"perm_err={err:.1e}"


# ------------------------------------------------- fwd attention core bench


def _axis_pass(q, k, v, bias_ref, mblk_small, s_col, heads, d, ch, n):
    """One axial direction: per-(head, chunk) MXU attention on the slab.

    Chunk outputs are assembled by static concatenation (the lowering pattern
    the temporal megakernel proved out), not scatter updates.
    """
    scaling = d**-0.5
    head_rows = []
    for hd in range(heads):
        rows = slice(hd * d, (hd + 1) * d)
        s_h = s_col[hd, 0]
        chunks = []
        for ci in range(n // ch):
            sl = slice(ci * ch, (ci + 1) * ch)
            s = jax.lax.dot_general(
                q[rows, sl], k[rows, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scaling + bias_ref[hd * ch : (hd + 1) * ch, :]
            p = jax.nn.softmax(s, axis=-1)
            # attn_scale blend folded into the probability matrix:
            # o = v @ (s_h p + (1-s_h)/blk Mblk)^T — one matmul, no
            # separate window-mean matmul.
            pb = (s_h * p + mblk_small * (1.0 - s_h)).astype(v.dtype)
            chunks.append(
                jax.lax.dot_general(
                    v[rows, sl], pb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        head_rows.append(
            chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)
        )
    return jnp.concatenate(head_rows, axis=0) if heads > 1 else head_rows[0]


def _core_kernel(q_ref, kv_ref, br_ref, bc_ref, mrs_ref, mcs_ref, perm_ref,
                 sc_ref, o_ref, *, heads, d, h, w, ch):
    c = heads * d
    n = h * w
    q = q_ref[...]
    k = kv_ref[0:c, :]
    v = kv_ref[c : 2 * c, :]

    o_row = _axis_pass(q, k, v, br_ref, mrs_ref[...], sc_ref[:, 0:1],
                       heads, d, ch, n)

    # Column pass on the w-major-transposed slabs (one exact matmul each).
    tr = lambda x: jax.lax.dot_general(
        x, perm_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    qt, kt, vt = tr(q), tr(k), tr(v)
    o_col_t = _axis_pass(qt, kt, vt, bc_ref, mcs_ref[...], sc_ref[:, 1:2],
                         heads, d, ch, n)
    # Transpose back: P is an involution here only if h == w; use P^T via
    # contracting the second dim of perm.
    o_col = jax.lax.dot_general(
        o_col_t.astype(q.dtype), perm_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (0.5 * (o_row + o_col)).astype(o_ref.dtype)


def bench_core(args):
    heads, d = args.heads, args.embed_dim // args.heads
    c = heads * d
    h = w = args.grid
    n = h * w
    ch = args.chunk
    bt = args.batch * args.tw
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((bt, c, n)).astype(np.float32), dtype)
    kv = jnp.asarray(
        rng.standard_normal((bt, 2 * c, n)).astype(np.float32), dtype
    )
    # Per-head (ch, ch) bias tables with -1e9 off-block masking, stacked.
    def mk_bias(blk, nblk_in_ch):
        t = np.full((heads, ch, ch), -1e9, np.float32)
        for hd in range(heads):
            bias = rng.standard_normal((blk, blk)).astype(np.float32) * 0.1
            for g in range(nblk_in_ch):
                sl = slice(g * blk, (g + 1) * blk)
                t[hd, sl, sl] = bias
        return jnp.asarray(t.reshape(heads * ch, ch))

    br = mk_bias(w, ch // w)
    bc = mk_bias(h, ch // h)
    mrs = jnp.asarray(
        np.kron(
            np.eye(ch // w, dtype=np.float32), np.full((w, w), 1.0 / w)
        )
    )
    mcs = jnp.asarray(
        np.kron(
            np.eye(ch // h, dtype=np.float32), np.full((h, h), 1.0 / h)
        )
    )
    i = np.arange(n)
    p_np = np.zeros((n, n), np.float32)
    p_np[i, (i % w) * h + i // w] = 1.0
    perm = jnp.asarray(p_np, dtype)
    sc = jnp.asarray(rng.uniform(0.5, 1.5, (heads, 2)).astype(np.float32))

    slab = pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (1, 2 * c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, (lambda i: (0,) * len(shape)), memory_space=pltpu.VMEM
    )

    def kern(q_ref, kv_ref, br_ref, bc_ref, mrs_ref, mcs_ref, perm_ref,
             sc_ref, o_ref):
        _core_kernel(
            q_ref.at[0], kv_ref.at[0], br_ref, bc_ref, mrs_ref, mcs_ref,
            perm_ref, sc_ref, o_ref.at[0], heads=heads, d=d, h=h, w=w, ch=ch,
        )

    call = pl.pallas_call(
        kern,
        grid=(bt,),
        in_specs=[slab, kv_spec, const((heads * ch, ch)), const((heads * ch, ch)),
                  const((ch, ch)), const((ch, ch)), const((n, n)),
                  const((heads, 2))],
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
            o = call(qq, kk, br, bc, mrs, mcs, perm, sc)
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
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    for name, fn in [("dot_combos", probe_dot_combos),
                     ("perm_matmul", probe_perm_matmul)]:
        try:
            ok, detail = fn()
            log(f"{name}: {'OK' if ok else 'MISMATCH'} {detail}")
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAIL {type(e).__name__}: "
                + str(e).replace("\n", " | ")[:300])

    if not args.skip_bench:
        dt, compile_s = bench_core(args)
        print(
            json.dumps(
                {
                    "probe": "chunk_axial_core_fwd",
                    "ms_per_call": round(dt * 1e3, 3),
                    "compile_s": round(compile_s, 1),
                    "batch": args.batch,
                    "chunk": args.chunk,
                    "note": "one call = rows+cols per-head chunk-matmul "
                    "attention core fwd (incl. transposes, window means, "
                    "attn_scale blend) for the whole (B, C, N) per-frame set",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
