#!/usr/bin/env python3
"""Probe Mosaic lowering support for ops the fused axial kernel needs.

Checks, on the real TPU:
  1. reshape (H, Wc, d) -> (H*Wc, d) inside a kernel (column-window packing)
  2. reshape (Gr, W, d) -> (Gr*W, d) inside a kernel (row-window packing)
  3. jnp.transpose((H, Wc, d) -> (Wc, H, d)) inside a kernel (fallback)

Each probe verifies numerics vs the XLA equivalent.
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, D = 32, 32, 64
WC = 8


def probe(name, fn):
    try:
        ok, detail = fn()
        print(f"{name}: {'OK' if ok else 'MISMATCH'} {detail}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:300]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def _run(kernel, x, out_shape):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
    )(x)


def probe_reshape_col():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((H, WC, D)), jnp.float32)

    def kernel(x_ref, o_ref):
        a = x_ref[...].reshape(H * WC, D)
        o_ref[...] = jnp.dot(a, a.T, preferred_element_type=jnp.float32)

    out = _run(kernel, x, jax.ShapeDtypeStruct((H * WC, H * WC), jnp.float32))
    a = x.reshape(H * WC, D)
    ref = a @ a.T
    err = float(jnp.max(jnp.abs(out - ref)))
    return err < 1e-3, f"max_err={err:.2e}"


def probe_reshape_row():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, W, D)), jnp.float32)

    def kernel(x_ref, o_ref):
        a = x_ref[...].reshape(8 * W, D)
        o_ref[...] = jnp.dot(a, a.T, preferred_element_type=jnp.float32)

    out = _run(kernel, x, jax.ShapeDtypeStruct((8 * W, 8 * W), jnp.float32))
    a = x.reshape(8 * W, D)
    ref = a @ a.T
    err = float(jnp.max(jnp.abs(out - ref)))
    return err < 1e-3, f"max_err={err:.2e}"


def probe_transpose():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((H, WC, D)), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...], (1, 0, 2))

    out = _run(kernel, x, jax.ShapeDtypeStruct((WC, H, D), jnp.float32))
    ref = jnp.transpose(x, (1, 0, 2))
    err = float(jnp.max(jnp.abs(out - ref)))
    return err < 1e-3, f"max_err={err:.2e}"


def probe_sliced_block_dot():
    """Block (1, H, Wc, 1, d) style: squeeze leading/trailing singleton dims."""
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, H, WC, 1, D)), jnp.float32
    )

    def kernel(x_ref, o_ref):
        a = x_ref[0, :, :, 0, :].reshape(H * WC, D)
        o_ref[...] = jnp.dot(a, a.T, preferred_element_type=jnp.float32)

    out = _run(kernel, x, jax.ShapeDtypeStruct((H * WC, H * WC), jnp.float32))
    a = x[0, :, :, 0, :].reshape(H * WC, D)
    ref = a @ a.T
    err = float(jnp.max(jnp.abs(out - ref)))
    return err < 1e-3, f"max_err={err:.2e}"


def probe_bf16_dot():
    x = jnp.asarray(np.random.default_rng(4).standard_normal((256, D)), jnp.bfloat16)

    def kernel(x_ref, o_ref):
        a = x_ref[...]
        o_ref[...] = jnp.dot(a, a.T, preferred_element_type=jnp.float32)

    out = _run(kernel, x, jax.ShapeDtypeStruct((256, 256), jnp.float32))
    ref = jnp.dot(x, x.T, preferred_element_type=jnp.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    return err < 1e-1, f"max_err={err:.2e}"


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    probe("reshape_col (H,Wc,d)->(H*Wc,d) + dot", probe_reshape_col)
    probe("reshape_row (Gr,W,d)->(Gr*W,d) + dot", probe_reshape_row)
    probe("transpose (H,Wc,d)->(Wc,H,d)", probe_transpose)
    probe("sliced 5D block -> 2D dot", probe_sliced_block_dot)
    probe("bf16 in, f32 dot", probe_bf16_dot)


def probe_split_reshape():
    x = jnp.asarray(np.random.default_rng(5).standard_normal((128, 64)), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(4, 32, 64) * 2.0

    out = _run(kernel, x, jax.ShapeDtypeStruct((4, 32, 64), jnp.float32))
    err = float(jnp.max(jnp.abs(out - x.reshape(4, 32, 64) * 2.0)))
    return err < 1e-6, f"max_err={err:.2e}"


def probe_concat0():
    x = jnp.asarray(np.random.default_rng(6).standard_normal((4, 32, 64)), jnp.float32)

    def kernel(x_ref, o_ref):
        a = x_ref[...]
        o_ref[...] = jnp.concatenate([a, a * 2.0], axis=0)

    out = _run(kernel, x, jax.ShapeDtypeStruct((8, 32, 64), jnp.float32))
    ref = jnp.concatenate([x, x * 2.0], axis=0)
    err = float(jnp.max(jnp.abs(out - ref)))
    return err < 1e-6, f"max_err={err:.2e}"


def probe_concat1():
    x = jnp.asarray(np.random.default_rng(7).standard_normal((32, 8, 64)), jnp.float32)

    def kernel(x_ref, o_ref):
        a = x_ref[...]
        o_ref[...] = jnp.concatenate([a, a * 2.0, a * 3.0, a * 4.0], axis=1)

    out = _run(kernel, x, jax.ShapeDtypeStruct((32, 32, 64), jnp.float32))
    ref = jnp.concatenate([x, x * 2.0, x * 3.0, x * 4.0], axis=1)
    err = float(jnp.max(jnp.abs(out - ref)))
    return err < 1e-6, f"max_err={err:.2e}"


def probe_write_strided_slice():
    """Write a (h, wc, d) chunk into o_ref[:, sl, :] with read-modify-write."""
    x = jnp.asarray(np.random.default_rng(8).standard_normal((32, 8, 64)), jnp.float32)

    def kernel(x_ref, o_ref):
        for ci in range(4):
            o_ref[:, ci * 8:(ci + 1) * 8, :] = x_ref[...] * (ci + 1.0)
        o_ref[:, 0:8, :] += x_ref[...]

    out = _run(kernel, x, jax.ShapeDtypeStruct((32, 32, 64), jnp.float32))
    ref = jnp.concatenate([x * 2.0, x * 2.0, x * 3.0, x * 4.0], axis=1)
    err = float(jnp.max(jnp.abs(out - ref)))
    return err < 1e-6, f"max_err={err:.2e}"


def probe_transpose_full():
    x = jnp.asarray(np.random.default_rng(9).standard_normal((32, 32, 64)), jnp.float32)

    def kernel(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...], (1, 0, 2))

    out = _run(kernel, x, jax.ShapeDtypeStruct((32, 32, 64), jnp.float32))
    ref = jnp.transpose(x, (1, 0, 2))
    err = float(jnp.max(jnp.abs(out - ref)))
    return err < 1e-6, f"max_err={err:.2e}"


def probe_merge_full():
    x = jnp.asarray(np.random.default_rng(10).standard_normal((32, 32, 64)), jnp.float32)

    def kernel(x_ref, o_ref):
        a = x_ref[...].reshape(1024, 64)
        o_ref[...] = a * 2.0

    out = _run(kernel, x, jax.ShapeDtypeStruct((1024, 64), jnp.float32))
    err = float(jnp.max(jnp.abs(out - x.reshape(1024, 64) * 2.0)))
    return err < 1e-6, f"max_err={err:.2e}"


probe("split (128,64)->(4,32,64)", probe_split_reshape)
probe("concat axis0 3D", probe_concat0)
probe("concat axis1 3D", probe_concat1)
probe("write strided slices + rmw", probe_write_strided_slice)
probe("transpose (32,32,64) maj", probe_transpose_full)
probe("merge (32,32,64)->(1024,64)", probe_merge_full)


def probe_head_slice_bf16():
    """Read/write per-head slices of a (1, H, W, heads, d) bf16 block."""
    heads = 6
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((1, H, W, heads, D)), jnp.bfloat16
    )

    def kernel(x_ref, o_ref):
        for hd in range(heads):
            a = x_ref[0, :, :, hd, :].astype(jnp.float32)
            o_ref[0, :, :, hd, :] = (a * (hd + 1.0)).astype(o_ref.dtype)

    out = _run(kernel, x, jax.ShapeDtypeStruct((1, H, W, heads, D), jnp.bfloat16))
    scale = jnp.arange(1, heads + 1, dtype=jnp.float32)[None, None, None, :, None]
    ref = (x.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    return err < 1e-2, f"max_err={err:.2e}"


def probe_head_slice_dot_bf16():
    """Per-head slice -> merged 2D dot -> concat -> per-head write, bf16."""
    heads = 6
    x = jnp.asarray(
        np.random.default_rng(12).standard_normal((1, H, W, heads, D)), jnp.bfloat16
    )

    def kernel(x_ref, o_ref):
        for hd in range(heads):
            a = x_ref[0, :, :, hd, :].astype(jnp.float32)
            parts = []
            for ci in range(4):
                chunk = a[ci * 8:(ci + 1) * 8].reshape(8 * W, D)
                s = jnp.dot(chunk, chunk.T, preferred_element_type=jnp.float32)
                parts.append(jnp.dot(s, chunk, preferred_element_type=jnp.float32).reshape(8, W, D))
            acc = jnp.concatenate(parts, axis=0)
            o_ref[0, :, :, hd, :] = acc.astype(o_ref.dtype)

    out = _run(kernel, x, jax.ShapeDtypeStruct((1, H, W, heads, D), jnp.bfloat16))
    outs = []
    for hd in range(heads):
        a = x[0, :, :, hd, :].astype(jnp.float32)
        parts = []
        for ci in range(4):
            chunk = a[ci * 8:(ci + 1) * 8].reshape(8 * W, D)
            s = chunk @ chunk.T
            parts.append((s @ chunk).reshape(8, W, D))
        outs.append(jnp.concatenate(parts, axis=0))
    ref = jnp.stack(outs, axis=2)[None].transpose(0, 2, 3, 1, 4)
    wait = None
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    rel = err / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9)
    return rel < 2e-2, f"rel={rel:.2e}"


probe("per-head slice r/w bf16 5D", probe_head_slice_bf16)
probe("per-head slice+dot+concat bf16", probe_head_slice_dot_bf16)


def probe_chunked_ref_reads_bf16():
    """Per-chunk ref reads + dot + per-chunk ref writes (kernel v3 pattern)."""
    heads = 6
    x = jnp.asarray(
        np.random.default_rng(13).standard_normal((1, H, W, heads, D)), jnp.bfloat16
    )

    def kernel(x_ref, o_ref):
        for hd in range(heads):
            # row chunks: read (8, W, d) from ref, merge, dot, write back
            for ci in range(4):
                sl = slice(ci * 8, (ci + 1) * 8)
                chunk = x_ref[0, sl, :, hd, :].astype(jnp.float32).reshape(8 * W, D)
                s = jnp.dot(chunk, chunk.T, preferred_element_type=jnp.float32)
                o = jnp.dot(s, chunk, preferred_element_type=jnp.float32)
                o_ref[0, sl, :, hd, :] = o.reshape(8, W, D).astype(o_ref.dtype)
            # col chunks: read (H, 8, d), merge, dot, add into output
            for ci in range(4):
                sl = slice(ci * 8, (ci + 1) * 8)
                chunk = x_ref[0, :, sl, hd, :].astype(jnp.float32).reshape(H * 8, D)
                s = jnp.dot(chunk, chunk.T, preferred_element_type=jnp.float32)
                o = jnp.dot(s, chunk, preferred_element_type=jnp.float32)
                o_ref[0, :, sl, hd, :] += o.reshape(H, 8, D).astype(o_ref.dtype)

    out = _run(kernel, x, jax.ShapeDtypeStruct((1, H, W, heads, D), jnp.bfloat16))
    outs = []
    for hd in range(heads):
        a = x[0, :, :, hd, :].astype(jnp.float32)
        rowp = []
        for ci in range(4):
            c = a[ci * 8:(ci + 1) * 8].reshape(8 * W, D)
            rowp.append(((c @ c.T) @ c).reshape(8, W, D))
        rows = jnp.concatenate(rowp, axis=0).astype(jnp.bfloat16).astype(jnp.float32)
        colp = []
        for ci in range(4):
            c = a[:, ci * 8:(ci + 1) * 8].reshape(H * 8, D)
            colp.append(((c @ c.T) @ c).reshape(H, 8, D))
        cols = jnp.concatenate(colp, axis=1)
        outs.append((rows + cols))
    ref = jnp.stack(outs, axis=2)[None].transpose(0, 2, 3, 1, 4).astype(jnp.bfloat16)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    rel = err / (float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9)
    return rel < 5e-2, f"rel={rel:.2e}"


probe("chunked ref reads/writes bf16 (v3)", probe_chunked_ref_reads_bf16)
