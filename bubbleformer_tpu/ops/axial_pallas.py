"""Pallas TPU kernel: fused packed axial attention with custom VJP.

The axial factorization (reference ``bubbleformer/layers/attention.py``)
leaves attention with tiny sequences (T ~ 5, H/p = W/p ~ 32) over tens of
thousands of independent batch elements.  Two naive strategies both lose:

* tiny batched matmuls — each (n x d)@(d x n) occupies a sliver of the
  128x128 MXU (measured ~7x worse than roofline);
* XLA-level packing (``ops.attention.packed_attention``) fixes MXU occupancy
  but materializes the packed (G*n x G*n) float32 logits in HBM every block.

This kernel does the packing *inside* VMEM: G sequences are packed into one
super-sequence per MXU matmul with a block-diagonal additive bias (the
per-head relative-position bias on the diagonal, -1e9 off it), the softmax
and both matmuls run without the logits ever touching HBM, and the
reference's attn_scale low/high-frequency rescale
(``attention.py:85-101``) is fused algebraically:

    P_eff = s * softmax(S) + (1 - s) * seg        (seg = block-diag 1/n)
    O     = P_eff @ V

The custom VJP recomputes S/P from q,k (flash-style) and produces gradients
for q, k, v, the packed bias (reduced to the (n, n) table by autodiff of the
packing outside the kernel) and the per-head scale factor.

Layout: ``q, k, v: (heads, M, n, d)`` — M independent sequences per head.
"""
from __future__ import annotations

import functools

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_flash_group(m: int, n: int, cap: int = 512) -> int:
    """Largest power-of-two G dividing M with G*n <= cap."""
    g = 1
    while g * 2 * n <= cap and m % (g * 2) == 0:
        g *= 2
    return g


def _segment_mean_matrix(g: int, n: int) -> np.ndarray:
    """Block-diagonal (G*n, G*n) matrix averaging V rows within each window."""
    return np.kron(np.eye(g, dtype=np.float32), np.full((n, n), 1.0 / n, np.float32))


def _packed_bias(bias: jax.Array | None, heads: int, g: int, n: int) -> jax.Array:
    """(heads, G*n, G*n) block-diagonal bias with -1e9 off the diagonal."""
    gn = g * n
    off = jnp.asarray(
        (1.0 - np.kron(np.eye(g, dtype=np.float32), np.ones((n, n), np.float32)))
        * (-1e9)
    )
    if bias is None:
        return jnp.broadcast_to(off, (heads, gn, gn))
    packed = jnp.kron(jnp.eye(g, dtype=jnp.float32), bias.astype(jnp.float32))
    return packed + off


def _fwd_kernel(scale_ref, q_ref, k_ref, v_ref, bias_ref, seg_ref, o_ref, *, d):
    h = pl.program_id(0)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s_mat = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s_mat = s_mat * (d**-0.5) + bias_ref[0]
    p = jax.nn.softmax(s_mat, axis=-1)
    sval = scale_ref[h, 0]
    p_eff = sval * p + (1.0 - sval) * seg_ref[:]
    o = jnp.dot(p_eff, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(
    scale_ref,
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    seg_ref,
    do_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    dbias_ref,
    dscale_ref,
    *,
    d,
):
    h = pl.program_id(0)
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    seg = seg_ref[:]
    scaling = d**-0.5

    s_mat = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s_mat = s_mat * scaling + bias_ref[0]
    p = jax.nn.softmax(s_mat, axis=-1)
    sval = scale_ref[h, 0]
    p_eff = sval * p + (1.0 - sval) * seg

    # dV = P_eff^T @ dO
    dv = jax.lax.dot_general(
        p_eff, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dP_eff = dO @ V^T
    dp_eff = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # d(scale) = sum dP_eff * (P - seg); softmax path gets s * dP_eff.
    ds_contrib = jnp.sum(dp_eff * (p - seg))
    dp = sval * dp_eff
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds_mat = p * (dp - delta)  # dS (softmax backward)

    dq = (
        jnp.dot(ds_mat, k, preferred_element_type=jnp.float32) * scaling
    )
    dk = (
        jax.lax.dot_general(
            ds_mat, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scaling
    )

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)

    # Accumulate per-head reductions across the M/G grid steps (the m axis is
    # innermost, so for a fixed head the same output block stays resident).
    @pl.when(i == 0)
    def _():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])
        dscale_ref[h, 0] = 0.0

    dbias_ref[0] += ds_mat
    dscale_ref[h, 0] += ds_contrib


@functools.lru_cache(maxsize=None)
def _make_flash(heads: int, m: int, n: int, d: int, g: int, dtype_name: str, interpret: bool):
    gn = g * n
    dtype = jnp.dtype(dtype_name)
    grid = (heads, m // g)

    qkv_spec = pl.BlockSpec((1, gn, d), lambda h, i: (h, i, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, gn, gn), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((gn, gn), lambda h, i: (0, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((heads, 1), lambda h, i: (0, 0), memory_space=pltpu.SMEM)

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, d=d),
        grid=grid,
        in_specs=[scale_spec, qkv_spec, qkv_spec, qkv_spec, bias_spec, seg_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((heads, m * n, d), dtype),
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, d=d),
        grid=grid,
        in_specs=[scale_spec, qkv_spec, qkv_spec, qkv_spec, bias_spec, seg_spec, qkv_spec],
        out_specs=[
            qkv_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((1, gn, gn), lambda h, i: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, 1), lambda h, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((heads, m * n, d), dtype),
            jax.ShapeDtypeStruct((heads, m * n, d), dtype),
            jax.ShapeDtypeStruct((heads, m * n, d), dtype),
            jax.ShapeDtypeStruct((heads, gn, gn), jnp.float32),
            jax.ShapeDtypeStruct((heads, 1), jnp.float32),
        ],
        interpret=interpret,
    )

    @jax.custom_vjp
    def flash(q2, k2, v2, biasp, seg, scale):
        return fwd_call(scale, q2, k2, v2, biasp, seg)

    def flash_fwd(q2, k2, v2, biasp, seg, scale):
        out = fwd_call(scale, q2, k2, v2, biasp, seg)
        return out, (q2, k2, v2, biasp, seg, scale)

    def flash_bwd(res, do):
        q2, k2, v2, biasp, seg, scale = res
        dq, dk, dv, dbiasp, dscale = bwd_call(scale, q2, k2, v2, biasp, seg, do)
        return dq, dk, dv, dbiasp, jnp.zeros_like(seg), dscale

    flash.defvjp(flash_fwd, flash_bwd)
    return flash


def flash_packed_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    scale_factor: jax.Array | None = None,
    group_cap: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused packed attention: ``q/k/v (heads, M, n, d) -> (heads, M, n, d)``.

    Numerically equal to ``ops.attention.packed_attention`` /
    ``scaled_axial_attention`` (with ``scale_factor=None`` meaning s = 1).
    """
    heads, m, n, d = q.shape
    g = pick_flash_group(m, n, cap=group_cap)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    biasp = _packed_bias(bias, heads, g, n)
    seg = jnp.asarray(_segment_mean_matrix(g, n))
    if scale_factor is None:
        scale = jnp.ones((heads, 1), jnp.float32)
    else:
        scale = scale_factor.reshape(heads, 1).astype(jnp.float32)

    # Uniform q/k/v dtype (cotangents must match primal dtypes per input).
    common = jnp.promote_types(jnp.promote_types(q.dtype, k.dtype), v.dtype)
    flash = _make_flash(heads, m, n, d, g, str(common), bool(interpret))
    q2 = q.astype(common).reshape(heads, m * n, d)
    k2 = k.astype(common).reshape(heads, m * n, d)
    v2 = v.astype(common).reshape(heads, m * n, d)
    out = flash(q2, k2, v2, biasp, seg, scale)
    # Name the output so remat policies can save it instead of re-running the
    # (opaque-to-XLA) kernel during the backward pass.
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_attn")
    return out.reshape(heads, m, n, d)
