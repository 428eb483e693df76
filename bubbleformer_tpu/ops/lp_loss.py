"""Pallas TPU kernel: relative-L2 (LpLoss d=2, p=2) field norms, NCHW.

The training criterion reduces ``||pred - tgt||_2 / ||tgt||_2`` over (H, W)
per (B, T, C) (reference ``bubbleformer/utils/losses.py:17-94`` with the
``modules.py:50`` reduce config).  Left to XLA, the profiled flagship step
spent ~18 ms/step here: layout assignment propagated a batch-minor layout
from the decoder's output transpose into the loss operands, so the (H, W)
reductions ran strided AND the f32 target was layout-copied to match
(profile 2026-08-19: 5.7 ms loss fusion + ~12 ms of f32 relayouts).

A pallas_call is the layout pin XLA lacks: custom-call operands must be in
canonical (descending major-to-minor) layout, so feeding ``pred`` here
forces the decoder transpose to materialize plain NCHW — the layout the
target already has — and the kernel then reduces minor-dim (H, W) tiles at
HBM bandwidth.  One grid step per (B*T*C) field plane; outputs the per-plane
``sum((p-t)^2)`` and ``sum(t^2)`` rows; the tiny rel/mean/mean/sum epilogue
stays in XLA.  The backward is one analytic kernel
(``dpred = coef * (p - t)``, ``coef = g_rel / (||p-t|| ||t||)``); the target
cotangent is never consumed by training and is returned as a DCE-able zeros.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norms_kernel(p_ref, t_ref, out_ref, *, k):
    # K planes per grid step: one big DMA, K per-plane (H, W) full
    # reductions to SMEM scalars.  Short grids win on this device (per-step
    # fixed cost dominates); per-plane ref slices avoid vector->scalar
    # extracts, which Mosaic does not lower.
    i = pl.program_id(0)
    for j in range(k):
        d = p_ref[j].astype(jnp.float32) - t_ref[j].astype(jnp.float32)
        t32 = t_ref[j].astype(jnp.float32)
        out_ref[i * k + j, 0] = jnp.sum(d * d)
        out_ref[i * k + j, 1] = jnp.sum(t32 * t32)


def _dpred_kernel(p_ref, t_ref, coef_ref, dp_ref, *, k):
    i = pl.program_id(0)
    for j in range(k):
        d = p_ref[j].astype(jnp.float32) - t_ref[j].astype(jnp.float32)
        dp_ref[j] = (coef_ref[i * k + j, 0] * d).astype(dp_ref.dtype)


def _pick_planes(m: int, h: int, w: int) -> int:
    """Planes per grid step: largest divisor of ``m`` whose f32 block stays
    ~<= 16 MB (VMEM headroom for pred + tgt blocks double-buffered)."""
    cap = max(1, int(16e6) // (4 * h * w))
    k = min(m, cap)
    while m % k:
        k -= 1
    return k


@functools.lru_cache(maxsize=None)
def _make_norms(m: int, h: int, w: int, p_dtype: str, t_dtype: str,
                interpret: bool):
    k = _pick_planes(m, h, w)
    plane = lambda dt: pl.BlockSpec(
        (k, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)
    fwd = pl.pallas_call(
        functools.partial(_norms_kernel, k=k),
        grid=(m // k,),
        in_specs=[plane(p_dtype), plane(t_dtype)],
        # The whole (m, 2) row table stays SMEM-resident across the grid
        # (block == array satisfies the tiling rule); step i writes its rows.
        out_specs=pl.BlockSpec((m, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((m, 2), jnp.float32),
        interpret=interpret,
        compiler_params=cparams,
    )
    bwd = pl.pallas_call(
        functools.partial(_dpred_kernel, k=k),
        grid=(m // k,),
        in_specs=[
            plane(p_dtype),
            plane(t_dtype),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (k, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, h, w), jnp.dtype(p_dtype)),
        interpret=interpret,
        compiler_params=cparams,
    )
    return fwd, bwd


def relative_l2_planes(
    pred: jax.Array, tgt: jax.Array, interpret: bool | None = None
) -> jax.Array:
    """Per-(B, T, C) relative-L2 over (H, W): ``(B, T, C)`` f32.

    ``pred``/``tgt``: ``(B, T, C, H, W)`` (any float dtypes).  Numerically
    ``sqrt(sum((p-t)^2)) / sqrt(sum(t^2))`` per plane — the inner quantity
    of the reference LpLoss before its reduce chain.
    """
    b, t_len, c, h, w = pred.shape
    m = b * t_len * c
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fwd_call, bwd_call = _make_norms(
        m, h, w, str(pred.dtype), str(tgt.dtype), bool(interpret)
    )

    @jax.custom_vjp
    def norms(p3, t3):
        return fwd_call(p3, t3)

    def norms_fwd(p3, t3):
        out = fwd_call(p3, t3)
        return out, (p3, t3, out)

    def norms_bwd(res, g):
        p3, t3, out = res
        # rel = sqrt(d2)/sqrt(t2); callers differentiate through the XLA
        # epilogue, so g arrives w.r.t. (d2, t2) rows: dp = g_d2 * 2 (p - t).
        coef = (2.0 * g[:, 0]).reshape(m, 1)
        dp = bwd_call(p3, t3, coef)
        # The target cotangent is never consumed in training; a broadcast
        # zeros is free for XLA to eliminate.
        return dp, jnp.zeros_like(t3)

    norms.defvjp(norms_fwd, norms_bwd)

    out = norms(pred.reshape(m, h, w), tgt.reshape(m, h, w))
    d2 = out[:, 0].reshape(b, t_len, c)
    t2 = out[:, 1].reshape(b, t_len, c)
    eps = 0.0
    return jnp.sqrt(d2) / jnp.maximum(jnp.sqrt(t2), 1e-30 + eps)


def training_lp_loss(pred: jax.Array, tgt: jax.Array) -> jax.Array:
    """The reference training criterion on NCHW 5-D tensors via the kernel:
    ``LpLoss(d=2, p=2, reduce_dims=[0, 1, 2], reductions=[mean, mean, sum])``
    (reference ``modules.py:50``)."""
    rel = relative_l2_planes(pred, tgt)  # (B, T, C)
    return jnp.sum(jnp.mean(rel, axis=(0, 1)))
