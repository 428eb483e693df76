"""Axial attention compute core.

The reference runs attention three ways per block — over T (temporal), over W
(rows) and over H (columns) — with an additive T5 bias and an optional
"attn_scale" high-frequency rescaling that it computes *eagerly*,
materializing the full (n, n) attention matrix
(``bubbleformer/layers/attention.py:85-101,223-238,262-277``):

    attn      = softmax(q k^T / sqrt(d) + bias)
    attn_low  = 1/n                      (uniform low-frequency component)
    attn_high = (attn - attn_low) * s    (learned per-head scale)
    out       = (attn_low + attn_high) @ v

TPU-first reformulation: since ``attn_low @ v`` is just the mean of ``v`` over
the key axis, the whole decomposition collapses algebraically to

    out = s * (softmax(...) @ v) + (1 - s) * mean_k(v)

so we never materialize the decomposition — one softmax-attention plus a
cheap rank-1 correction, which XLA fuses.  A Pallas fused kernel for the
(batched tiny-sequence) axial case lives in ``ops/axial_pallas.py`` and is
used through the same entry point when profitable.

Shapes follow a single convention: ``q, k, v`` are ``(..., heads, n, d)`` with
arbitrary leading batch axes, ``bias`` is ``(heads, n, n)`` or None and
``scale_factor`` is ``(heads,)`` or None.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def scaled_axial_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    scale_factor: jax.Array | None = None,
) -> jax.Array:
    """Softmax attention with optional additive bias and high-freq rescale.

    Equivalent to the reference's eager attn_scale path when
    ``scale_factor`` is given, and to ``F.scaled_dot_product_attention``
    (with ``attn_mask=bias``) when it is None.
    """
    d = q.shape[-1]
    scaling = d**-0.5
    # Logits in float32 for a stable softmax regardless of activation dtype.
    logits = jnp.einsum(
        "...nd,...md->...nm", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scaling
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("...nm,...md->...nd", attn, v)
    if scale_factor is not None:
        s = scale_factor.reshape(
            (1,) * (out.ndim - 3) + (scale_factor.shape[0], 1, 1)
        ).astype(out.dtype)
        v_mean = jnp.mean(v, axis=-2, keepdims=True)
        out = s * out + (1.0 - s) * v_mean
    return out


def pick_group_size(num_elements: int, seq_len: int, target: int = 256) -> int:
    """Largest group G with G*seq_len <= target that divides num_elements."""
    g = max(1, target // seq_len)
    while g > 1 and num_elements % g:
        g -= 1
    return g


def packed_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    scale_factor: jax.Array | None = None,
    group_target: int = 256,
) -> jax.Array:
    """Batched tiny-sequence attention packed into MXU-sized matmuls.

    The axial factorization leaves attention with sequences of n ~ 5..64 and
    tens of thousands of independent batch elements — as naive batched
    matmuls each (n x d)@(d x n) product occupies a tiny corner of the
    128x128 MXU tile (measured: the attention cores cost ~7x their roofline).
    Here G = target//n sequences are **packed along the sequence axis** into
    one super-sequence of length G*n per matmul, with a block-diagonal
    additive bias (the per-head relative-position bias on the diagonal
    blocks, -1e9 off-diagonal) so rows still attend only within their own
    window.  The matmuls become (G*n x d)@(d x G*n) — full MXU tiles — at a
    G-fold FLOP overhead that is cheap because the true FLOP count is tiny.

    Shapes: ``q/k/v`` are ``(heads, M, n, d)`` with M the number of
    independent sequences per head; ``bias`` is ``(heads, n, n)`` or None;
    ``scale_factor`` is ``(heads,)`` or None.  Returns ``(heads, M, n, d)``.
    """
    heads, m, n, d = q.shape
    g = pick_group_size(m, n, group_target)
    if g <= 1:
        out = scaled_axial_attention(q, k, v, bias=bias, scale_factor=None)
        if scale_factor is not None:
            s = scale_factor.reshape(heads, 1, 1, 1).astype(out.dtype)
            v_mean = jnp.mean(v, axis=-2, keepdims=True)
            out = s * out + (1.0 - s) * v_mean
        return out

    gn = g * n
    qp = q.reshape(heads, m // g, gn, d)
    kp = k.reshape(heads, m // g, gn, d)
    vp = v.reshape(heads, m // g, gn, d)

    # Block-diagonal packed bias (trace-time constant structure).
    eye = jnp.asarray(np.kron(np.eye(g, dtype=np.float32), np.ones((n, n), np.float32)))
    neg = (1.0 - eye) * (-1e9)
    if bias is not None:
        packed = jnp.kron(jnp.eye(g, dtype=bias.dtype), bias.astype(jnp.float32)) + neg
    else:
        packed = jnp.broadcast_to(neg, (heads, gn, gn))
    if packed.ndim == 2:
        packed = jnp.broadcast_to(packed, (heads, gn, gn))

    scaling = d**-0.5
    logits = jnp.einsum("hmsd,hmtd->hmst", qp, kp, preferred_element_type=jnp.float32)
    logits = logits * scaling + packed[:, None]
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("hmst,hmtd->hmsd", attn, vp)
    out = out.reshape(heads, m, n, d)

    if scale_factor is not None:
        s = scale_factor.reshape(heads, 1, 1, 1).astype(out.dtype)
        v_mean = jnp.mean(v, axis=-2, keepdims=True)
        out = s * out + (1.0 - s) * v_mean
    return out


def unrolled_axis_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis: int,
    bias: jax.Array | None = None,
    scale_factor: jax.Array | None = None,
) -> jax.Array:
    """Attention along one axis with the sequence fully unrolled at trace time.

    For the tiny temporal sequences the axial factorization produces (n = T
    ~ 5), batched (n x d)@(d x n) matmuls occupy a sliver of the 128x128 MXU
    and dominate the step (measured ~7x roofline).  With n**2 trace-time
    pairs, every logit becomes one fused multiply-reduce over the head dim —
    pure VPU work over the huge batch, no relayouts, no MXU involvement, and
    the output is produced directly in the input layout (sequence axis in
    place) so the caller needs no transpose either.

    Same contract as :func:`axis_attention`; intended for n <= ~8.
    """
    n = q.shape[axis]
    d = q.shape[-1]
    heads = q.shape[-2]
    scaling = d**-0.5
    f32 = jnp.float32

    # logits[..., i, j, ...]: broadcast multiply + reduce over d — XLA fuses
    # this into one loop over the huge batch; the (n, n) pair axes stay tiny
    # trace-time-static dims (no batched matmul, no relayout).
    qe = jnp.expand_dims(q, axis + 1).astype(f32)  # (..., n, 1, ..., heads, d)
    ke = jnp.expand_dims(k, axis).astype(f32)      # (..., 1, n, ..., heads, d)
    logits = jnp.sum(qe * ke, axis=-1) * scaling   # (..., n, n, ..., heads)
    if bias is not None:
        # (heads, n, n) -> broadcast to logits layout: pair axes at
        # (axis, axis+1), heads last.
        b = jnp.moveaxis(bias.astype(f32), 0, -1)  # (n, n, heads)
        shape = [1] * logits.ndim
        shape[axis], shape[axis + 1], shape[-1] = n, n, heads
        logits = logits + b.reshape(shape)

    p = jax.nn.softmax(logits, axis=axis + 1)
    ve = jnp.expand_dims(v, axis)  # (..., 1, n, ..., heads, d)
    out = jnp.sum(p[..., None].astype(v.dtype) * ve, axis=axis + 1)

    if scale_factor is not None:
        s = scale_factor.reshape((1,) * (q.ndim - 3) + (heads, 1)).astype(out.dtype)
        v_mean = jnp.mean(v, axis=axis, keepdims=True)
        out = s * out + (1.0 - s) * v_mean
    return out


def axis_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis: int,
    bias: jax.Array | None = None,
    scale_factor: jax.Array | None = None,
) -> jax.Array:
    """Attention along one tensor axis of ``(..., heads, d)``-trailing arrays,
    with no materialized transposes.

    ``q/k/v`` have layout ``(batch..., heads, d)`` where one of the leading
    axes (``axis``) is the sequence; the contraction is expressed directly as
    a ``dot_general`` over that axis so XLA picks the layouts instead of us
    relayouting 5-6D tensors before/after every attention
    (cf. the reference's rearrange-heavy formulation,
    ``bubbleformer/layers/attention.py:80,119,219,255``).

    ``bias``: ``(heads, n, n)`` or None; ``scale_factor``: ``(heads,)`` or None.
    """
    ndim = q.ndim
    heads_ax, d_ax = ndim - 2, ndim - 1
    batch_axes = [a for a in range(ndim - 1) if a not in (axis, d_ax)]

    # logits[batch..., heads, n, m] via one dot_general: contract d, batch
    # over everything except the sequence axis.
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((d_ax,), (d_ax,)), (tuple(batch_axes), tuple(batch_axes))),
        preferred_element_type=jnp.float32,
    )
    # logits layout: (batch..., heads, n, m) — batch dims in order, then the
    # two un-batched dims (q's axis, k's axis).
    d = q.shape[d_ax]
    logits = logits * (d**-0.5)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)

    # out[batch..., heads, n, d] = attn @ v along the sequence axis.
    n_batch = len(batch_axes)
    out = jax.lax.dot_general(
        attn,
        v,
        dimension_numbers=(
            ((n_batch + 1,), (axis,)),
            (tuple(range(n_batch)), tuple(batch_axes)),
        ),
        preferred_element_type=None,
    )
    # out layout: (batch..., n, d); sequence axis now where heads batch put it.
    if scale_factor is not None:
        # v_mean over the sequence axis, broadcast to out's layout
        # (batch..., n, d) where batch... = batch_axes order (heads last).
        s = scale_factor.reshape((1,) * (n_batch - 1) + (scale_factor.shape[0], 1, 1))
        v_mean = jnp.mean(v, axis=axis, keepdims=False)  # (batch..., d)
        v_mean = jnp.expand_dims(v_mean, axis=n_batch)  # (batch..., 1, d)
        out = s.astype(out.dtype) * out + (1.0 - s).astype(out.dtype) * v_mean
    return out
