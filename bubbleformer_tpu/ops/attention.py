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
