"""Relative position biases for the axial attention blocks.

Two variants, selected by ``bias_type`` exactly as in the reference
(``bubbleformer/layers/attention.py:58-63``):

* ``"rel"`` — T5 bucketed relative position bias
  (reference ``bubbleformer/layers/positional_encoding.py:50-172``).
* ``"continuous"`` — a small MLP over normalized relative coordinates
  (reference ``bubbleformer/layers/positional_encoding.py:8-47``).

TPU-first design note: sequence lengths here are *static* under jit (the
temporal window T and the patch-grid extents H/p, W/p), so the T5 bucket
table is computed once in numpy at trace time and becomes a compile-time
constant gather into the learned ``(num_buckets, heads)`` embedding — there
is no data-dependent control flow on device.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def t5_relative_position_bucket(
    relative_position: np.ndarray,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> np.ndarray:
    """Map integer relative positions to T5 bucket indices (numpy, trace-time).

    Mirrors the Mesh-TensorFlow bucketing scheme the reference uses
    (``positional_encoding.py:77-132``): half the buckets cover exact small
    offsets, the other half cover log-spaced larger offsets up to
    ``max_distance``.
    """
    relative_position = np.asarray(relative_position, dtype=np.int64)
    ret = np.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(np.int64) * num_buckets
        n = np.abs(n)
    else:
        n = np.maximum(n, 0)

    max_exact = num_buckets // 2
    is_small = n < max_exact

    with np.errstate(divide="ignore"):
        val_if_large = max_exact + (
            np.log(np.maximum(n, 1).astype(np.float64) / max_exact)
            / math.log(max_distance / max_exact)
            * (num_buckets - max_exact)
        ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)

    ret += np.where(is_small, n, val_if_large)
    return ret


def t5_bucket_table(
    qlen: int,
    klen: int,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> np.ndarray:
    """(qlen, klen) int32 table of bucket ids; compile-time constant."""
    context = np.arange(qlen, dtype=np.int64)[:, None]
    memory = np.arange(klen, dtype=np.int64)[None, :]
    relative_position = memory - context
    return t5_relative_position_bucket(
        relative_position,
        bidirectional=bidirectional,
        num_buckets=num_buckets,
        max_distance=max_distance,
    ).astype(np.int32)


class RelativePositionBias(nn.Module):
    """T5 bucketed relative position bias.

    Returns a ``(num_heads, qlen, klen)`` additive bias.  The learned table is
    ``(num_buckets, num_heads)`` (initialized like ``torch.nn.Embedding``:
    standard normal), gathered through the static bucket table.

    ``max_distance`` defaults to 32 — NOT the reference constructor's 128 —
    because the reference's ``compute_bias`` forgets to forward its
    ``max_distance`` attribute into the bucket function
    (``positional_encoding.py:150-154``), so the staticmethod default of 32
    is what actually runs; this default reproduces that effective behavior
    (verified by golden test against the reference).
    """

    num_heads: int
    bidirectional: bool = True
    num_buckets: int = 32
    max_distance: int = 32

    @nn.compact
    def __call__(self, qlen: int, klen: int) -> jax.Array:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=1.0),
            (self.num_buckets, self.num_heads),
        )
        buckets = t5_bucket_table(
            qlen,
            klen,
            bidirectional=self.bidirectional,
            num_buckets=self.num_buckets,
            max_distance=self.max_distance,
        )
        values = table[jnp.asarray(buckets)]  # (qlen, klen, heads)
        return jnp.transpose(values, (2, 0, 1))  # (heads, qlen, klen)


class ContinuousPositionBias1D(nn.Module):
    """Continuous MLP relative position bias: 1 -> 512 -> heads, 16*sigmoid.

    Relative coordinates are normalized to [-1, 1]; the MLP is evaluated on
    the 2n-1 unique offsets and gathered into the (heads, n, n) bias, as in
    the reference (``positional_encoding.py:25-47``).
    """

    num_heads: int
    hidden: int = 512

    @nn.compact
    def __call__(self, qlen: int, klen: int) -> jax.Array:
        assert qlen == klen, "continuous bias is defined for square attention"
        n = qlen
        rel = jnp.arange(-(n - 1), n, dtype=jnp.float32) / max(n - 1, 1)
        h = nn.Dense(self.hidden, use_bias=True, name="fc1")(rel[:, None])
        h = nn.relu(h)
        h = nn.Dense(self.num_heads, use_bias=False, name="fc2")(h)
        rel_pos_model = 16.0 * jax.nn.sigmoid(h)  # (2n-1, heads)

        coords = np.arange(n)
        idx = coords[None, :] - coords[:, None] + (n - 1)  # (n, n) in [0, 2n-2]
        biases = rel_pos_model[jnp.asarray(idx, dtype=jnp.int32)]  # (n, n, heads)
        return jnp.transpose(biases, (2, 0, 1))  # (heads, n, n)


def make_bias_module(bias_type: str, num_heads: int):
    """Bias factory matching the reference's ``bias_type`` switch."""
    if bias_type == "none":
        return None
    if bias_type == "continuous":
        return ContinuousPositionBias1D(num_heads=num_heads)
    if bias_type == "rel":
        return RelativePositionBias(num_heads=num_heads)
    raise ValueError(f"Unknown bias_type: {bias_type}")
