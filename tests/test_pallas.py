"""Pallas flash packed-attention kernel: numerics vs the XLA reference
(interpret mode on CPU; the compiled path is exercised by bench.py on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.superseded  # 'flash' lost to lane/fused_block; goldens kept runnable via -m superseded

from bubbleformer_tpu.ops.attention import packed_attention, scaled_axial_attention
from bubbleformer_tpu.ops.axial_pallas import flash_packed_attention, pick_flash_group


def _rand(heads, m, n, d, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (
        jnp.asarray(rng.standard_normal((heads, m, n, d)).astype(np.float32))
        for _ in range(3)
    )
    bias = jnp.asarray(rng.standard_normal((heads, n, n)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.5, 1.5, heads).astype(np.float32))
    return q, k, v, bias, s


def test_pick_flash_group():
    assert pick_flash_group(4096, 5, cap=128) * 5 <= 128
    assert 4096 % pick_flash_group(4096, 5) == 0
    assert pick_flash_group(640, 32, cap=128) == 4
    assert pick_flash_group(7, 5) == 1  # odd M degrades to unpacked


@pytest.mark.parametrize("m,n,d", [(16, 5, 8), (8, 32, 16), (7, 5, 8)])
def test_flash_forward_golden(m, n, d):
    q, k, v, bias, s = _rand(3, m, n, d)
    ref = packed_attention(q, k, v, bias, s)
    out = flash_packed_attention(q, k, v, bias, s, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


def test_flash_no_bias_no_scale():
    q, k, v, _, _ = _rand(2, 8, 4, 8)
    ref = packed_attention(q, k, v, None, None)
    out = flash_packed_attention(q, k, v, None, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


def test_flash_gradients_golden():
    q, k, v, bias, s = _rand(3, 16, 5, 8, seed=1)

    def loss_flash(*a):
        return jnp.sum(flash_packed_attention(*a, interpret=True) ** 2)

    def loss_ref(*a):
        return jnp.sum(packed_attention(*a) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, bias, s)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, bias, s)
    for name, a, b in zip(["dq", "dk", "dv", "dbias", "dscale"], g1, g2):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-6, err_msg=name
        )


def test_flash_matches_unpacked_reference():
    """End-to-end against the plain (unpacked) attention formulation."""
    heads, m, n, d = 2, 12, 6, 8
    q, k, v, bias, s = _rand(heads, m, n, d, seed=2)
    # scaled_axial_attention expects (..., heads, n, d); move heads.
    qt, kt, vt = (jnp.transpose(a, (1, 0, 2, 3)) for a in (q, k, v))
    ref = scaled_axial_attention(qt, kt, vt, bias=bias, scale_factor=s)
    ref = jnp.transpose(ref, (1, 0, 2, 3))
    out = flash_packed_attention(q, k, v, bias, s, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


def test_model_flash_equals_plain():
    from bubbleformer_tpu.models import get_model

    kw = dict(
        input_fields=4, output_fields=4, time_window=5, patch_size=4,
        embed_dim=24, num_heads=4, processor_blocks=1, drop_path=0.0,
    )
    x = jax.random.normal(jax.random.key(1), (2, 5, 4, 16, 16))
    m_flash = get_model("avit", attn_impl="flash", **kw)
    m_plain = get_model("avit", attn_impl="plain", **kw)
    v = m_flash.init({"params": jax.random.key(0)}, x)
    np.testing.assert_allclose(
        np.asarray(m_flash.apply(v, x)),
        np.asarray(m_plain.apply(v, x)),
        atol=1e-5,
        rtol=1e-4,
    )
