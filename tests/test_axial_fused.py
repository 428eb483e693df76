"""Fused row+column axial kernel and unrolled temporal attention: numerics
vs the XLA reference (interpret mode on CPU; the compiled path is exercised
by bench.py / scripts/ablate_block.py on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bubbleformer_tpu.ops.attention import (
    axis_attention,
    scaled_axial_attention,
    unrolled_axis_attention,
)
from bubbleformer_tpu.ops.axial_fused import fused_axial_attention
from bubbleformer_tpu.ops.axial_fused_block import fused_block_attention
from bubbleformer_tpu.ops.axial_fused_packed import fused_axial_attention_packed


def _rand(bt, h, w, heads, d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q, k, v = mk(bt, h, w, heads, d), mk(bt, h, w, heads, d), mk(bt, h, w, heads, d)
    bx, by = mk(heads, w, w), mk(heads, h, h)
    sx = jnp.asarray(rng.uniform(0.5, 1.5, heads).astype(np.float32))
    sy = jnp.asarray(rng.uniform(0.5, 1.5, heads).astype(np.float32))
    return q, k, v, bx, by, sx, sy


def _axial_reference(q, k, v, bx, by, sx, sy):
    """Rows (seq W) + columns (seq H) averaged, via scaled_axial_attention."""
    qr, kr, vr = (jnp.transpose(a, (0, 1, 3, 2, 4)) for a in (q, k, v))
    xx = scaled_axial_attention(qr, kr, vr, bias=bx, scale_factor=sx)
    xx = jnp.transpose(xx, (0, 1, 3, 2, 4))
    qc, kc, vc = (jnp.transpose(a, (0, 2, 3, 1, 4)) for a in (q, k, v))
    xy = scaled_axial_attention(qc, kc, vc, bias=by, scale_factor=sy)
    xy = jnp.transpose(xy, (0, 3, 1, 2, 4))
    return 0.5 * (xx + xy)


@pytest.mark.superseded
@pytest.mark.parametrize("bt,h,w", [(2, 16, 8), (1, 8, 8), (3, 8, 24)])
def test_fused_forward_golden(bt, h, w):
    q, k, v, bx, by, sx, sy = _rand(bt, h, w, 2, 8)
    ref = _axial_reference(q, k, v, bx, by, sx, sy)
    out = fused_axial_attention(q, k, v, bx, by, sx, sy, chunk_target=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


@pytest.mark.superseded
def test_fused_no_bias_no_scale():
    q, k, v, *_ = _rand(2, 8, 16, 3, 8, seed=3)
    ref = _axial_reference(
        q, k, v, None, None, jnp.ones((3,)), jnp.ones((3,))
    )
    out = fused_axial_attention(q, k, v, chunk_target=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


@pytest.mark.superseded
def test_fused_gradients_golden():
    args = _rand(2, 16, 8, 2, 8, seed=1)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal((2, 16, 8, 2, 8)).astype(np.float32)
    )

    def loss_ref(*a):
        return jnp.sum(_axial_reference(*a) * cot)

    def loss_fused(*a):
        return jnp.sum(fused_axial_attention(*a, chunk_target=64, interpret=True) * cot)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    g_fus = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    names = ["dq", "dk", "dv", "dbias_x", "dbias_y", "dscale_x", "dscale_y"]
    for name, a, b in zip(names, g_ref, g_fus):
        scale = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-6, err_msg=name
        )


@pytest.mark.superseded
def test_fused_chunking_invariance():
    """Different chunk sizes give identical results (pure packing change)."""
    q, k, v, bx, by, sx, sy = _rand(1, 16, 16, 2, 8, seed=2)
    a = fused_axial_attention(q, k, v, bx, by, sx, sy, chunk_target=32, interpret=True)
    b = fused_axial_attention(q, k, v, bx, by, sx, sy, chunk_target=256, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5)


# ------------------------------------------------- head-packed fused (v2)
@pytest.mark.superseded
@pytest.mark.parametrize("bt,h,w", [(2, 16, 8), (1, 8, 8), (3, 8, 24)])
def test_fused_packed_forward_golden(bt, h, w):
    q, k, v, bx, by, sx, sy = _rand(bt, h, w, 2, 8)
    ref = _axial_reference(q, k, v, bx, by, sx, sy)
    out = fused_axial_attention_packed(
        q, k, v, bx, by, sx, sy, chunk_target=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


@pytest.mark.superseded
def test_fused_packed_no_bias_no_scale():
    q, k, v, *_ = _rand(2, 8, 16, 3, 8, seed=3)
    ref = _axial_reference(q, k, v, None, None, jnp.ones((3,)), jnp.ones((3,)))
    out = fused_axial_attention_packed(q, k, v, chunk_target=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


@pytest.mark.superseded
def test_fused_packed_gradients_golden():
    args = _rand(2, 16, 8, 2, 8, seed=1)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal((2, 16, 8, 2, 8)).astype(np.float32)
    )

    def loss_ref(*a):
        return jnp.sum(_axial_reference(*a) * cot)

    def loss_packed(*a):
        return jnp.sum(
            fused_axial_attention_packed(*a, chunk_target=64, interpret=True) * cot
        )

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    g_pk = jax.grad(loss_packed, argnums=tuple(range(7)))(*args)
    names = ["dq", "dk", "dv", "dbias_x", "dbias_y", "dscale_x", "dscale_y"]
    for name, a, b in zip(names, g_ref, g_pk):
        scale = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-6, err_msg=name
        )


@pytest.mark.superseded
def test_fused_packed_chunking_invariance():
    q, k, v, bx, by, sx, sy = _rand(1, 16, 16, 2, 8, seed=2)
    a = fused_axial_attention_packed(
        q, k, v, bx, by, sx, sy, chunk_target=16, interpret=True
    )
    b = fused_axial_attention_packed(
        q, k, v, bx, by, sx, sy, chunk_target=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5)


# ------------------------------------- block-fused with in-kernel qk-LN (v3)
def _rand_block(bt, h, w, heads, d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q, k, v = mk(bt, h, w, heads, d), mk(bt, h, w, heads, d), mk(bt, h, w, heads, d)
    qkv = jnp.concatenate([q, k, v], axis=-1).reshape(bt, h, w, heads * 3 * d)
    qg, qb = mk(d) * 0.2 + 1.0, mk(d) * 0.2
    kg, kb = mk(d) * 0.2 + 1.0, mk(d) * 0.2
    bx, by = mk(heads, w, w), mk(heads, h, h)
    sx = jnp.asarray(rng.uniform(0.5, 1.5, heads).astype(np.float32))
    sy = jnp.asarray(rng.uniform(0.5, 1.5, heads).astype(np.float32))
    return qkv, qg, qb, kg, kb, bx, by, sx, sy


def _block_reference(qkv, qg, qb, kg, kb, bx, by, sx, sy, heads):
    """Split + flax-semantics qk-LayerNorm + axial reference."""
    bt, h, w, c3 = qkv.shape
    d = c3 // (3 * heads)
    q, k, v = jnp.split(qkv.reshape(bt, h, w, heads, 3 * d), 3, axis=-1)

    def ln(x, g, b):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * g + b

    return _axial_reference(ln(q, qg, qb), ln(k, kg, kb), v, bx, by, sx, sy)


@pytest.mark.parametrize("bt,h,w", [(2, 16, 8), (1, 8, 8), (3, 8, 24)])
def test_fused_block_forward_golden(bt, h, w):
    args = _rand_block(bt, h, w, 2, 8)
    ref = _block_reference(*args, heads=2)
    out = fused_block_attention(*args, heads=2, chunk_target=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6, rtol=1e-5)


def test_fused_block_no_bias_no_scale():
    qkv, qg, qb, kg, kb, *_ = _rand_block(2, 8, 16, 3, 8, seed=3)
    ref = _block_reference(
        qkv, qg, qb, kg, kb, None, None, jnp.ones((3,)), jnp.ones((3,)), heads=3
    )
    out = fused_block_attention(
        qkv, qg, qb, kg, kb, heads=3, chunk_target=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6, rtol=1e-5)


def test_fused_block_gradients_golden():
    args = _rand_block(2, 16, 8, 2, 8, seed=1)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal((2, 16, 8, 2, 8)).astype(np.float32)
    )

    def loss_ref(*a):
        return jnp.sum(_block_reference(*a, heads=2) * cot)

    def loss_blk(*a):
        return jnp.sum(
            fused_block_attention(*a, heads=2, chunk_target=64, interpret=True) * cot
        )

    g_ref = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    g_blk = jax.grad(loss_blk, argnums=tuple(range(9)))(*args)
    names = ["dqkv", "dqg", "dqb", "dkg", "dkb", "dbx", "dby", "dsx", "dsy"]
    for name, a, b in zip(names, g_ref, g_blk):
        scale = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-5, err_msg=name
        )


def test_fused_block_under_remat():
    """Regression: the lru_cached kernel factory must not capture trace-time
    constants.  Building the factory *inside* a remat trace and reusing it in
    the backward re-trace leaked a tracer (UnexpectedTracerError) when rmat
    was a jnp array; numpy constants convert per-trace."""
    from bubbleformer_tpu.ops import axial_fused_block as afb

    afb._make_fused_block.cache_clear()
    args = _rand_block(1, 8, 8, 2, 8, seed=5)

    @jax.checkpoint
    def loss(*a):
        return jnp.sum(
            fused_block_attention(*a, heads=2, chunk_target=64, interpret=True)
        )

    g = jax.grad(loss)(*args)
    assert np.isfinite(np.asarray(g)).all()


# ------------------------------------- whole-branch megakernel (v4)
@pytest.mark.superseded
def test_mega_module_forward_matches_plain():
    """AxialAttentionBlock(attn_impl='mega'): identical init params (paths,
    shapes, values) and identical forward output vs the plain XLA path."""
    from bubbleformer_tpu.layers.attention import AxialAttentionBlock
    import jax.tree_util as jtu

    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 8, 8, 32)).astype(np.float32)
    )
    out, params = {}, {}
    for impl in ["plain", "mega"]:
        blk = AxialAttentionBlock(embed_dim=32, num_heads=4, attn_impl=impl)
        params[impl] = blk.init(jax.random.key(0), x)
        out[impl] = blk.apply(params[impl], x)
    pa = jtu.tree_leaves_with_path(params["plain"])
    pb = jtu.tree_leaves_with_path(params["mega"])
    assert [jtu.keystr(k) for k, _ in pa] == [jtu.keystr(k) for k, _ in pb]
    for (k, a), (_, b) in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=jtu.keystr(k))
    np.testing.assert_allclose(
        np.asarray(out["mega"]), np.asarray(out["plain"]), atol=1e-5, rtol=1e-5
    )


@pytest.mark.superseded
def test_mega_module_gradients_match_plain():
    """Full-branch hand-written VJP vs autodiff of the XLA path, through the
    Flax module: gradients for every parameter (both Dense kernels/biases,
    both InstanceNorm affines, qk-LN affines, T5 bias table, attn scales)
    and for the input."""
    from bubbleformer_tpu.layers.attention import AxialAttentionBlock
    import jax.tree_util as jtu

    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((2, 8, 16, 32)).astype(np.float32)
    )
    cot = jnp.asarray(
        np.random.default_rng(12).standard_normal((2, 8, 16, 32)).astype(np.float32)
    )
    grads, xgrads = {}, {}
    for impl in ["plain", "mega"]:
        blk = AxialAttentionBlock(embed_dim=32, num_heads=4, attn_impl=impl)
        v = blk.init(jax.random.key(0), x)

        def loss(params, xx):
            return jnp.sum(blk.apply(params, xx) * cot)

        grads[impl], xgrads[impl] = jax.grad(loss, argnums=(0, 1))(v, x)
    ga = jtu.tree_leaves_with_path(grads["plain"])
    gb = jtu.tree_leaves_with_path(grads["mega"])
    for (k, a), (_, b) in zip(ga, gb):
        s = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(b) / s, np.asarray(a) / s, atol=2e-5, err_msg=jtu.keystr(k)
        )
    s = max(float(jnp.abs(xgrads["plain"]).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(xgrads["mega"]) / s, np.asarray(xgrads["plain"]) / s, atol=2e-5
    )


@pytest.mark.superseded
def test_mega_non_square_and_no_bias():
    """Non-square grid, bias_type='none', feat/attn scales off."""
    from bubbleformer_tpu.layers.attention import AxialAttentionBlock

    x = jnp.asarray(
        np.random.default_rng(13).standard_normal((1, 16, 8, 24)).astype(np.float32)
    )
    out = {}
    for impl in ["plain", "mega"]:
        blk = AxialAttentionBlock(
            embed_dim=24, num_heads=3, attn_impl=impl, bias_type="none",
            attn_scale=False, feat_scale=False,
        )
        v = blk.init(jax.random.key(1), x)
        out[impl] = blk.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(out["mega"]), np.asarray(out["plain"]), atol=1e-5, rtol=1e-5
    )


@pytest.mark.superseded
def test_mega_under_remat():
    """The lru_cached megakernel factory must not capture trace-time
    constants (same regression class as test_fused_block_under_remat)."""
    from bubbleformer_tpu.layers.attention import AxialAttentionBlock
    from bubbleformer_tpu.ops import axial_block_mega as abm

    abm._make_mega_block.cache_clear()
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 8, 8, 16)).astype(np.float32)
    )
    blk = AxialAttentionBlock(embed_dim=16, num_heads=2, attn_impl="mega")
    v = blk.init(jax.random.key(0), x)

    @jax.checkpoint
    def loss(params):
        return jnp.sum(blk.apply(params, x) ** 2)

    g = jax.grad(loss)(v)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


# ------------------------------------------------------- unrolled temporal
def test_unrolled_matches_axis_attention():
    rng = np.random.default_rng(0)
    b, t, h, w, heads, d = 2, 5, 4, 4, 3, 8
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q, k, v = mk(b, t, h, w, heads, d), mk(b, t, h, w, heads, d), mk(b, t, h, w, heads, d)
    bias = mk(heads, t, t)
    s = jnp.asarray(rng.uniform(0.5, 1.5, heads).astype(np.float32))

    ref = axis_attention(q, k, v, axis=1, bias=bias, scale_factor=s)
    ref = jnp.transpose(ref, (0, 4, 1, 2, 3, 5))  # to input layout
    out = unrolled_axis_attention(q, k, v, axis=1, bias=bias, scale_factor=s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    g1 = jax.grad(
        lambda q: jnp.sum(axis_attention(q, k, v, axis=1, bias=bias, scale_factor=s) ** 2)
    )(q)
    g2 = jax.grad(
        lambda q: jnp.sum(
            unrolled_axis_attention(q, k, v, axis=1, bias=bias, scale_factor=s) ** 2
        )
    )(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_unrolled_no_bias():
    rng = np.random.default_rng(4)
    b, t, hw, heads, d = 2, 3, 6, 2, 4
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q, k, v = mk(b, t, hw, heads, d), mk(b, t, hw, heads, d), mk(b, t, hw, heads, d)
    ref = jnp.transpose(axis_attention(q, k, v, axis=1), (0, 3, 1, 2, 4))
    out = unrolled_axis_attention(q, k, v, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.superseded
def test_model_attn_impls_agree():
    """AxialAttentionBlock: fused == plain through the Flax module."""
    from bubbleformer_tpu.layers.attention import AxialAttentionBlock

    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 8, 8, 32)).astype(np.float32)
    )
    out = {}
    for impl in ["plain", "fused", "fused_packed", "fused_block"]:
        blk = AxialAttentionBlock(embed_dim=32, num_heads=4, attn_impl=impl)
        v = blk.init(jax.random.key(0), x)
        out[impl] = blk.apply(v, x)
    for impl in ["fused", "fused_packed", "fused_block"]:
        np.testing.assert_allclose(
            np.asarray(out[impl]), np.asarray(out["plain"]), atol=1e-5, rtol=1e-5,
            err_msg=impl,
        )


def test_model_temporal_unrolled_agrees():
    """TemporalAttentionBlock: unrolled == plain through the Flax module."""
    from bubbleformer_tpu.layers.attention import TemporalAttentionBlock

    x = jnp.asarray(
        np.random.default_rng(8).standard_normal((2, 5, 4, 4, 32)).astype(np.float32)
    )
    out = {}
    for impl in ["plain", "unrolled"]:
        blk = TemporalAttentionBlock(embed_dim=32, num_heads=4, attn_impl=impl)
        v = blk.init(jax.random.key(0), x)
        out[impl] = blk.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(out["unrolled"]), np.asarray(out["plain"]), atol=1e-5, rtol=1e-5
    )
