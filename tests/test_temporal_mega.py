"""Golden tests for the whole-branch temporal megakernel.

``ops/temporal_block_mega.py`` runs the entire temporal-attention branch
(InstanceNorm1 -> QKV Dense -> qk-LayerNorm -> T-axis attention with T5 bias
and attn_scale -> InstanceNorm2 -> output Dense) in one pallas_call with a
fully hand-written VJP.  These tests pin it against the plain XLA path of
``TemporalAttentionBlock`` (itself golden-tested against the reference
``bubbleformer/layers/attention.py:26-117``): identical parameter paths and
init values, identical forward outputs, and matching gradients for every
parameter and the input.  Runs in interpret mode on the CPU backend
(conftest provisions it).
"""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from bubbleformer_tpu.layers.attention import TemporalAttentionBlock


def _blocks(impl_a="plain", impl_b="mega", **kw):
    defaults = dict(embed_dim=32, num_heads=4)
    defaults.update(kw)
    return (
        TemporalAttentionBlock(attn_impl=impl_a, **defaults),
        TemporalAttentionBlock(attn_impl=impl_b, **defaults),
    )


def test_temporal_mega_params_and_forward_match_plain():
    """Identical init param paths/values and identical forward output."""
    x = jnp.asarray(
        np.random.default_rng(7)
        .standard_normal((2, 3, 8, 8, 32))
        .astype(np.float32)
    )
    plain, mega = _blocks()
    vp = plain.init(jax.random.key(0), x)
    vm = mega.init(jax.random.key(0), x)
    pa = jtu.tree_leaves_with_path(vp)
    pb = jtu.tree_leaves_with_path(vm)
    assert [jtu.keystr(k) for k, _ in pa] == [jtu.keystr(k) for k, _ in pb]
    for (k, a), (_, b) in zip(pa, pb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), err_msg=jtu.keystr(k)
        )
    np.testing.assert_allclose(
        np.asarray(mega.apply(vm, x)),
        np.asarray(plain.apply(vp, x)),
        atol=1e-5,
        rtol=1e-5,
    )


def test_temporal_mega_gradients_match_plain():
    """Hand-written whole-branch VJP vs autodiff of the XLA path: gradients
    for every parameter (Dense kernels/biases, InstanceNorm affines, qk-LN
    affines, T5 bias table, attn_scale, gamma) and for the input."""
    x = jnp.asarray(
        np.random.default_rng(11)
        .standard_normal((2, 3, 8, 16, 32))
        .astype(np.float32)
    )
    cot = jnp.asarray(
        np.random.default_rng(12)
        .standard_normal((2, 3, 8, 16, 32))
        .astype(np.float32)
    )
    plain, mega = _blocks()
    grads, xgrads = {}, {}
    for name, blk in [("plain", plain), ("mega", mega)]:
        v = blk.init(jax.random.key(0), x)

        def loss(params, xx):
            return jnp.sum(blk.apply(params, xx) * cot)

        grads[name], xgrads[name] = jax.grad(loss, argnums=(0, 1))(v, x)
    ga = jtu.tree_leaves_with_path(grads["plain"])
    gb = jtu.tree_leaves_with_path(grads["mega"])
    assert [jtu.keystr(k) for k, _ in ga] == [jtu.keystr(k) for k, _ in gb]
    for (k, a), (_, b) in zip(ga, gb):
        s = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / s,
            np.asarray(b) / s,
            atol=2e-5,
            rtol=2e-4,
            err_msg=jtu.keystr(k),
        )
    s = max(float(jnp.abs(xgrads["plain"]).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(xgrads["plain"]) / s,
        np.asarray(xgrads["mega"]) / s,
        atol=2e-5,
        rtol=2e-4,
    )


@pytest.mark.parametrize("bias_type,attn_scale", [("none", False), ("rel", True)])
def test_temporal_mega_feature_toggles(bias_type, attn_scale):
    """bias/scale off -> the kernel's zero-bias / unit-scale paths match."""
    x = jnp.asarray(
        np.random.default_rng(5)
        .standard_normal((1, 2, 8, 8, 16))
        .astype(np.float32)
    )
    plain, mega = _blocks(
        embed_dim=16, num_heads=2, bias_type=bias_type, attn_scale=attn_scale
    )
    vp = plain.init(jax.random.key(1), x)
    np.testing.assert_allclose(
        np.asarray(mega.apply(vp, x)),
        np.asarray(plain.apply(vp, x)),
        atol=1e-5,
        rtol=1e-5,
    )


def test_temporal_mega_nonsquare_grid():
    """Non-square token grids (flow-boiling-shaped) and lane counts that are
    not multiples of 128: forward + grads still match the plain path."""
    x = jnp.asarray(
        np.random.default_rng(21)
        .standard_normal((1, 4, 12, 5, 16))
        .astype(np.float32)
    )
    plain, mega = _blocks(embed_dim=16, num_heads=2)
    v = plain.init(jax.random.key(2), x)
    np.testing.assert_allclose(
        np.asarray(mega.apply(v, x)),
        np.asarray(plain.apply(v, x)),
        atol=1e-5,
        rtol=1e-5,
    )
    gp = jax.grad(lambda xx: jnp.sum(plain.apply(v, xx) ** 2))(x)
    gm = jax.grad(lambda xx: jnp.sum(mega.apply(v, xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gm), atol=1e-5,
                               rtol=1e-4)


def test_mega_temporal_supported_gate():
    """The auto-routing gate accepts the flagship shape and rejects
    lane-misaligned or VMEM-overflowing ones."""
    from bubbleformer_tpu.ops.temporal_block_mega import (
        mega_temporal_supported,
    )

    assert mega_temporal_supported(5, 32, 32, 384)  # flagship 512^2/p16
    assert not mega_temporal_supported(5, 12, 5, 384)  # n % 128 != 0
    assert not mega_temporal_supported(5, 64, 64, 768)  # VMEM overflow


def test_mega_model_level_scan_and_unrolled():
    """Both megakernels (temporal + axial, attn_impl='mega') inside the full
    AViT under the unrolled and nn.scan block paths: outputs agree and
    gradients are finite (scan + remat over pallas custom_vjp calls)."""
    from bubbleformer_tpu.models.axial_vit import AViT

    x = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((1, 2, 3, 16, 16))
        .astype(np.float32)
    )
    outs = {}
    for scan in [False, True]:
        m = AViT(
            input_fields=3, output_fields=3, time_window=2, embed_dim=32,
            num_heads=4, processor_blocks=2, patch_size=4, attn_impl="mega",
            scan_blocks=scan, drop_path=0.0,
        )
        v = m.init(jax.random.key(0), x)
        outs[scan] = np.asarray(m.apply(v, x))
        g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(v)
        assert all(
            np.isfinite(np.asarray(l)).all() for l in jtu.tree_leaves(g)
        )
    np.testing.assert_allclose(outs[True], outs[False], atol=5e-5, rtol=1e-4)


def test_temporal_core_matches_plain():
    """The streamed core kernel (attn_impl='core': QKV+qk-LN+attention
    in-kernel, IN/Dense in XLA) matches the plain path: identical param
    paths, forward outputs and all gradients."""
    x = jnp.asarray(
        np.random.default_rng(31)
        .standard_normal((2, 3, 8, 16, 32))
        .astype(np.float32)
    )
    cot = jnp.asarray(
        np.random.default_rng(32)
        .standard_normal((2, 3, 8, 16, 32))
        .astype(np.float32)
    )
    plain, core = _blocks(impl_b="core")
    vp = plain.init(jax.random.key(0), x)
    vc = core.init(jax.random.key(0), x)
    pa = jtu.tree_leaves_with_path(vp)
    pb = jtu.tree_leaves_with_path(vc)
    assert [jtu.keystr(k) for k, _ in pa] == [jtu.keystr(k) for k, _ in pb]
    np.testing.assert_allclose(
        np.asarray(core.apply(vp, x)),
        np.asarray(plain.apply(vp, x)),
        atol=1e-5,
        rtol=1e-5,
    )

    grads, xgrads = {}, {}
    for name, blk in [("plain", plain), ("core", core)]:
        def loss(params, xx):
            return jnp.sum(blk.apply(params, xx) * cot)

        grads[name], xgrads[name] = jax.grad(loss, argnums=(0, 1))(vp, x)
    for (k, a), (_, b) in zip(
        jtu.tree_leaves_with_path(grads["plain"]),
        jtu.tree_leaves_with_path(grads["core"]),
    ):
        s = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s, atol=2e-5, rtol=2e-4,
            err_msg=jtu.keystr(k),
        )
    s = max(float(jnp.abs(xgrads["plain"]).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(xgrads["plain"]) / s,
        np.asarray(xgrads["core"]) / s,
        atol=2e-5,
        rtol=2e-4,
    )


def test_temporal_core_chunked_grid_matches_whole():
    """Streaming (chunk < n) must be numerically identical to the whole-slab
    grid, forward and gradients (weight grads accumulate across steps)."""
    from bubbleformer_tpu.ops.temporal_block_mega import (
        _core_chunk,
        core_temporal_attention,
        core_temporal_supported,
    )

    assert core_temporal_supported(5, 32, 32, 768)  # avit_big flagship grid
    assert not core_temporal_supported(5, 12, 5, 384)  # n % 128 != 0
    nc = _core_chunk(5, 1024, 768)
    assert nc % 128 == 0 and 1024 % nc == 0
    assert 50 * 768 * 5 * nc <= int(60e6)

    rng = np.random.default_rng(41)
    b, t, h, w, c, heads = 1, 3, 8, 16, 16, 2
    d = c // heads
    xn = jnp.asarray(rng.standard_normal((b, t, h, w, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.standard_normal(3 * c).astype(np.float32) * 0.1)
    qs = jnp.asarray(rng.uniform(0.5, 1.5, d).astype(np.float32))
    qb = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    ks = jnp.asarray(rng.uniform(0.5, 1.5, d).astype(np.float32))
    kb = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((heads, t, t)).astype(np.float32))
    sc = jnp.asarray(rng.uniform(0.5, 1.5, heads).astype(np.float32))

    def run(chunk):
        def f(xn, wqkv, bqkv, bias, sc):
            o = core_temporal_attention(
                xn, wqkv, bqkv, qs, qb, ks, kb, bias, sc, heads=heads,
                chunk=chunk,
            )
            return jnp.sum(o**2)

        return jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4))(
            xn, wqkv, bqkv, bias, sc
        )

    v_whole, g_whole = run(None)  # n = 128, one step
    v_chunk, g_chunk = run(64)  # 2-step grid (interpret mode)
    np.testing.assert_allclose(float(v_whole), float(v_chunk), rtol=1e-6)
    for a, b2 in zip(g_whole, g_chunk):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), atol=1e-5, rtol=1e-5
        )


def test_temporal_mega_under_remat():
    """nn.remat over the mega path: value + grads finite and matching."""
    from flax import linen as nn

    x = jnp.asarray(
        np.random.default_rng(9)
        .standard_normal((1, 3, 8, 8, 16))
        .astype(np.float32)
    )
    blk = TemporalAttentionBlock(embed_dim=16, num_heads=2, attn_impl="mega")
    rblk = nn.remat(TemporalAttentionBlock)(
        embed_dim=16, num_heads=2, attn_impl="mega"
    )
    v = blk.init(jax.random.key(0), x)

    def loss(m, params):
        return jnp.sum(m.apply(params, x) ** 2)

    g_plain = jax.grad(lambda p: loss(blk, p))(v)
    g_remat = jax.grad(lambda p: loss(rblk, p))(v)
    for (k, a), (_, b) in zip(
        jtu.tree_leaves_with_path(g_plain), jtu.tree_leaves_with_path(g_remat)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5,
            err_msg=jtu.keystr(k),
        )
