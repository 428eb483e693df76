"""Golden tests for the lane-major chunk-matmul axial kernel (v5).

``ops/axial_lane.py`` runs qk-LayerNorm staging plus the row+column chunk
attention (T5 bias, attn_scale blend) in one pallas_call per direction at
the dual-layout QKV boundary, with a fully hand-written VJP.  These tests
pin it against the plain XLA path of ``AxialAttentionBlock`` (itself
golden-tested against the reference ``bubbleformer/layers/attention.py:
127-319``): identical parameter paths and init values, identical forward
outputs, and matching gradients for every parameter and the input.  Runs in
interpret mode on the CPU backend (conftest provisions it).
"""
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from bubbleformer_tpu.layers.attention import AxialAttentionBlock


def _blocks(impl_a="plain", impl_b="lane", **kw):
    defaults = dict(embed_dim=32, num_heads=4)
    defaults.update(kw)
    return (
        AxialAttentionBlock(attn_impl=impl_a, **defaults),
        AxialAttentionBlock(attn_impl=impl_b, **defaults),
    )


def test_lane_params_and_forward_match_plain():
    """Identical init param paths/values and identical forward output."""
    x = jnp.asarray(
        np.random.default_rng(7)
        .standard_normal((2, 8, 8, 32))
        .astype(np.float32)
    )
    plain, lane = _blocks()
    vp = plain.init(jax.random.key(0), x)
    vl = lane.init(jax.random.key(0), x)
    pa = jtu.tree_leaves_with_path(vp)
    pb = jtu.tree_leaves_with_path(vl)
    assert [jtu.keystr(k) for k, _ in pa] == [jtu.keystr(k) for k, _ in pb]
    for (k, a), (_, b) in zip(pa, pb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), err_msg=jtu.keystr(k)
        )
    np.testing.assert_allclose(
        np.asarray(lane.apply(vl, x)),
        np.asarray(plain.apply(vp, x)),
        atol=1e-5,
        rtol=1e-5,
    )


def test_lane_gradients_match_plain():
    """Hand-written VJP vs autodiff of the XLA path: gradients for every
    parameter (qk-LN affines, T5 bias table, per-axis attn scales, and the
    surrounding XLA-side Dense/InstanceNorm params) and for the input."""
    x = jnp.asarray(
        np.random.default_rng(11)
        .standard_normal((2, 8, 16, 32))
        .astype(np.float32)
    )
    cot = jnp.asarray(
        np.random.default_rng(12)
        .standard_normal((2, 8, 16, 32))
        .astype(np.float32)
    )
    plain, lane = _blocks()
    grads, xgrads = {}, {}
    for name, blk in [("plain", plain), ("lane", lane)]:
        v = blk.init(jax.random.key(0), x)

        def loss(params, xx):
            return jnp.sum(blk.apply(params, xx) * cot)

        grads[name], xgrads[name] = jax.grad(loss, argnums=(0, 1))(v, x)
    ga = jtu.tree_leaves_with_path(grads["plain"])
    gb = jtu.tree_leaves_with_path(grads["lane"])
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
        np.asarray(xgrads["lane"]) / s,
        atol=2e-5,
        rtol=2e-4,
    )


@pytest.mark.parametrize(
    "bias_type,attn_scale", [("none", False), ("rel", True), ("none", True)]
)
def test_lane_feature_toggles(bias_type, attn_scale):
    """bias/scale off -> the kernel's mask-only-table / unit-scale paths."""
    x = jnp.asarray(
        np.random.default_rng(5)
        .standard_normal((1, 8, 8, 16))
        .astype(np.float32)
    )
    plain, lane = _blocks(
        embed_dim=16, num_heads=2, bias_type=bias_type, attn_scale=attn_scale
    )
    vp = plain.init(jax.random.key(1), x)
    np.testing.assert_allclose(
        np.asarray(lane.apply(vp, x)),
        np.asarray(plain.apply(vp, x)),
        atol=1e-5,
        rtol=1e-5,
    )


def test_lane_nonsquare_grid():
    """Non-square grids (flow-boiling-shaped): multi-window chunks on one
    axis, whole-slab chunk on the other; forward + input grads match."""
    x = jnp.asarray(
        np.random.default_rng(21)
        .standard_normal((1, 12, 5, 16))
        .astype(np.float32)
    )
    plain, lane = _blocks(embed_dim=16, num_heads=2)
    v = plain.init(jax.random.key(2), x)
    np.testing.assert_allclose(
        np.asarray(lane.apply(v, x)),
        np.asarray(plain.apply(v, x)),
        atol=1e-5,
        rtol=1e-5,
    )
    gp = jax.grad(lambda xx: jnp.sum(plain.apply(v, xx) ** 2))(x)
    gl = jax.grad(lambda xx: jnp.sum(lane.apply(v, xx) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gl), atol=1e-5, rtol=1e-4
    )


def test_lane_matches_fused_block_and_mega():
    """All three whole-branch axial impls agree (same params)."""
    x = jnp.asarray(
        np.random.default_rng(3)
        .standard_normal((2, 8, 8, 16))
        .astype(np.float32)
    )
    lane = AxialAttentionBlock(embed_dim=16, num_heads=2, attn_impl="lane")
    v = lane.init(jax.random.key(0), x)
    ref = np.asarray(lane.apply(v, x))
    for impl in ("fused_block", "mega"):
        blk = AxialAttentionBlock(embed_dim=16, num_heads=2, attn_impl=impl)
        np.testing.assert_allclose(
            np.asarray(blk.apply(v, x)), ref, atol=1e-5, rtol=1e-5,
            err_msg=impl,
        )


def test_lane_supported_gate():
    """The auto-routing gate accepts the flagship shape and rejects
    lane-misaligned or VMEM-overflowing ones."""
    from bubbleformer_tpu.ops.axial_lane import (
        _grid_chunk,
        _pick_chunk,
        lane_axial_supported,
    )

    assert lane_axial_supported(32, 32, 384, 6)  # flagship 512^2/p16
    assert not lane_axial_supported(12, 5, 384, 6)  # n % 128 != 0
    # v6 streams lane chunks from HBM, so the 4x-larger grids the v5
    # whole-slab gate excluded (1024^2 / wide flow-boiling at C=384) are in.
    assert lane_axial_supported(64, 64, 384, 6)
    assert lane_axial_supported(32, 128, 384, 6)
    assert lane_axial_supported(32, 32, 768, 12)  # avit_big flagship grid
    # windows past one-tile-ish chunk tables stay out.
    assert not lane_axial_supported(1024, 64, 384, 6)
    # Streaming chunks cover whole rows AND columns, stay lane-aligned,
    # and keep the per-step working set bounded.
    assert _grid_chunk(32, 32, 384, 1024) == 1024  # flagship: one step
    gch = _grid_chunk(64, 64, 384, 4096)
    assert gch % 128 == 0 and gch % 64 == 0 and 4096 % gch == 0
    assert 86 * 384 * gch <= int(60e6)
    gch_wide = _grid_chunk(32, 128, 384, 4096)
    assert gch_wide % 128 == 0 and gch_wide % 32 == 0 and 4096 % gch_wide == 0
    assert _pick_chunk(32, 1024) == 256  # default target (measured fastest)
    assert _pick_chunk(32, 1024, target=128) == 128
    assert _pick_chunk(128, 4096) == 256
    assert _pick_chunk(5, 60) == 60
    assert _pick_chunk(160, 1600) == 160  # window > one tile
    assert _pick_chunk(160, 1600, target=128) == 160  # target < window


def test_lane_lean_projection_matches_plain():
    """Memory-lean boundary (batched projection dots): identical forward
    and gradients to the plain XLA path.  The lean form exists so the
    "dots" remat policy recomputes the dual QKV projections under
    scan_blocks instead of saving two (3C, BT*N) tensors per block
    (DESIGN.md round-4 note; BENCH_MATRIX_r04 b8-scan OOM)."""
    x = jnp.asarray(
        np.random.default_rng(31)
        .standard_normal((2, 8, 16, 32))
        .astype(np.float32)
    )
    cot = jnp.asarray(
        np.random.default_rng(32)
        .standard_normal((2, 8, 16, 32))
        .astype(np.float32)
    )
    plain = AxialAttentionBlock(embed_dim=32, num_heads=4, attn_impl="plain")
    lean = AxialAttentionBlock(
        embed_dim=32, num_heads=4, attn_impl="lane", memory_lean=True
    )
    v = plain.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(lean.apply(v, x)),
        np.asarray(plain.apply(v, x)),
        atol=1e-5,
        rtol=1e-5,
    )
    grads, xgrads = {}, {}
    for name, blk in [("plain", plain), ("lean", lean)]:
        def loss(params, xx):
            return jnp.sum(blk.apply(params, xx) * cot)

        grads[name], xgrads[name] = jax.grad(loss, argnums=(0, 1))(v, x)
    ga = jtu.tree_leaves_with_path(grads["plain"])
    gb = jtu.tree_leaves_with_path(grads["lean"])
    for (k, a), (_, b) in zip(ga, gb):
        s = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s,
            atol=2e-5, rtol=2e-4, err_msg=jtu.keystr(k),
        )
    s = max(float(jnp.abs(xgrads["plain"]).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(xgrads["plain"]) / s,
        np.asarray(xgrads["lean"]) / s,
        atol=2e-5,
        rtol=2e-4,
    )


@pytest.mark.superseded
def test_lane_px_in_kernel_projection_matches_plain():
    """v7 (projection in-kernel): identical forward and gradients to the
    plain XLA path, including the QKV weight/bias grads the kernel now
    accumulates across grid steps itself.  superseded: measured NEGATIVE
    at the flagship shape (axial stack 64.8 vs 60.3 ms; DESIGN.md r05) —
    auto-routing never picks it; opt-in via BUBBLEFORMER_LANE_PROJ=kernel."""
    from bubbleformer_tpu.ops.axial_lane import lane_axial_attention_from_x

    rng = np.random.default_rng(41)
    bt, h, w, c, heads = 2, 8, 16, 32, 4
    x = jnp.asarray(rng.standard_normal((bt, h, w, c)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((bt, h, w, c)).astype(np.float32))
    plain = AxialAttentionBlock(embed_dim=c, num_heads=heads, attn_impl="plain")
    v = plain.init(jax.random.key(0), x)

    blocks = {
        "plain": AxialAttentionBlock(embed_dim=c, num_heads=heads, attn_impl="plain"),
        "px": AxialAttentionBlock(embed_dim=c, num_heads=heads, attn_impl="lane"),
    }
    import os
    from unittest import mock

    grads, outs = {}, {}
    for name, blk in blocks.items():
        env = {"BUBBLEFORMER_LANE_PROJ": "kernel" if name == "px" else "xla"}
        with mock.patch.dict(os.environ, env):
            outs[name] = np.asarray(blk.apply(v, x))

            def loss(params, xx):
                return jnp.sum(blk.apply(params, xx) * cot)

            grads[name] = jax.grad(loss, argnums=(0, 1))(v, x)
    np.testing.assert_allclose(outs["px"], outs["plain"], atol=1e-5, rtol=1e-5)
    ga = jtu.tree_leaves_with_path(grads["plain"][0])
    gb = jtu.tree_leaves_with_path(grads["px"][0])
    assert [jtu.keystr(k) for k, _ in ga] == [jtu.keystr(k) for k, _ in gb]
    for (k, a), (_, b) in zip(ga, gb):
        s = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s,
            atol=2e-5, rtol=2e-4, err_msg=jtu.keystr(k),
        )
    s = max(float(jnp.abs(grads["plain"][1]).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(grads["plain"][1]) / s,
        np.asarray(grads["px"][1]) / s,
        atol=2e-5,
        rtol=2e-4,
    )


@pytest.mark.superseded
def test_lane_px_chunked_grid_matches_whole_slab():
    """v7 with a multi-step grid: the cross-grid dW/db/dln/dbias/dscale
    accumulators must reproduce the whole-slab result exactly.
    superseded: see test_lane_px_in_kernel_projection_matches_plain."""
    from bubbleformer_tpu.ops.axial_lane import (
        _build_table,
        _make_lane_axial_px,
        _pick_chunk,
    )

    rng = np.random.default_rng(43)
    bt, h, w, heads, d = 2, 8, 16, 2, 8
    c = heads * d
    n = h * w
    x = jnp.asarray(rng.standard_normal((bt, c, n)).astype(np.float32))
    xt = jnp.asarray(rng.standard_normal((bt, c, n)).astype(np.float32))
    wt = jnp.asarray(rng.standard_normal((3 * c, c)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((3 * c, 1)).astype(np.float32) * 0.1)
    ln = jnp.asarray(rng.uniform(0.5, 1.5, (d, 4)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (heads, 2)).astype(np.float32))
    bx = jnp.asarray(rng.standard_normal((heads, w, w)).astype(np.float32))
    by = jnp.asarray(rng.standard_normal((heads, h, h)).astype(np.float32))

    def run(gch):
        ch_r = _pick_chunk(w, gch)
        ch_c = _pick_chunk(h, gch)
        fused = _make_lane_axial_px(
            bt, n, heads, d, ch_r, ch_c, w, h, "float32", True, grid_ch=gch
        )

        # Differentiate w.r.t. the RAW (heads, len, len) biases through
        # _build_table so gradients are comparable across chunk sizes (the
        # built tables themselves have chunk-dependent shapes).
        def f(x, xt, wt, b, ln, bx, by, scale):
            br = _build_table(bx, heads, w, ch_r)
            bc = _build_table(by, heads, h, ch_c)
            o1, o2 = fused(x, xt, wt, b, ln, br, bc, scale)
            return jnp.sum(o1**2) + jnp.sum(o2**2)

        return jax.value_and_grad(f, argnums=tuple(range(8)))(
            x, xt, wt, b, ln, bx, by, scale
        )

    v_whole, g_whole = run(n)
    v_chunk, g_chunk = run(64)  # lcm(8,16)*4 = 64 -> 2 grid steps/image
    np.testing.assert_allclose(float(v_whole), float(v_chunk), rtol=1e-6)
    for a, b_ in zip(g_whole, g_chunk):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=1e-5
        )


def test_lean_projection_dot_not_saved_by_dots_policy():
    """The point of the lean boundary: under the "dots" remat policy the
    batched projection dot must be RECOMPUTED (not saved), while the
    non-lean flat projection dot is saved.  Asserted structurally: the
    policy callable accepts the non-batched dot's eqn and rejects the
    batched one."""
    from jax._src import ad_checkpoint as adc
    from jax import lax

    policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    # dot_general_p params as emitted by the two projection forms.
    no_batch = dict(
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=None,
        preferred_element_type=jnp.float32,
    )
    batched = dict(
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=None,
        preferred_element_type=jnp.float32,
    )
    assert policy(lax.dot_general_p, **no_batch)
    assert not policy(lax.dot_general_p, **batched)
    del adc


def test_memory_lean_auto_routes_lane():
    """'auto' + memory_lean now routes lane (the lean boundary) for shapes
    inside the lane gate, and still falls back to fused_block outside it."""
    from unittest import mock

    from bubbleformer_tpu.layers.attention import _resolve_attn_impl

    with mock.patch("jax.default_backend", return_value="tpu"):
        assert (
            _resolve_attn_impl(
                "auto", 32, kind="axial", shape=(32, 32, 384, 6),
                memory_lean=True,
            )
            == "lane"
        )
        assert (
            _resolve_attn_impl(
                "auto", 64, kind="axial", shape=(64, 64, 384, 6),
                memory_lean=True,
            )
            == "lane"
        )  # 1024^2 / p16
        assert (
            _resolve_attn_impl(
                "auto", 1024, kind="axial", shape=(1024, 64, 384, 6),
                memory_lean=True,
            )
            == "fused_block"
        )


def test_lane_chunked_grid_matches_whole_slab():
    """v6 streaming: an explicitly chunked grid (grid_lanes < n) must be
    numerically identical to the whole-slab path, forward and gradients
    (weight-gradient accumulation crosses grid steps)."""
    from bubbleformer_tpu.ops.axial_lane import lane_axial_attention

    rng = np.random.default_rng(11)
    bt, h, w, c, heads = 2, 8, 16, 16, 2
    qkv = jnp.asarray(rng.standard_normal((bt, h, w, 3 * c)).astype(np.float32))
    qs = jnp.asarray(rng.uniform(0.5, 1.5, c // heads).astype(np.float32))
    qb = jnp.asarray(rng.standard_normal(c // heads).astype(np.float32))
    ks = jnp.asarray(rng.uniform(0.5, 1.5, c // heads).astype(np.float32))
    kb = jnp.asarray(rng.standard_normal(c // heads).astype(np.float32))
    bx = jnp.asarray(rng.standard_normal((heads, w, w)).astype(np.float32))
    by = jnp.asarray(rng.standard_normal((heads, h, h)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(0.5, 1.5, heads).astype(np.float32))
    sy = jnp.asarray(rng.uniform(0.5, 1.5, heads).astype(np.float32))

    def run(gl):
        def f(qkv, bx, by, sx, sy):
            o = lane_axial_attention(
                qkv, qs, qb, ks, kb, bx, by, sx, sy, heads=heads,
                grid_lanes=gl,
            )
            return jnp.sum(o**2)

        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4))(
            qkv, bx, by, sx, sy
        )
        return val, grads

    # n = 128; chunk = lcm(8, 16) * 4 = 64 -> a 2-step grid per image.
    v_whole, g_whole = run(None)
    v_chunk, g_chunk = run(64)
    np.testing.assert_allclose(
        float(v_whole), float(v_chunk), rtol=1e-6
    )
    for a, b in zip(g_whole, g_chunk):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )
