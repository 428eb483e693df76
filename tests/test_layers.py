"""Layer-level tests: shapes + numerical golden checks against the reference
torch implementations (loaded standalone as oracles, see _reference.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests._reference import load_reference_module, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


# ---------------------------------------------------------------- patching
@pytest.mark.parametrize("patch_size", [2, 4, 8, 16])
@pytest.mark.parametrize("embed_dim", [96, 384])
def test_patching_shapes(patch_size, embed_dim):
    from bubbleformer_tpu.layers import HMLPDebed, HMLPEmbed

    h = w = 64
    x = jnp.ones((1, h, w, 3))
    embed = HMLPEmbed(patch_size=patch_size, in_channels=3, embed_dim=embed_dim)
    v = embed.init(jax.random.key(0), x)
    y = embed.apply(v, x)
    assert y.shape == (1, h // patch_size, w // patch_size, embed_dim)

    debed = HMLPDebed(patch_size=patch_size, out_channels=3, embed_dim=embed_dim)
    vd = debed.init(jax.random.key(0), y)
    z = debed.apply(vd, y)
    assert z.shape == (1, h, w, 3)


@requires_reference
def test_patch_embed_golden_vs_torch():
    """Copy weights into the reference HMLPEmbed and compare outputs."""
    import torch

    ref = load_reference_module("ref_patching", "bubbleformer/layers/patching.py")
    from bubbleformer_tpu.layers import HMLPEmbed

    patch, emb, cin = 4, 32, 3
    torch.manual_seed(0)
    tmod = ref.HMLPEmbed(patch_size=patch, in_channels=cin, embed_dim=emb).eval()

    jmod = HMLPEmbed(patch_size=patch, in_channels=cin, embed_dim=emb)
    x = np.random.default_rng(0).standard_normal((2, 16, 16, cin)).astype(np.float32)
    variables = jmod.init(jax.random.key(0), jnp.asarray(x))

    # Port torch weights: Conv2d weight (out, in, kh, kw) -> flax (kh, kw, in, out);
    # InstanceNorm weight/bias -> scale/bias.
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    convs = [m for m in tmod.in_proj if isinstance(m, torch.nn.Conv2d)]
    norms = [m for m in tmod.in_proj if isinstance(m, torch.nn.InstanceNorm2d)]
    for i, (c, n) in enumerate(zip(convs, norms)):
        params[f"conv{i}"]["kernel"] = c.weight.detach().numpy().transpose(2, 3, 1, 0)
        params[f"norm{i}"]["scale"] = n.weight.detach().numpy()
        params[f"norm{i}"]["bias"] = n.bias.detach().numpy()

    out_j = np.asarray(jmod.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(out_j, out_t.transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------- norms
@requires_reference
def test_instance_norm_golden():
    import torch

    from bubbleformer_tpu.layers import InstanceNorm

    c = 12
    x = np.random.default_rng(1).standard_normal((3, 8, 8, c)).astype(np.float32)
    mod = InstanceNorm(c)
    v = mod.init(jax.random.key(0), jnp.asarray(x))
    scale = np.random.default_rng(2).standard_normal(c).astype(np.float32)
    bias = np.random.default_rng(3).standard_normal(c).astype(np.float32)
    v = {"params": {"scale": scale, "bias": bias}}
    out_j = np.asarray(mod.apply(v, jnp.asarray(x)))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    out_t = torch.nn.functional.instance_norm(
        xt, weight=torch.from_numpy(scale), bias=torch.from_numpy(bias), eps=1e-5
    ).numpy()
    np.testing.assert_allclose(out_j, out_t.transpose(0, 2, 3, 1), atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------- position bias
@requires_reference
@pytest.mark.parametrize("n", [5, 32, 64])
def test_t5_bias_golden(n):
    import torch

    ref = load_reference_module(
        "ref_positional", "bubbleformer/layers/positional_encoding.py"
    )
    from bubbleformer_tpu.layers import RelativePositionBias

    heads = 6
    torch.manual_seed(0)
    tmod = ref.RelativePositionBias(n_heads=heads)
    table = tmod.relative_attention_bias.weight.detach().numpy()

    jmod = RelativePositionBias(num_heads=heads)
    out_j = np.asarray(
        jmod.apply({"params": {"embedding": table}}, n, n)
    )  # (heads, n, n)
    with torch.no_grad():
        out_t = tmod(n, n).numpy()[0]  # (heads, n, n)
    np.testing.assert_allclose(out_j, out_t, atol=1e-6)


@requires_reference
def test_continuous_bias_golden():
    import torch

    ref = load_reference_module(
        "ref_positional2", "bubbleformer/layers/positional_encoding.py"
    )
    from bubbleformer_tpu.layers import ContinuousPositionBias1D

    heads, n = 4, 16
    torch.manual_seed(0)
    tmod = ref.ContinuousPositionBias1D(n_heads=heads)
    fc1, _, fc2 = tmod.cpb_mlp

    jmod = ContinuousPositionBias1D(num_heads=heads)
    params = {
        "fc1": {
            "kernel": fc1.weight.detach().numpy().T,
            "bias": fc1.bias.detach().numpy(),
        },
        "fc2": {"kernel": fc2.weight.detach().numpy().T},
    }
    out_j = np.asarray(jmod.apply({"params": params}, n, n))
    with torch.no_grad():
        out_t = tmod(n, n).numpy()[0]
    np.testing.assert_allclose(out_j, out_t, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------- attention core
def test_attn_scale_fusion_equals_eager_decomposition():
    """Our fused form s*attn@v + (1-s)*mean(v) must equal the reference's
    eager (attn_low + s*(attn - attn_low)) @ v decomposition."""
    from bubbleformer_tpu.ops.attention import scaled_axial_attention

    rng = np.random.default_rng(0)
    b, heads, n, d = 3, 4, 7, 8
    q, k, v = (rng.standard_normal((b, heads, n, d)).astype(np.float32) for _ in range(3))
    bias = rng.standard_normal((heads, n, n)).astype(np.float32)
    s = rng.uniform(0.5, 1.5, heads).astype(np.float32)

    out = np.asarray(
        scaled_axial_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias), jnp.asarray(s)
        )
    )

    # Eager reference math (attention.py:85-101), in numpy.
    logits = q @ k.transpose(0, 1, 3, 2) * d**-0.5 + bias[None]
    attn = np.exp(logits - logits.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    attn_low = np.full((n, n), 1.0 / n, dtype=np.float32)[None, None]
    attn_ref = attn_low + (attn - attn_low) * s[None, :, None, None]
    out_ref = attn_ref @ v
    np.testing.assert_allclose(out, out_ref, atol=1e-5, rtol=1e-4)


def test_attention_no_scale_is_sdpa():
    import torch

    from bubbleformer_tpu.ops.attention import scaled_axial_attention

    rng = np.random.default_rng(1)
    b, heads, n, d = 2, 3, 9, 16
    q, k, v = (rng.standard_normal((b, heads, n, d)).astype(np.float32) for _ in range(3))
    bias = rng.standard_normal((heads, n, n)).astype(np.float32)

    out = np.asarray(
        scaled_axial_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias))
    )
    with torch.no_grad():
        out_t = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q),
            torch.from_numpy(k),
            torch.from_numpy(v),
            attn_mask=torch.from_numpy(bias)[None],
        ).numpy()
    np.testing.assert_allclose(out, out_t, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------- blocks
def test_attention_block_shapes():
    from bubbleformer_tpu.layers import AxialAttentionBlock, TemporalAttentionBlock

    x = jnp.ones((2, 5, 4, 6, 24))  # (B, T, H, W, C)
    blk = TemporalAttentionBlock(embed_dim=24, num_heads=4)
    v = blk.init(jax.random.key(0), x)
    assert blk.apply(v, x).shape == x.shape

    xs = jnp.ones((10, 4, 6, 24))  # non-square spatial grid
    sblk = AxialAttentionBlock(embed_dim=24, num_heads=4)
    vs = sblk.init(jax.random.key(0), xs)
    assert sblk.apply(vs, xs).shape == xs.shape


def test_drop_path_statistics():
    from bubbleformer_tpu.layers import drop_path

    x = jnp.ones((4096, 2))
    y = drop_path(x, 0.25, jax.random.key(0), deterministic=False)
    # Each sample is either 0 or 1/keep.
    vals = np.unique(np.asarray(y))
    assert all(min(abs(v - 0.0), abs(v - 1.0 / 0.75)) < 1e-5 for v in vals)
    keep_frac = float((np.asarray(y)[:, 0] > 0).mean())
    assert abs(keep_frac - 0.75) < 0.03
    # Deterministic passthrough.
    assert np.allclose(np.asarray(drop_path(x, 0.25, None, True)), 1.0)


# ---------------------------------------------------------------- FiLM / MLP
@requires_reference
def test_film_golden():
    import torch

    ref = load_reference_module("ref_linear", "bubbleformer/layers/linear_layers.py")
    from bubbleformer_tpu.layers import FiLMMLP

    torch.manual_seed(0)
    pdim, emb = 9, 16
    tmod = ref.FiLMMLP(pdim, emb).eval()
    ln, fc = tmod.film_net

    jmod = FiLMMLP(param_dim=pdim, embed_dim=emb)
    params = {
        "norm": {
            "scale": ln.weight.detach().numpy(),
            "bias": ln.bias.detach().numpy(),
        },
        "proj": {
            "kernel": fc.weight.detach().numpy().T,
            "bias": fc.bias.detach().numpy(),
        },
    }
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 3, 4, emb)).astype(np.float32)  # (B,T,H,W,C)
    cond = rng.standard_normal((2, pdim)).astype(np.float32)

    out_j = np.asarray(jmod.apply({"params": params}, jnp.asarray(x), jnp.asarray(cond)))
    with torch.no_grad():
        # Reference layout (B, T, C, H, W).
        xt = torch.from_numpy(x.transpose(0, 1, 4, 2, 3))
        out_t = tmod(xt, torch.from_numpy(cond)).numpy().transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(out_j, out_t, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("cls_name", ["embed", "debed"])
def test_s2d_impl_equals_conv_impl(cls_name):
    """Space-to-depth matmul formulation == strided conv, same parameters."""
    from bubbleformer_tpu.layers import HMLPDebed, HMLPEmbed

    if cls_name == "embed":
        kw = dict(patch_size=4, embed_dim=32, in_channels=3)
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
        cls = HMLPEmbed
    else:
        kw = dict(patch_size=4, embed_dim=32, out_channels=3)
        x = jax.random.normal(jax.random.key(1), (2, 4, 4, 32))
        cls = HMLPDebed
    m_s2d = cls(impl="s2d", **kw)
    m_conv = cls(impl="conv", **kw)
    v = m_s2d.init(jax.random.key(2), x)
    np.testing.assert_allclose(
        np.asarray(m_s2d.apply(v, x)),
        np.asarray(m_conv.apply(v, x)),
        atol=5e-6,
        rtol=1e-5,
    )


def test_embed_prefolded_matches_nhwc():
    """The fused NCHW->s2d input fold equals the NHWC path (same params)."""
    import numpy as np
    from bubbleformer_tpu.layers.patching import HMLPEmbed

    rng = np.random.default_rng(3)
    x_nchw = jnp.asarray(rng.standard_normal((2, 4, 16, 16)).astype(np.float32))
    x_nhwc = jnp.transpose(x_nchw, (0, 2, 3, 1))
    b, c, hh, ww = x_nchw.shape
    folded = jnp.transpose(
        x_nchw.reshape(b, c, hh // 2, 2, ww // 2, 2), (0, 2, 4, 3, 5, 1)
    ).reshape(b, hh // 2, ww // 2, 4 * c)

    plain = HMLPEmbed(patch_size=4, in_channels=4, embed_dim=32)
    pre = HMLPEmbed(patch_size=4, in_channels=4, embed_dim=32, prefolded_input=True)
    v = plain.init(jax.random.key(0), x_nhwc)
    np.testing.assert_allclose(
        np.asarray(pre.apply(v, folded)),
        np.asarray(plain.apply(v, x_nhwc)),
        atol=1e-6, rtol=1e-6,
    )


def test_debed_emit_nchw_matches_transpose():
    """emit_nchw output equals transposing the NHWC output (same params)."""
    import numpy as np
    from bubbleformer_tpu.layers.patching import HMLPDebed

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 32)).astype(np.float32))
    plain = HMLPDebed(patch_size=4, out_channels=3, embed_dim=32)
    nchw = HMLPDebed(patch_size=4, out_channels=3, embed_dim=32, emit_nchw=True)
    v = plain.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(nchw.apply(v, x)),
        np.asarray(jnp.transpose(plain.apply(v, x), (0, 3, 1, 2))),
        atol=1e-6, rtol=1e-6,
    )
