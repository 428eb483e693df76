"""Model-level tests: registry + forward shapes for every model family
(mirroring reference ``models/tests/test_get_model.py`` and adding the
FiLMAViT coverage the reference lacks), plus scan-vs-unrolled equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bubbleformer_tpu.models import get_model, list_models

TINY = dict(
    input_fields=4,
    output_fields=4,
    time_window=5,
    patch_size=4,
    embed_dim=24,
    num_heads=4,
    processor_blocks=2,
    drop_path=0.2,
)


def test_registry():
    names = list_models()
    for expected in ("avit", "filmavit", "unet_modern", "unet_classic"):
        assert expected in names
    with pytest.raises(KeyError):
        get_model("nonexistent_model")


@pytest.mark.parametrize("attn_scale", [True, False])
@pytest.mark.parametrize("feat_scale", [True, False])
def test_avit_forward(attn_scale, feat_scale):
    model = get_model("avit", attn_scale=attn_scale, feat_scale=feat_scale, **TINY)
    x = jnp.ones((2, 5, 4, 16, 16))
    v = model.init({"params": jax.random.key(0)}, x)
    assert model.apply(v, x).shape == (2, 5, 4, 16, 16)


def test_avit_output_fields_differ():
    cfg = dict(TINY)
    cfg["output_fields"] = 3
    model = get_model("avit", **cfg)
    x = jnp.ones((2, 5, 4, 16, 16))
    v = model.init({"params": jax.random.key(0)}, x)
    assert model.apply(v, x).shape == (2, 5, 3, 16, 16)


def test_avit_nonsquare_grid():
    model = get_model("avit", **TINY)
    x = jnp.ones((1, 5, 4, 16, 32))
    v = model.init({"params": jax.random.key(0)}, x)
    assert model.apply(v, x).shape == (1, 5, 4, 16, 32)


def test_filmavit_forward():
    model = get_model("filmavit", num_fluid_params=9, **TINY)
    x = jnp.ones((2, 5, 4, 16, 16))
    cond = jnp.ones((2, 9))
    v = model.init({"params": jax.random.key(0)}, x, cond)
    assert model.apply(v, x, cond).shape == (2, 5, 4, 16, 16)
    # Conditioning must matter (distinct normalized directions — note a
    # constant vector LayerNorms to zero, so scaling ones would be a no-op).
    c1 = jax.random.normal(jax.random.key(2), (2, 9))
    c2 = jax.random.normal(jax.random.key(3), (2, 9))
    y1 = model.apply(v, x, c1)
    y2 = model.apply(v, x, c2)
    assert float(jnp.abs(y1 - y2).max()) > 1e-6


def test_scan_matches_unrolled():
    """nn.scan over blocks must be numerically identical to the unrolled stack."""
    cfg = dict(TINY, drop_path=0.0)
    scan_model = get_model("avit", scan_blocks=True, remat=False, **cfg)
    loop_model = get_model("avit", scan_blocks=False, remat=False, **cfg)
    x = jax.random.normal(jax.random.key(1), (1, 5, 4, 16, 16))

    v_scan = scan_model.init({"params": jax.random.key(0)}, x)

    # Map scanned params (leading layer axis) onto the unrolled block names.
    p = v_scan["params"]
    unrolled = {k: v for k, v in p.items() if k != "blocks"}
    for i in range(cfg["processor_blocks"]):
        unrolled[f"block{i}"] = jax.tree.map(lambda a: a[i], p["blocks"])

    y_scan = scan_model.apply(v_scan, x)
    y_loop = loop_model.apply({"params": unrolled}, x)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_loop), atol=1e-5, rtol=1e-4)


def test_droppath_active_in_train_mode():
    model = get_model("avit", **dict(TINY, drop_path=0.9))
    x = jax.random.normal(jax.random.key(0), (4, 5, 4, 16, 16))
    v = model.init({"params": jax.random.key(0), "droppath": jax.random.key(1)}, x, train=True)
    y_eval = model.apply(v, x)
    y_train = model.apply(v, x, train=True, rngs={"droppath": jax.random.key(7)})
    assert float(jnp.abs(y_train - y_eval).max()) > 1e-6


def test_unet_modern_forward():
    model = get_model(
        "unet_modern",
        time_window=5,
        input_fields=4,
        output_fields=4,
        hidden_channels=8,
        ch_mults=[1, 2, 2],
        norm=True,
    )
    x = jnp.ones((2, 5, 4, 16, 16))
    v = model.init(jax.random.key(0), x)
    assert model.apply(v, x).shape == (2, 5, 4, 16, 16)


def test_unet_classic_forward():
    model = get_model(
        "unet_classic", time_window=5, input_fields=4, output_fields=4, hidden_channels=8
    )
    x = jnp.ones((2, 5, 4, 16, 16))
    v = model.init(jax.random.key(0), x)
    assert model.apply(v, x).shape == (2, 5, 4, 16, 16)
    # batch_stats update in train mode
    y, mutated = model.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 5, 4, 16, 16)
    assert "batch_stats" in mutated


def test_filmavit_per_block():
    model = get_model(
        "filmavit", num_fluid_params=9, film_per_block=True, **TINY
    )
    x = jnp.ones((2, 5, 4, 16, 16))
    cond = jax.random.normal(jax.random.key(0), (2, 9))
    v = model.init({"params": jax.random.key(1)}, x, cond)
    assert model.apply(v, x, cond).shape == (2, 5, 4, 16, 16)
    assert "film_block0" in v["params"] and "film_block1" in v["params"]
