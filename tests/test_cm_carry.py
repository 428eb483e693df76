"""Channel-major carry (models/axial_vit.py carry="cm") equivalence.

The cm carry keeps processor-stack activations in the lane-major kernels'
native (C, B, T, N) layout (one boundary transpose per direction instead of
four per block).  These tests pin it to the channels-last carry: identical
parameter trees, matching forward outputs and matching parameter gradients —
on CPU the kernels run in interpret mode, so this exercises the exact
pallas programs the TPU path uses.

Archived (round 4): the cm carry measured SLOWER end-to-end (172 vs
115.6 ms, DESIGN.md) and ``carry='auto'`` resolves to nhwc — a recorded
negative result.  The goldens stay runnable via ``-m superseded``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.superseded  # cm carry lost end-to-end; kept as recorded negative

from bubbleformer_tpu.models import AViT, FiLMAViT

# Small dims that satisfy the flat temporal kernel's lane alignment
# (t * h/p * w/p multiple of 128) so the same config is TPU-valid.
KW = dict(
    input_fields=2,
    output_fields=2,
    time_window=2,
    patch_size=4,
    embed_dim=16,
    num_heads=4,
    processor_blocks=2,
    drop_path=0.1,
)
B, HH, WW = 2, 32, 32  # token grid 8x8, tn = 2*64 = 128


def _models(scan_blocks=False, film=False):
    cls = FiLMAViT if film else AViT
    extra = dict(num_fluid_params=3) if film else {}
    m_ref = cls(carry="nhwc", scan_blocks=scan_blocks, **KW, **extra)
    m_cm = cls(carry="cm", scan_blocks=scan_blocks, **KW, **extra)
    return m_ref, m_cm


def _data(film=False):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, KW["time_window"], KW["input_fields"], HH, WW).astype(np.float32))
    if film:
        cond = jnp.asarray(rng.randn(B, 3).astype(np.float32))
        return (x, cond)
    return (x,)


def test_param_trees_identical():
    m_ref, m_cm = _models()
    (x,) = _data()
    v1 = m_ref.init({"params": jax.random.key(0)}, x)
    v2 = m_cm.init({"params": jax.random.key(0)}, x)
    p1 = jax.tree_util.tree_map(np.asarray, v1["params"])
    p2 = jax.tree_util.tree_map(np.asarray, v2["params"])
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = jax.tree_util.tree_leaves_with_path(p2)
    assert [k for k, _ in flat1] == [k for k, _ in flat2]
    for (k, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(a, b, err_msg=str(k))


@pytest.mark.parametrize("scan_blocks", [False, True])
def test_forward_matches_nhwc(scan_blocks):
    m_ref, m_cm = _models(scan_blocks=scan_blocks)
    (x,) = _data()
    variables = m_ref.init({"params": jax.random.key(0)}, x)
    out_ref = m_ref.apply(variables, x)
    out_cm = m_cm.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_cm), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )


def test_grads_match_nhwc():
    m_ref, m_cm = _models()
    (x,) = _data()
    variables = m_ref.init({"params": jax.random.key(0)}, x)

    def loss(params, model):
        return jnp.mean(model.apply({"params": params}, x) ** 2)

    g_ref = jax.grad(loss)(variables["params"], m_ref)
    g_cm = jax.grad(loss)(variables["params"], m_cm)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_cm = jax.tree_util.tree_leaves_with_path(g_cm)
    for (k, a), (_, b) in zip(flat_ref, flat_cm):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-5,
            err_msg=str(k),
        )


def test_film_forward_matches():
    m_ref, m_cm = _models(film=True)
    x, cond = _data(film=True)
    variables = m_ref.init({"params": jax.random.key(0)}, x, cond)
    out_ref = m_ref.apply(variables, x, cond)
    out_cm = m_cm.apply(variables, x, cond)
    np.testing.assert_allclose(
        np.asarray(out_cm), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )


def test_droppath_train_mode_runs():
    _, m_cm = _models()
    (x,) = _data()
    variables = m_cm.init({"params": jax.random.key(0)}, x)
    out = m_cm.apply(
        variables, x, train=True, rngs={"droppath": jax.random.key(1)}
    )
    assert np.isfinite(np.asarray(out)).all()
