"""Golden tests of LpLoss / eikonal / schedulers against the reference torch
implementations."""
import jax.numpy as jnp
import numpy as np
import pytest

from tests._reference import load_reference_module, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


@requires_reference
@pytest.mark.parametrize(
    "d,p,reduce_dims,reductions",
    [
        (2, 2, [0, 1, 2], ["mean", "mean", "sum"]),  # training criterion
        (2, 2, [0, 1], ["mean", "mean"]),  # inference criterion
        (1, 2, 0, "sum"),
        (3, 2, [0], ["mean"]),
    ],
)
def test_lp_loss_golden(d, p, reduce_dims, reductions):
    import torch

    ref = load_reference_module("ref_losses", "bubbleformer/utils/losses.py")
    from bubbleformer_tpu.utils.losses import LpLoss

    rng = np.random.default_rng(0)
    pred = rng.standard_normal((2, 5, 4, 8, 8)).astype(np.float32)
    tgt = rng.standard_normal((2, 5, 4, 8, 8)).astype(np.float32)

    ours = LpLoss(d=d, p=p, reduce_dims=reduce_dims, reductions=reductions)
    out_j = np.asarray(ours(jnp.asarray(pred), jnp.asarray(tgt)))

    theirs = ref.LpLoss(d=d, p=p, reduce_dims=reduce_dims, reductions=reductions)
    out_t = theirs(torch.from_numpy(pred), torch.from_numpy(tgt)).numpy()
    np.testing.assert_allclose(out_j, out_t, atol=1e-5, rtol=1e-4)


@requires_reference
def test_eikonal_golden():
    import torch

    ref = load_reference_module("ref_losses2", "bubbleformer/utils/losses.py")
    from bubbleformer_tpu.utils.losses import eikonal_loss

    rng = np.random.default_rng(1)
    phi = rng.standard_normal((2, 5, 16, 16)).astype(np.float32)
    out_j = float(eikonal_loss(jnp.asarray(phi)))
    out_t = float(ref.eikonal_loss(torch.from_numpy(phi)))
    np.testing.assert_allclose(out_j, out_t, atol=1e-5, rtol=1e-4)


def test_eikonal_on_perfect_sdf():
    """A plane SDF has |grad| = 1 everywhere -> zero residual."""
    from bubbleformer_tpu.utils.losses import eikonal_loss

    ys = np.arange(32) / 32.0
    phi = np.broadcast_to(ys[:, None], (32, 32)).astype(np.float32)
    assert float(eikonal_loss(jnp.asarray(phi)[None])) < 1e-10


@requires_reference
@pytest.mark.parametrize("name", ["cosine", "cosine_warmup"])
def test_schedulers_golden(name):
    import torch

    ref = load_reference_module("ref_sched", "bubbleformer/utils/lr_schedulers.py")
    from bubbleformer_tpu.utils.schedulers import make_schedule

    base_lr, eta_min, warmup, total = 1e-3, 1e-6, 10, 100
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    if name == "cosine":
        tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=total, eta_min=eta_min)
        jsched = make_schedule("cosine", base_lr, total, eta_min=eta_min)
    else:
        tsched = ref.CosineWarmupLR(opt, warmup_iters=warmup, max_iters=total, eta_min=eta_min)
        jsched = make_schedule(
            "cosine_warmup", base_lr, total, warmup_iters=warmup, eta_min=eta_min
        )

    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()
    jax_lrs = [float(jsched(t)) for t in range(total)]
    np.testing.assert_allclose(jax_lrs, torch_lrs, atol=1e-9, rtol=1e-5)


def test_heatflux_matches_reference_formula():
    from bubbleformer_tpu.utils.heatflux import heatflux, heatflux_jax

    rng = np.random.default_rng(2)
    dfun = rng.standard_normal((3, 512, 512)).astype(np.float32)
    temp = rng.uniform(50, 70, (3, 512, 512)).astype(np.float32)
    mean_np, max_np = heatflux(dfun, temp, heater_temp=90)
    mean_j, max_j = heatflux_jax(jnp.asarray(dfun), jnp.asarray(temp), heater_temp=90)
    np.testing.assert_allclose(mean_np, float(mean_j), rtol=1e-4)
    np.testing.assert_allclose(max_np, float(max_j), rtol=1e-4)


@requires_reference
def test_heatflux_golden_vs_reference():
    ref = load_reference_module("ref_heatflux", "bubbleformer/utils/heatflux.py")
    from bubbleformer_tpu.utils.heatflux import heatflux

    rng = np.random.default_rng(3)
    dfun = rng.standard_normal((4, 512, 512)).astype(np.float32)
    temp = rng.uniform(50, 70, (4, 512, 512)).astype(np.float32)
    ref_mean, ref_max = ref.heatflux(dfun, temp, heater_temp=90)
    our_mean, our_max = heatflux(dfun, temp, heater_temp=90)
    np.testing.assert_allclose(our_mean, ref_mean, rtol=1e-6)
    np.testing.assert_allclose(our_max, ref_max, rtol=1e-6)


def test_heatflux_kl_divergence_sanity():
    from bubbleformer_tpu.utils.metrics import heatflux_kl_divergence

    rng = np.random.default_rng(4)
    a = rng.normal(0.0, 1.0, 500)
    same = heatflux_kl_divergence(a, a + rng.normal(0, 1e-3, 500))
    shifted = heatflux_kl_divergence(a, a + 3.0)
    assert same < 0.01
    assert shifted > same


@pytest.mark.superseded  # layout pin regressed the step 107->120 ms (DESIGN.md); recorded negative
def test_pallas_lp_loss_matches_reference():
    """ops/lp_loss.py (the TPU layout-pinning kernel) == LpLoss with the
    training reduce config, value and pred-gradient (interpret mode)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bubbleformer_tpu.ops.lp_loss import training_lp_loss
    from bubbleformer_tpu.utils.losses import LpLoss

    rng = np.random.default_rng(17)
    pred = jnp.asarray(rng.standard_normal((2, 3, 4, 16, 24)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((2, 3, 4, 16, 24)).astype(np.float32))
    ref = LpLoss(d=2, p=2, reduce_dims=[0, 1, 2], reductions=["mean", "mean", "sum"])

    v_k = float(training_lp_loss(pred, tgt))
    v_r = float(ref(pred, tgt))
    np.testing.assert_allclose(v_k, v_r, rtol=1e-6)

    g_k = jax.grad(lambda p: training_lp_loss(p, tgt))(pred)
    g_r = jax.grad(lambda p: ref(p, tgt))(pred)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r), atol=1e-6, rtol=1e-5)
