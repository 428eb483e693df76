"""End-to-end parity: the reference torch model's forward pass must equal
ours under converted weights — the strongest equivalence test in the suite.

The reference package is imported with a stubbed ``timm.layers.DropPath``
(identity in eval mode, which is all these tests exercise).
"""
import sys
import types

import numpy as np
import pytest

from tests._reference import REFERENCE_ROOT, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def reference_models():
    import torch

    timm = types.ModuleType("timm")
    timm_layers = types.ModuleType("timm.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    timm_layers.DropPath = DropPath
    timm.layers = timm_layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.layers", timm_layers)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from bubbleformer.models import get_model as ref_get_model

    return ref_get_model


TINY = dict(
    input_fields=4,
    output_fields=4,
    time_window=5,
    patch_size=4,
    embed_dim=24,
    num_heads=4,
    processor_blocks=2,
    drop_path=0.0,
)


@requires_reference
@pytest.mark.parametrize("attn_scale,feat_scale", [(True, True), (False, False)])
def test_avit_forward_parity(reference_models, attn_scale, feat_scale):
    import jax
    import jax.numpy as jnp
    import torch

    from bubbleformer_tpu.models import get_model
    from bubbleformer_tpu.utils.convert import convert_avit_state_dict

    torch.manual_seed(0)
    ref = reference_models(
        "avit", attn_scale=attn_scale, feat_scale=feat_scale, **TINY
    ).eval()

    params = convert_avit_state_dict(
        ref.state_dict(), patch_size=TINY["patch_size"], processor_blocks=2
    )
    ours = get_model(
        "avit", attn_scale=attn_scale, feat_scale=feat_scale, attn_impl="plain", **TINY
    )

    x = np.random.default_rng(0).standard_normal((2, 5, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    y_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_ours, y_ref, atol=2e-4, rtol=1e-3)


@requires_reference
def test_filmavit_forward_parity(reference_models):
    import jax.numpy as jnp
    import torch

    from bubbleformer_tpu.models import get_model
    from bubbleformer_tpu.utils.convert import convert_avit_state_dict

    torch.manual_seed(1)
    ref = reference_models("filmavit", num_fluid_params=9, **TINY).eval()
    params = convert_avit_state_dict(
        ref.state_dict(), patch_size=TINY["patch_size"], processor_blocks=2
    )
    ours = get_model("filmavit", num_fluid_params=9, attn_impl="plain", **TINY)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 4, 16, 16)).astype(np.float32)
    cond = rng.standard_normal((2, 9)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(cond)).numpy()
    y_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(cond)))
    np.testing.assert_allclose(y_ours, y_ref, atol=2e-4, rtol=1e-3)


@requires_reference
def test_lightning_prefix_stripping(reference_models):
    import torch

    from bubbleformer_tpu.utils.convert import convert_avit_state_dict

    torch.manual_seed(0)
    ref = reference_models("avit", **TINY).eval()
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    params = convert_avit_state_dict(
        sd, patch_size=TINY["patch_size"], processor_blocks=2, strip_prefix="model."
    )
    assert "embed" in params and "block1" in params
