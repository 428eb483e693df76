"""Convert reference (torch Lightning) AViT/FiLMAViT checkpoints to our params.

The reference publishes pretrained checkpoints (model-zoo, Lightning
``.ckpt`` with a ``model.``-prefixed state_dict, cf.
``scripts/inference.py:222-228``).  This module maps that state_dict onto
this framework's parameter pytree so the model zoo is usable directly:

* Conv2d ``(O, I, kh, kw)`` -> flax Conv kernel ``(kh, kw, I, O)``
* ConvTranspose2d ``(I, O, kh, kw)`` -> flax ConvTranspose kernel:
  - ``transpose_kernel=False`` (HMLPDebed): spatially flipped,
    ``w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)``
  - ``transpose_kernel=True``: ``w.transpose(2, 3, 1, 0)``
  (both verified numerically against torch)
* Linear ``(O, I)`` -> Dense kernel ``(I, O)``
* InstanceNorm/LayerNorm weight/bias -> scale/bias
* fused QKV 1x1 convs: both layouts are heads-major with (q, k, v) thirds
  per head, so a plain transpose suffices
* ``attn_scale_factor`` ``(1, heads, 1, 1)`` -> ``(heads,)``

Verified end-to-end by ``tests/test_convert.py``: a reference model's
forward pass equals ours under converted weights.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _convT_flipped(w) -> np.ndarray:
    return _np(w)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()


def _linear(w) -> np.ndarray:
    return _np(w).T.copy()


def _conv1x1(w) -> np.ndarray:
    return _np(w)[:, :, 0, 0].T.copy()


def _norm(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _attention_block(sd: Dict, p: str, axial: bool) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "input_head": {
            "kernel": _conv1x1(sd[f"{p}.input_head.weight"]),
            "bias": _np(sd[f"{p}.input_head.bias"]),
        },
        "output_head": {
            "kernel": _conv1x1(sd[f"{p}.output_head.weight"]),
            "bias": _np(sd[f"{p}.output_head.bias"]),
        },
        "qnorm": _norm(sd, f"{p}.qnorm"),
        "knorm": _norm(sd, f"{p}.knorm"),
    }
    rel_key = f"{p}.rel_pos_bias.relative_attention_bias.weight"
    if rel_key in sd:
        out["RelativePositionBias_0"] = {"embedding": _np(sd[rel_key])}
    cont_key = f"{p}.rel_pos_bias.cpb_mlp.0.weight"
    if cont_key in sd:
        out["ContinuousPositionBias1D_0"] = {
            "fc1": {
                "kernel": _linear(sd[cont_key]),
                "bias": _np(sd[f"{p}.rel_pos_bias.cpb_mlp.0.bias"]),
            },
            "fc2": {"kernel": _linear(sd[f"{p}.rel_pos_bias.cpb_mlp.2.weight"])},
        }
    if axial:
        out["gamma_att"] = _np(sd[f"{p}.gamma_att"])
        out["gamma_mlp"] = _np(sd[f"{p}.gamma_mlp"])
        if f"{p}.attn_scale_factor_x" in sd:
            out["attn_scale_factor_x"] = _np(sd[f"{p}.attn_scale_factor_x"]).reshape(-1)
            out["attn_scale_factor_y"] = _np(sd[f"{p}.attn_scale_factor_y"]).reshape(-1)
        if f"{p}.low_freq_scalar" in sd:
            out["low_freq_scalar"] = _np(sd[f"{p}.low_freq_scalar"])
            out["high_freq_scalar"] = _np(sd[f"{p}.high_freq_scalar"])
        out["mlp"] = {
            "fc1": {
                "kernel": _linear(sd[f"{p}.mlp.fc1.weight"]),
                "bias": _np(sd[f"{p}.mlp.fc1.bias"]),
            },
            "fc2": {
                "kernel": _linear(sd[f"{p}.mlp.fc2.weight"]),
                "bias": _np(sd[f"{p}.mlp.fc2.bias"]),
            },
        }
        out["mlp_norm"] = _norm(sd, f"{p}.mlp_norm")
    else:
        out["gamma"] = _np(sd[f"{p}.gamma"])
        if f"{p}.attn_scale_factor" in sd:
            out["attn_scale_factor"] = _np(sd[f"{p}.attn_scale_factor"]).reshape(-1)
    return out


def _pyramid(sd: Dict, prefix: str, num_stages: int, transposed: bool) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in range(num_stages):
        conv_idx = 3 * i
        w = sd[f"{prefix}.{conv_idx}.weight"]
        if transposed:
            out[f"deconv{i}"] = {"kernel": _convT_flipped(w)}
            # Debed has norms *between* stages only (none after the last).
            if i < num_stages - 1:
                out[f"norm{i}"] = _norm(sd, f"{prefix}.{conv_idx + 1}")
        else:
            out[f"conv{i}"] = {"kernel": _conv(w)}
            out[f"norm{i}"] = _norm(sd, f"{prefix}.{conv_idx + 1}")
    return out


def convert_avit_state_dict(
    state_dict: Dict[str, Any],
    patch_size: int,
    processor_blocks: int,
    strip_prefix: str = "",
) -> Dict[str, Any]:
    """Reference AViT/FiLMAViT state_dict -> our unrolled param pytree."""
    sd = {
        (k[len(strip_prefix):] if strip_prefix and k.startswith(strip_prefix) else k): v
        for k, v in state_dict.items()
    }
    n_stages = int(math.log2(patch_size))

    params: Dict[str, Any] = {
        "embed": _pyramid(sd, "embed.in_proj", n_stages, transposed=False),
        "debed": _pyramid(sd, "debed.out_proj", n_stages, transposed=True),
    }
    for i in range(processor_blocks):
        params[f"block{i}"] = {
            "temporal": _attention_block(sd, f"blocks.{i}.temporal", axial=False),
            "spatial": _attention_block(sd, f"blocks.{i}.spatial", axial=True),
        }
    if "film_embed.film_net.0.weight" in sd:
        params["film_embed"] = {
            "norm": _norm(sd, "film_embed.film_net.0"),
            "proj": {
                "kernel": _linear(sd["film_embed.film_net.1.weight"]),
                "bias": _np(sd["film_embed.film_net.1.bias"]),
            },
        }
    return params
