#!/usr/bin/env python3
"""Convert a reference Lightning ``.ckpt`` into an Orbax checkpoint.

Makes the reference's pretrained model zoo (Lightning checkpoints with a
``model.``-prefixed state_dict and normalization constants in
``hyper_parameters``, cf. ``scripts/inference.py:205-230`` and
``modules.py:57``) directly loadable by this framework's inference/training:

    python scripts/convert_reference_checkpoint.py \
        --ckpt hpc_ckpt_3.ckpt --patch-size 16 --blocks 12 --out converted/

The resulting directory restores with
``CheckpointManager.restore_params`` (forward outputs verified equal in
``tests/test_convert.py``).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="Lightning .ckpt path")
    ap.add_argument("--patch-size", type=int, default=16)
    ap.add_argument("--blocks", type=int, default=12)
    ap.add_argument("--out", required=True, help="output Orbax checkpoint dir")
    args = ap.parse_args()

    import torch

    from bubbleformer_tpu.training.checkpoint import CheckpointManager
    from bubbleformer_tpu.training.module import TrainState
    from bubbleformer_tpu.utils.convert import convert_avit_state_dict

    data = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    state_dict = data["state_dict"] if "state_dict" in data else data
    params = convert_avit_state_dict(
        state_dict,
        patch_size=args.patch_size,
        processor_blocks=args.blocks,
        strip_prefix="model.",
    )
    params = {k: _to_jnp(v) for k, v in params.items()}

    norm = None
    hp = data.get("hyper_parameters", {}) if isinstance(data, dict) else {}
    if "normalization_constants" in hp and hp["normalization_constants"]:
        diff, div = hp["normalization_constants"]
        norm = (dict(diff), dict(div))

    step = int(data.get("global_step", 0)) if isinstance(data, dict) else 0
    state = TrainState(
        step=jnp.asarray(step, jnp.int32), params=params, opt_state=(), batch_stats=None
    )
    ckpt = CheckpointManager(use_async=False)
    ckpt.save(args.out, state, norm)
    ckpt.wait()
    n = sum(np.asarray(x).size for x in _leaves(params))
    print(f"converted {n/1e6:.2f}M params -> {args.out}"
          + (f" (with normalization constants)" if norm else ""))


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
