"""Parameter partitioning rules (tensor parallelism over the model axis).

Megatron-style head/width sharding for the attention blocks and MLPs:

* QKV projections (``input_head``) and MLP ``fc1`` are column-parallel —
  output features sharded over the ``model`` axis.  Because the QKV features
  are laid out heads-major (see ``layers/attention.py``), sharding the
  feature dim shards whole attention heads.
* Output projections (``output_head``) and MLP ``fc2`` are row-parallel —
  input features sharded; GSPMD inserts the reduce.
* Everything else (norms, biases of row-parallel layers, patch pyramid,
  position-bias tables) is replicated.

Scanned block parameters carry a leading ``layers`` axis which is never
sharded.  The rules are applied by parameter-path suffix so they work for
both scanned and unrolled stacks.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bubbleformer_tpu.parallel.mesh import MODEL_AXIS

COLUMN_PARALLEL = ("input_head", "fc1")
ROW_PARALLEL = ("output_head", "fc2")


def param_partition_spec(path: tuple, value: Any) -> P:
    """PartitionSpec for one parameter, by (module, param) path suffix."""
    names = [getattr(k, "key", str(k)) for k in path]
    ndim = value.ndim
    if len(names) >= 2:
        module, leaf = names[-2], names[-1]
        if module in COLUMN_PARALLEL:
            # kernel (..., in, out) / bias (..., out): shard last dim.
            return P(*([None] * (ndim - 1)), MODEL_AXIS)
        if module in ROW_PARALLEL:
            if leaf == "kernel" and ndim >= 2:
                # kernel (..., in, out): shard the input (second-to-last) dim.
                return P(*([None] * (ndim - 2)), MODEL_AXIS, None)
            return P()  # row-parallel bias replicated
    return P()


def infer_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching ``params``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {path: param_partition_spec(path, leaf) for path, leaf in flat}

    def to_sharding(path, leaf):
        return NamedSharding(mesh, specs[path])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree onto the mesh under the partition rules."""
    shardings = infer_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
