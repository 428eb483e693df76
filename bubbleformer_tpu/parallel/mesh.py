"""Device mesh construction and batch shardings.

The reference's only distributed strategy is Lightning DDP over NCCL
(``scripts/train.py:159-166``).  The TPU-native replacement is a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model`` axis
for tensor parallelism over attention heads / MLP width); gradient reduction
becomes an XLA ``psum`` inserted by GSPMD — no communication library in user
code.

On multi-host TPU, call :func:`initialize_distributed` first; the mesh then
spans all processes' devices with the ``data`` axis laid out over ICI/DCN by
``jax.make_mesh``'s default device order.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SPATIAL_AXIS = "spatial"


def initialize_distributed() -> None:
    """Multi-host bootstrap (no-op on a single process).

    Replaces the reference's SLURM/Lightning process-group plumbing
    (``train.py:14,23-33,166``): on TPU pods, ``jax.distributed.initialize``
    discovers coordinator/topology from the runtime environment.

    Must run *before* any backend-touching JAX API (``jax.devices()``,
    ``jax.process_count()``, jit dispatch, ...): once the local backend is
    up, distributed init raises and every process would silently become its
    own single-process world (all hosts leader, duplicated data shards,
    clashing checkpoint writes).  Prior initialization is therefore detected
    from ``jax.distributed``'s own client state, and the decision to
    initialize comes from launcher environment variables — never from a
    backend query.
    """
    if jax.distributed.is_initialized():
        return  # distributed runtime already up
    env = os.environ
    multiprocess = (
        "JAX_COORDINATOR_ADDRESS" in env
        or "COORDINATOR_ADDRESS" in env
        or int(env.get("JAX_NUM_PROCESSES", env.get("SLURM_NTASKS", "1") or "1")) > 1
        # Multi-host TPU pod runtime (one process per host; plugins also set
        # this on single-host setups, so only >1 hostname counts).
        or len(env.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1
        or "MEGASCALE_COORDINATOR_ADDRESS" in env  # multi-slice
    )
    if not multiprocess:
        return  # single process: leave the backend alone
    jax.distributed.initialize()  # raises loudly on misconfiguration
    _startup_barrier()


def _startup_barrier() -> None:
    """Form the cross-process collective contexts while ranks are still
    coordinator-synchronized.

    ``jax.distributed.initialize`` barriers every process at the coordination
    service, but the backend's collective *contexts* (Gloo on CPU) are formed
    lazily by the first collective — whose key-value rendezvous has a hard
    ~30 s deadline.  Without an immediate barrier, the first collective runs
    only after per-rank dataset scans and XLA compiles, and on skewed hosts
    the ranks arrive minutes apart: the early rank times out in
    ``GetKeyValue(...) DEADLINE_EXCEEDED`` and the world collapses.  The
    reference never hits this because Lightning DDP's process-group
    rendezvous barriers all ranks before any work
    (``reference/scripts/train.py:159-166``).  One trivial device sync here
    makes context formation happen at the one moment ranks are provably
    together; later collectives reuse the contexts and simply block for
    their peers.
    """
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("bubbleformer:startup")


def is_leader() -> bool:
    """Leader gating for logging/checkpoint side effects."""
    return jax.process_index() == 0


def make_mesh(data: int = -1, model: int = 1, spatial: int = 1, devices=None) -> Mesh:
    """Build a (data, model[, spatial]) mesh; ``data=-1`` takes the remainder.

    The ``spatial`` axis implements sequence/spatial parallelism for very
    large grids: activations are sharded along the token-grid row dimension
    (see ``AViT.spatial_shard_axis``) and GSPMD inserts the all-gathers the
    column attention needs.  The reference has no SP (SURVEY.md §2.3); this
    is the TPU-native answer for grids that outgrow one chip's HBM.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        if n % (model * spatial) != 0:
            raise ValueError(f"{n} devices not divisible by model*spatial")
        data = n // (model * spatial)
    if data * model * spatial != n:
        raise ValueError(f"mesh {data}x{model}x{spatial} != {n} devices")
    if spatial == 1:
        return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))
    return Mesh(
        devices.reshape(data, model, spatial), (DATA_AXIS, MODEL_AXIS, SPATIAL_AXIS)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
