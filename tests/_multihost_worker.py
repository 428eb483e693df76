"""Worker for the 2-process localhost bootstrap test.

Launched by ``tests/test_distributed.py::test_two_process_bootstrap`` with
emulated SLURM rank variables (the same launcher environment the reference
relies on, ``reference/scripts/train.py:23-33,166``).  Verifies that
``initialize_distributed`` wires a real 2-process world *before* backend
init, and that a cross-process collective produces the global answer.
"""
import os
import sys

import jax

# CPU backend, 1 device per process (in-process: env vars alone are
# overridden by the installed TPU plugin).
jax.config.update("jax_platforms", "cpu")

from bubbleformer_tpu.parallel import initialize_distributed, is_leader, make_mesh

initialize_distributed()

rank = int(os.environ["SLURM_PROCID"])
assert jax.process_count() == 2, f"process_count {jax.process_count()} != 2"
assert jax.process_index() == rank, (jax.process_index(), rank)
assert is_leader() == (rank == 0)

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(data=2)
sharding = NamedSharding(mesh, P("data"))
local = np.array([float(rank + 1)], dtype=np.float32)
garr = jax.make_array_from_process_local_data(sharding, local, global_shape=(2,))
total = jax.jit(
    lambda x: x.sum(), out_shardings=NamedSharding(mesh, P())
)(garr)
assert float(total) == 3.0, f"cross-process sum {float(total)} != 3.0"
print(f"worker {rank}: process_count=2 leader={is_leader()} psum=3.0 OK")
sys.exit(0)
