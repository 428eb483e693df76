"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md §4): XLA's host platform is split into 8 virtual devices so mesh /
sharding / collective tests exercise the real partitioning logic on CPU.

Must run before any test module imports jax functionality that initializes
the backend; the environment's axon TPU plugin is overridden in-process.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Share one persistent compilation cache across the whole suite, including
# the subprocess CLI e2e tests (they inherit the env var; jax honors it at
# backend init).  30+ min of a cold full-suite run on a 1-core host is XLA
# compile — cached executables bring reruns back to seconds.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_bubbleformer")
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
