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

import jax

jax.config.update("jax_platforms", "cpu")
