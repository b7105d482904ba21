"""Test config: force a virtual 8-device CPU backend.

This is the TPU-native analogue of the reference's "multi-node without a
cluster" gap (SURVEY.md §4): SPMD code paths are exercised on fake devices.

Note: the execution environment's ``sitecustomize`` imports jax at interpreter
startup (registering a remote-TPU backend), so ``JAX_PLATFORMS`` in the
environment is read before conftest runs — we must switch platforms through
``jax.config`` instead.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
