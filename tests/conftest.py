"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4); numerical oracles
(scipy, numpy, float64) live on CPU anyway.

Note: this environment's sitecustomize registers the `axon` TPU backend and
programmatically sets ``jax_platforms=axon,cpu`` (overriding the env var),
so the CPU pin must go through ``jax.config.update`` before any backend
initializes.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test (subprocess/compile heavy)")
