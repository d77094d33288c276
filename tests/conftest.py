"""Test harness config: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the single-chip TPU backend before
pytest starts, so plain env vars are too late; ``jax.config.update`` after
import still switches the backend as long as no computation has run.
All tests therefore run on 8 virtual CPU devices — multi-chip sharding
paths (DP mesh, row-sharded embeddings, all-to-all exchange) are exercised
for real, per SURVEY.md §4.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs
