"""Test harness config: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the single-chip TPU backend before
pytest starts, so plain env vars are too late; ``jax.config.update`` after
import still switches the backend as long as no computation has run.
All tests therefore run on 8 virtual CPU devices — multi-chip sharding
paths (DP mesh, row-sharded embeddings, all-to-all exchange) are exercised
for real, per SURVEY.md §4.
"""

import os
import re

# Force EXACTLY 8 virtual devices — an inherited XLA_FLAGS with a
# different count would silently skip the eight_devices-gated tests and
# hard-fail the unguarded 4x2-mesh ones, so replace any existing value
# rather than merely checking the flag name's presence.
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count=8" not in _flags:
    _flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", _flags)
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

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
