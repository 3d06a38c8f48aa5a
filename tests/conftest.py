"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a host-platform device mesh exactly as the driver's
``dryrun_multichip`` does.  x64 is enabled so physics invariants can be
checked at reference (double) precision where needed; production TPU runs
use float32/bfloat16.
"""

import os

# explicit assignment: the parent env presets JAX_PLATFORMS=axon (TPU
# tunnel) and setdefault would NOT override it
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def fixture_dir():
    d = REFERENCE / "tests"
    if not d.exists():
        pytest.skip("reference fixtures unavailable")
    return d
