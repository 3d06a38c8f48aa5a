"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a host-platform device mesh exactly as the driver's
``dryrun_multichip`` does.  x64 is enabled so physics invariants can be
checked at reference (double) precision; production TPU runs use
float32/bfloat16.

Platform forcing: this image's sitecustomize registers the axon TPU PJRT
plugin at interpreter startup and programmatically sets
``jax_platforms="axon,cpu"`` — env vars alone cannot override it, so we
update the jax config directly (before any backend is touched).  Without
this, "CPU" tests silently run on the tunneled TPU chip, where float64 is
f32-pair emulated (~49-bit mantissa) and reference-parity pins fail.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's cost is dominated by XLA:CPU
# compiles of the same step programs run-to-run; caching them on disk keeps
# the fast profile well under the 5-minute budget after the first run
# (code changes invalidate exactly the affected programs).
jax.config.update("jax_compilation_cache_dir", "/tmp/edm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}"
)
assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def fixture_dir():
    d = REFERENCE / "tests"
    if not d.exists():
        pytest.skip("reference fixtures unavailable")
    return d


@pytest.fixture(autouse=True)
def _clear_jax_caches_after_slow(request):
    """The slow profile compiles dozens of large interpret-mode Pallas
    programs in one process; XLA:CPU's accumulated compiler state has been
    observed to segfault a later compile deep into the sequence (the same
    test passes in isolation).  Dropping the jit caches between slow cases
    trades recompiles for a bounded compiler footprint."""
    yield
    if "slow" in request.keywords:
        jax.clear_caches()
