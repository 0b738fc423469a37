"""Test env: 8 simulated devices on the CPU backend (SURVEY.md §4.2).

Must run before any jax import: forces the CPU platform with 8 virtual
devices so all shard_map / pjit distribution tests exercise real collective
lowering without TPU hardware. The same code runs unchanged on a real v5e-8;
only the mesh constructor sees different devices.
"""

import os

# JAX_GOLDEN_TPU=1 leaves the real backend in place so the TPU-only golden
# perf checks (tests/bench/) can actually execute — use it ONLY as
#   JAX_GOLDEN_TPU=1 python -m pytest tests/bench -q
# (running the full CPU-mesh suite against one real chip is not supported).
_GOLDEN_TPU = os.environ.get("JAX_GOLDEN_TPU") == "1"

if not _GOLDEN_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

# the axon TPU plugin registers itself regardless of JAX_PLATFORMS; the config
# update below is what actually pins the test backend to simulated-CPU.
if not _GOLDEN_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_jit_accumulation():
    """r4: the full ~250-test suite segfaults INSIDE an XLA:CPU compile
    near its end (reproducibly at the same test, which passes standalone
    and in any smaller grouping, with >100 GB free) — accumulated JIT
    executables in one long-lived process trip a compiler crash. Clearing
    JAX's caches per test MODULE bounds the accumulation; modules keep
    their internal compile sharing (the expensive per-module kernels), so
    the wall-clock cost is small."""
    yield
    import jax as _jax

    _jax.clear_caches()
