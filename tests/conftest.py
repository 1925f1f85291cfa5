"""Test configuration: force CPU backend with 8 virtual devices.

The ambient environment pins JAX_PLATFORMS=axon (one real TPU chip); tests
run on CPU so they are hermetic and can emulate an 8-device mesh
(SURVEY.md §4).  NOTE: XLA_FLAGS=--xla_force_host_platform_device_count does
not work here — the axon plugin overrides platform selection — so we use the
jax config API before any backend is initialized.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_state():
    """Clear jit/compilation caches between test MODULES.

    The full suite compiles thousands of distinct executables in one
    process; past ~400 tests the accumulated XLA:CPU backend state
    segfaults inside backend_compile (observed deterministically at the
    same test in clean runs with 120 GB free, while every half-suite
    subset passes — round-5 finding).  Bounding the live-executable set
    per module keeps the process inside the backend's tested envelope;
    within a module, shared compiles still amortize.
    """
    yield
    jax.clear_caches()
