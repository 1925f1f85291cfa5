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
