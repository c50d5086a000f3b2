"""Test configuration: force an 8-virtual-device CPU backend.

Multi-device sharding paths are exercised on an emulated 8-device CPU mesh
(the reference has no distributed tests at all — see SURVEY.md §4); real-TPU
benchmarking happens in bench.py, not the unit suite.
"""

import os
import sys

# Force CPU: the environment presets JAX_PLATFORMS=axon (real TPU via a
# tunnel) and its sitecustomize register() overrides the env var through
# jax.config, so we must override the config again here — before any
# backend initialization — and keep the axon plugin out of the test run.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, jax.devices()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_graph():
    from helpers_models import small_graph_cached

    return small_graph_cached()
