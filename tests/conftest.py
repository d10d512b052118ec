"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so sharding paths can be
exercised without TPU hardware (SURVEY.md §4).

NOTE: this environment ships an `axon` TPU-tunnel plugin that *overrides* the
``JAX_PLATFORMS`` environment variable at import time; only
``jax.config.update("jax_platforms", "cpu")`` reliably forces the local CPU
backend, so that is what we use (env vars are set too, for subprocesses).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: each fresh XLA compile costs ~0.5s on this
# 2-vCPU box; caching makes repeat pytest runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_random_scene(rng, num_tris=64, spread=10.0):
    """A cloud of random triangles (helper shared by tests)."""
    import lidar_brdf_tpu.io.synthetic as synthetic
    return synthetic.random_triangles(rng, num_tris=num_tris, spread=spread)
