"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (standard JAX practice; the driver separately
dry-runs the multi-chip path). Must run before jax is imported."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (a remote TPU
# tunnel) and a sitecustomize imports jax at interpreter startup, so both the
# env var AND jax.config must be set here, before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (dozens of
# distinct jitted configs); repeat runs hit the disk cache.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_desc():
    from cosc_4397_pathtracing_raytracing_project_tpu.scene import load_scene_desc

    return load_scene_desc(os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.txt"))


@pytest.fixture(scope="session")
def cornell_scene(cornell_desc):
    from cosc_4397_pathtracing_raytracing_project_tpu.scene import Scene

    return Scene.from_desc(cornell_desc)


@pytest.fixture(scope="session")
def sphere_desc():
    from cosc_4397_pathtracing_raytracing_project_tpu.scene import load_scene_desc

    return load_scene_desc(os.path.join(os.path.dirname(__file__), "..", "scenes", "sphere.txt"))


@pytest.fixture
def rng_np():
    return np.random.default_rng(42)
