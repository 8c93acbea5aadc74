"""Test configuration: force an 8-device virtual CPU platform so shard_map /
psum multi-chip paths run without a TPU slice (SURVEY.md §4's TPU-native
analogue of a fake NCCL backend)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when axon/TPU is present
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent compilation cache makes repeated test runs fast
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# a sitecustomize may force jax_platforms to the TPU backend, overriding the
# env var — force CPU again at config level
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def small_geom():
    from gnn_fluid_dynamics_tpu.data.synthetic import make_geometry
    return make_geometry("structured", nx=8, ny=4)


@pytest.fixture(scope="session")
def tg_fields(small_geom):
    from gnn_fluid_dynamics_tpu.data.synthetic import taylor_green_trajectory
    return taylor_green_trajectory(small_geom, num_timesteps=6, dt=0.01)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
