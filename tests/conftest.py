"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must run before jax initializes its backend: the image's sitecustomize pins
JAX_PLATFORMS=axon (single tunneled TPU); tests force CPU and fake 8 devices so
multi-chip sharding logic is exercised without hardware (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

# The image's sitecustomize imports jax (axon TPU plugin) before conftest runs,
# so the env var alone is too late — force the platform through the config too.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall-clock on this 1-vCPU
# host is dominated by CPU XLA compiles (cold 29 min vs ~12-min target,
# VERDICT r4 item 5).  The cache survives across processes/sessions, so
# every run after the first skips recompiling unchanged jit signatures.
# Trace/lowering still runs (not cacheable); compile is the big half.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/unet_torch_tpu_test_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def mesh():
    import jax
    from unet_torch_tpu.core.mesh import make_mesh

    assert len(jax.devices()) == 8
    return make_mesh()


@pytest.fixture()
def mesh1():
    """Single-device mesh (fast paths)."""
    import jax
    from unet_torch_tpu.core.mesh import make_mesh

    return make_mesh(n_data=1, devices=jax.devices()[:1])
