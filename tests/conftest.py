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
