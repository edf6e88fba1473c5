"""Data-parallel training over the virtual 8-device mesh: batches shard, the
train step runs SPMD, and gradients agree with single-device execution."""

import numpy as np

import jax
import jax.numpy as jnp

from unet_torch_tpu.core.mesh import (
    data_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from unet_torch_tpu.models.unet import UNet
from unet_torch_tpu.train.optim import make_optimizer
from unet_torch_tpu.train.state import TrainState
from unet_torch_tpu.train.steps import make_single_steps


def _setup(devices):
    model = UNet(3, 3, base=4)
    tx = make_optimizer("SGD", 1e-2, 0.0)
    rng = np.random.RandomState(0)
    x = np.asarray(rng.randn(8, 32, 32, 3), np.float32)
    y = np.asarray(rng.randint(0, 3, (8, 32, 32)), np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x[:1]),
                           train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step, _ = make_single_steps(model, tx, "dice_bce_mc", "dice_bce_mc", 3)
    return model, tx, state, step, x, y


def test_sharded_batch_placement(mesh):
    x = np.zeros((8, 16, 16, 3), np.float32)
    xb, = shard_batch(mesh, (x,))
    assert xb.sharding == data_sharding(mesh)
    # non-divisible batch replicates
    y = np.zeros((3, 16, 16), np.float32)
    yb, = shard_batch(mesh, (y,))
    assert yb.sharding == replicated_sharding(mesh)


def test_dp_matches_single_device(mesh):
    """The SPMD step over 8 shards must produce the same loss and parameters
    as the same step on one device (global-batch BN semantics hold)."""
    _, _, state1, step1, x, y = _setup(None)
    state1, loss1 = step1(state1, jnp.asarray(x), jnp.asarray(y), 1e-2,
                          jax.random.key(1))

    _, _, state8, step8, _, _ = _setup(None)
    state8 = jax.device_put(state8, replicated_sharding(mesh))
    xb, yb = shard_batch(mesh, (jnp.asarray(x), jnp.asarray(y)))
    state8, loss8 = step8(state8, xb, yb, 1e-2, jax.random.key(1))

    assert np.allclose(float(loss1), float(loss8), atol=1e-5)
    p1 = jax.tree_util.tree_leaves(state1.params)
    p8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_check_input_writes_grids(tmp_path):
    from unet_torch_tpu.data.loader import NumpyLoader
    from unet_torch_tpu.utils.debug import check_input

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return (rng.rand(16, 16, 3).astype(np.float32),
                    rng.randint(0, 2, (16, 16)).astype(np.int32))

    loaders = {"train": NumpyLoader(DS(), 2), "val": NumpyLoader(DS(), 2)}
    check_input(loaders, str(tmp_path))
    assert (tmp_path / "train_batch.png").exists()
    assert (tmp_path / "val_batch.png").exists()
