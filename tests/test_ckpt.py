"""Checkpoint serialization: weights + full-state (optimizer) round trips."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from unet_torch_tpu import ckpt
from unet_torch_tpu.models.unet import UNet
from unet_torch_tpu.train.optim import make_optimizer
from unet_torch_tpu.train.state import TrainState
from unet_torch_tpu.train.steps import make_single_steps


def _make_state():
    model = UNet(1, 1, base=4)
    tx = make_optimizer("Adam", 1e-3, 1e-4)
    x = jnp.zeros((1, 16, 16, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    return model, tx, state


def test_weights_roundtrip(tmp_path):
    _model, _tx, state = _make_state()
    path = str(tmp_path / "models" / "best.pt")
    ckpt.save_weights(path, state.params, state.batch_stats)
    payload = ckpt.load_weights(path)
    restored = ckpt.restore_into(state, payload)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_state_roundtrip_resumes_optimizer(tmp_path):
    model, tx, state = _make_state()
    step, _ = make_single_steps(model, tx, "dice_bce", "dice_bce", 1)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 1), jnp.float32)
    y = jnp.asarray((rng.rand(2, 16, 16) > 0.5), jnp.float32)
    for _ in range(3):
        state, _loss = step(state, x, y, 1e-3, jax.random.key(1))

    path = str(tmp_path / "full.ckpt")
    ckpt.save_full(path, state)
    _model2, _tx2, fresh = _make_state()
    restored = ckpt.restore_full(path, fresh)
    assert int(restored.step) == 3
    # Adam moments restored exactly (the reference drops optimizer state)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # continuing from the restored state matches continuing the original
    s1, l1 = step(state, x, y, 1e-3, jax.random.key(2))
    s2, l2 = step(restored, x, y, 1e-3, jax.random.key(2))
    assert np.isclose(float(l1), float(l2), atol=1e-7)


def test_prefetch_to_device_preserves_batches(mesh):
    from unet_torch_tpu.core.mesh import prefetch_to_device

    rng = np.random.RandomState(0)
    batches = [(rng.randn(8, 4, 4, 1).astype(np.float32),
                rng.randn(8, 4, 4).astype(np.float32)) for _ in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh))
    assert len(out) == 5
    for (x, y), (xb, yb) in zip(batches, out):
        np.testing.assert_array_equal(x, np.asarray(xb))
        np.testing.assert_array_equal(y, np.asarray(yb))
