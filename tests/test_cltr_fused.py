"""Fused (on-device auction matching) CLTR step vs the two-phase host path."""

import numpy as np

import jax
import jax.numpy as jnp

from unet_torch_tpu.models.cltr import (
    ConditionalDETR,
    SetCriterion,
    build_weight_dict,
    pad_targets,
)
from unet_torch_tpu.train.cltr_steps import (
    make_cltr_fused_step,
    make_cltr_steps,
)
from unet_torch_tpu.train.optim import make_optimizer
from unet_torch_tpu.train.state import TrainState


def test_fused_step_matches_host_path():
    model = ConditionalDETR(num_queries=16, hidden_dim=32, nheads=4,
                            enc_layers=1, dec_layers=2, dim_feedforward=64,
                            dropout_rate=0.0)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    crit = SetCriterion(num_classes=2,
                        weight_dict=build_weight_dict(dec_layers=2))
    tx = make_optimizer("Adam", 1e-4, 0.0)

    rng0 = np.random.RandomState(1)
    targets = [{"labels": np.ones(3, np.int64),
                "points": rng0.rand(3, 3).astype(np.float32),
                "points_macher": rng0.rand(3, 3).astype(np.float32)}]
    labels, points, _, valid = pad_targets(targets, 8, 3)
    la, po, va = (jnp.asarray(labels), jnp.asarray(points),
                  jnp.asarray(valid))
    rng = jax.random.key(7)

    def fresh_state():
        # deep-copy: the donated step deletes its input buffers
        return TrainState.create(
            jax.tree_util.tree_map(jnp.copy, variables["params"]),
            jax.tree_util.tree_map(jnp.copy,
                                   variables.get("batch_stats", {})), tx)

    # host path
    state_h = fresh_state()
    cost_step, update_step, _ = make_cltr_steps(model, crit, tx)
    costs = cost_step(state_h, x, la, po, va, rng)
    match = crit.hungarian(np.asarray(costs), valid.sum(1))
    state_h, loss_h, dict_h = update_step(state_h, x, la, po, va,
                                          jnp.asarray(match), 1e-4, rng)

    # fused path
    state_f = fresh_state()
    fused = make_cltr_fused_step(model, crit, tx)
    state_f, loss_f, dict_f = fused(state_f, x, la, po, va, 1e-4, rng)

    # identical dropout rng + optimal matchings -> same loss (ties aside)
    assert np.isclose(float(loss_h), float(loss_f), rtol=1e-4)
    ph = jax.tree_util.tree_leaves(state_h.params)
    pf = jax.tree_util.tree_leaves(state_f.params)
    for a, b in zip(ph, pf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
