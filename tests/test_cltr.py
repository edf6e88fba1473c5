"""CLTR conditional-DETR: shapes, matching, criterion, one train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_torch_tpu.models.cltr import (
    ConditionalDETR,
    SetCriterion,
    build_weight_dict,
    pad_targets,
    sine_position_embedding,
)


def tiny_model(**kw):
    defaults = dict(num_queries=16, hidden_dim=32, nheads=4, enc_layers=1,
                    dec_layers=2, dim_feedforward=64, dropout_rate=0.0)
    defaults.update(kw)
    m = ConditionalDETR(**defaults)
    return m


@pytest.fixture(scope="module")
def model_and_vars():
    model = tiny_model()
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, 64, 64, 3))
    out = model.apply(variables, x, train=False)
    assert out["pred_logits"].shape == (2, 16, 2)
    assert out["pred_points"].shape == (2, 16, 3)
    assert len(out["aux_outputs"]) == 1  # dec_layers - 1
    assert np.isfinite(np.asarray(out["pred_points"])).all()
    assert (np.asarray(out["pred_points"]) >= 0).all()
    assert (np.asarray(out["pred_points"]) <= 1).all()


def test_sine_position_embedding_shape():
    mask = jnp.zeros((2, 8, 8), bool)
    pos = sine_position_embedding(mask, num_pos_feats=16)
    assert pos.shape == (2, 8, 8, 32)


def test_criterion_and_matching(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    jnp.float32)
    out = model.apply(variables, x, train=False)

    targets = [
        {"labels": np.ones(3, np.int64),
         "points": np.random.RandomState(1).rand(3, 3).astype(np.float32),
         "points_macher": np.random.RandomState(1).rand(3, 3).astype(
             np.float32)},
        {"labels": np.ones(0, np.int64),
         "points": np.zeros((0, 3), np.float32),
         "points_macher": np.zeros((0, 3), np.float32)},
    ]
    crit = SetCriterion(num_classes=2,
                        weight_dict=build_weight_dict(dec_layers=2))
    labels, points, mpoints, valid = pad_targets(targets, 8, 3)
    assert valid.sum() == 3

    costs = crit.all_cost_matrices(out, jnp.asarray(labels),
                                   jnp.asarray(points), jnp.asarray(valid))
    assert costs.shape == (2, 2, 16, 8)  # (levels, B, Q, T)
    match_src = crit.hungarian(np.asarray(costs), valid.sum(1))
    assert match_src.shape == (2, 2, 8)
    # matched queries for the 3 valid targets are distinct
    assert len(set(match_src[0, 0, :3])) == 3

    total, loss_dict = crit.losses(out, jnp.asarray(labels),
                                   jnp.asarray(points), jnp.asarray(valid),
                                   jnp.asarray(match_src))
    assert np.isfinite(float(total))
    assert "loss_ce" in loss_dict and "loss_point" in loss_dict
    assert "loss_ce_0" in loss_dict  # aux level


def test_cltr_train_step_updates_params(model_and_vars):
    from unet_torch_tpu.train.cltr_steps import make_cltr_steps
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState

    model, variables = model_and_vars
    crit = SetCriterion(num_classes=2,
                        weight_dict=build_weight_dict(dec_layers=2))
    tx = make_optimizer("Adam", 1e-4, 0.0)
    # deep-copy: update_step donates its state, and `variables` is a
    # module-scoped fixture shared with later tests
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, variables["params"]),
        jax.tree_util.tree_map(jnp.copy, variables.get("batch_stats", {})),
        tx)
    cost_step, update_step, infer_step = make_cltr_steps(model, crit, tx)

    rng0 = np.random.RandomState(0)
    x = jnp.asarray(rng0.randn(1, 64, 64, 3), jnp.float32)
    targets = [{"labels": np.ones(2, np.int64),
                "points": rng0.rand(2, 3).astype(np.float32),
                "points_macher": rng0.rand(2, 3).astype(np.float32)}]
    labels, points, _, valid = pad_targets(targets, 8, 3)
    rng = jax.random.key(3)
    costs = cost_step(state, x, jnp.asarray(labels), jnp.asarray(points),
                      jnp.asarray(valid), rng)
    match = crit.hungarian(np.asarray(costs), valid.sum(1))
    before = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]).copy()
    state2, loss, loss_dict = update_step(
        state, x, jnp.asarray(labels), jnp.asarray(points),
        jnp.asarray(valid), jnp.asarray(match), 1e-4, rng)
    after = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    assert np.isfinite(float(loss))
    assert not np.allclose(before, after)

    logits, pts = infer_step(state2, x)
    assert logits.shape == (1, 16, 2)


def test_postprocess_topk(model_and_vars):
    from unet_torch_tpu.models.cltr import PostProcess

    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(4).randn(2, 64, 64, 3), jnp.float32)
    out = model.apply(variables, x, train=False)
    results = PostProcess()(out, [(128, 128), (64, 64)])
    assert len(results) == 2
    # top-k capped at num_queries * num_classes here (16*2 < 100)
    assert results[0]["scores"].shape == results[0]["labels"].shape
    pts = results[0]["points"]
    assert pts.shape[1] == 2
    assert (pts >= 0).all() and (pts[:, 0] <= 128).all()


def test_postprocess_topk_vs_torch_oracle():
    """PostProcess top-k index arithmetic vs a torch-transplanted oracle
    (ref CLTR/conditional_detr.py:290-322: sigmoid -> topk(100) over the
    flattened (queries*classes) axis, query = idx // n_classes, label =
    idx % n_classes, gather points, scale to absolute coords).  The
    reference's own tail calls box_cxcywh_to_xyxy and would crash on CLTR's
    3-dim points; the oracle keeps its index math and the [w, h] scaling."""
    import torch

    from unet_torch_tpu.models.cltr.criterion import PostProcess

    rng = np.random.default_rng(7)
    bsz, q, c = 2, 300, 2
    logits = rng.normal(size=(bsz, q, c)).astype(np.float32)
    points = rng.uniform(size=(bsz, q, 3)).astype(np.float32)
    sizes = np.array([[256, 256], [768, 512]], np.float32)  # (h, w)

    out_logits = torch.from_numpy(logits)
    out_point = torch.from_numpy(points)
    prob = out_logits.sigmoid()
    topk_values, topk_indexes = torch.topk(
        prob.view(out_logits.shape[0], -1), 100, dim=1)
    topk_points = torch.div(topk_indexes, out_logits.shape[2],
                            rounding_mode="floor")
    labels = topk_indexes % out_logits.shape[2]
    pts = torch.gather(out_point, 1,
                       topk_points.unsqueeze(-1).repeat(1, 1, 3))
    img_h, img_w = torch.from_numpy(sizes).unbind(1)
    scale = torch.stack([img_w, img_h], dim=1)
    pts_abs = pts[..., :2] * scale[:, None, :]

    results = PostProcess()({"pred_logits": logits, "pred_points": points},
                            sizes)
    for b in range(bsz):
        np.testing.assert_allclose(results[b]["scores"],
                                   topk_values[b].numpy(), atol=1e-6)
        np.testing.assert_array_equal(results[b]["labels"],
                                      labels[b].numpy())
        np.testing.assert_allclose(results[b]["points"],
                                   pts_abs[b].numpy(), atol=1e-4)


def test_cltr_bf16_forward_and_grad():
    """precision: bf16 builds a bf16-compute CLTR whose outputs stay f32
    (criterion precision) and whose loss/grads are finite."""
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.cltr import build_cltr

    model, criterion, _ = build_cltr(
        {"num_queries": 32, "hidden_dim": 32, "nheads": 4, "enc_layers": 1,
         "dec_layers": 2, "dim_feedforward": 64, "precision": "bf16"})
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["pred_logits"].dtype == jnp.float32
    assert out["pred_points"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
    # dropout path (train=True) also runs in bf16 with the rbg mask
    out_t = model.apply(variables, x, train=True,
                        rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(np.asarray(out_t["pred_logits"])).all()
