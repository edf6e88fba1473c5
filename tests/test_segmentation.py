"""DETR panoptic machinery (models/cltr/segmentation.py) — the reference's
dormant components (/root/reference/CLTR/segmentation.py, masks:false)
rebuilt and exercised."""

import numpy as np

import jax
import jax.numpy as jnp

from unet_torch_tpu.models.cltr.segmentation import (
    DETRsegm,
    MHAttentionMap,
    postprocess_panoptic,
    postprocess_segm,
)


def test_mh_attention_map_oracle():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 5, 32), jnp.float32)
    k = jnp.asarray(rng.randn(2, 4, 6, 32), jnp.float32)
    m = MHAttentionMap(hidden_dim=32, num_heads=4)
    variables = m.init(jax.random.key(0), q, k)
    w = m.apply(variables, q, k)
    assert w.shape == (2, 5, 4, 4, 6)
    # softmax over the flattened spatial dims sums to 1 per (b, q, head)
    np.testing.assert_allclose(np.asarray(w.sum(axis=(3, 4))), 1.0,
                               rtol=1e-5)
    # oracle: manual einsum + softmax with the same projections
    p = variables["params"]
    qh = (q @ p["q_linear"]["kernel"] + p["q_linear"]["bias"]).reshape(
        2, 5, 4, 8)
    kh = (k @ p["k_linear"]["kernel"] + p["k_linear"]["bias"]).reshape(
        2, 4, 6, 4, 8)
    s = np.einsum("bqnc,bhwnc->bqnhw", np.asarray(qh) * 8 ** -0.5,
                  np.asarray(kh))
    e = np.exp(s - s.max(axis=(3, 4), keepdims=True))
    expect = e / e.sum(axis=(3, 4), keepdims=True)
    np.testing.assert_allclose(np.asarray(w), expect, rtol=1e-4, atol=1e-5)


def test_mh_attention_map_masking():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 3, 16), jnp.float32)
    k = jnp.asarray(rng.randn(1, 4, 4, 16), jnp.float32)
    mask = np.zeros((1, 4, 4), bool)
    mask[0, :, 2:] = True  # padding on the right half
    m = MHAttentionMap(hidden_dim=16, num_heads=2)
    variables = m.init(jax.random.key(0), q, k)
    w = np.asarray(m.apply(variables, q, k, jnp.asarray(mask)))
    assert (w[0, :, :, :, 2:] == 0).all()
    np.testing.assert_allclose(w.sum(axis=(3, 4)), 1.0, rtol=1e-5)


def test_detrsegm_forward_shapes():
    model = DETRsegm(num_queries=4, hidden_dim=32, nheads=8, enc_layers=1,
                     dec_layers=1, dim_feedforward=32, dropout_rate=0.0)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["pred_logits"].shape == (1, 4, 2)
    assert out["pred_points"].shape == (1, 4, 3)
    # masks at the layer1 (1/4) resolution
    assert out["pred_masks"].shape == (1, 4, 16, 16)
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def test_postprocess_segm_crops_and_resizes():
    rng = np.random.RandomState(2)
    outputs = {"pred_masks": rng.randn(1, 3, 8, 8).astype(np.float32)}
    results = [{}]
    out = postprocess_segm(results, outputs, orig_target_sizes=[(20, 24)],
                           max_target_sizes=[(16, 16)])
    assert out[0]["masks"].shape == (3, 1, 20, 24)
    assert out[0]["masks"].dtype == np.uint8


def test_postprocess_panoptic_merges():
    # two confident queries with disjoint dominant masks + one background
    logits = np.full((1, 3, 3), -5.0, np.float32)
    logits[0, 0, 0] = 5.0   # class 0, confident
    logits[0, 1, 1] = 5.0   # class 1, confident
    logits[0, 2, 2] = 5.0   # last class == "no object" -> dropped
    masks = np.full((1, 3, 8, 8), -5.0, np.float32)
    masks[0, 0, :, :4] = 5.0
    masks[0, 1, :, 4:] = 5.0
    preds = postprocess_panoptic(
        {"pred_logits": logits, "pred_masks": masks},
        processed_sizes=[(8, 8)], target_sizes=[(8, 8)],
        is_thing_map={0: True, 1: False, 2: False}, threshold=0.5)
    info = preds[0]["segments_info"]
    assert len(info) == 2
    areas = sorted(s["area"] for s in info)
    assert areas == [32, 32]
    assert preds[0]["png_string"].startswith(b"\x89PNG")
