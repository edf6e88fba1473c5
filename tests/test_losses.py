"""Loss zoo vs independent numpy/torch oracles.

The reference ships no tests (SURVEY.md §4); our strategy is numerical parity of
every calc_loss dispatch key against an oracle derived from the cited formula —
for the core losses the oracle *is* the reference's torch expression evaluated on
CPU torch (same formulas, NCHW), giving true cross-framework parity.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from unet_torch_tpu.losses import calc_loss, set_class_number

B, H, W, C = 2, 24, 24, 3
RNG = np.random.RandomState(42)
PRED_MC = RNG.randn(B, H, W, C).astype(np.float32)
TGT_MC = RNG.randint(0, C, size=(B, H, W)).astype(np.float32)
PRED_BIN = PRED_MC[..., :1]
TGT_BIN = (TGT_MC > 1).astype(np.float32)


def to_torch_nchw(x):
    t = torch.from_numpy(np.asarray(x))
    if t.ndim == 4:
        t = t.permute(0, 3, 1, 2)
    return t


def jloss(loss_type, pred=None, tgt=None, n=C):
    set_class_number(n)
    pred = PRED_MC if pred is None else pred
    tgt = TGT_MC if tgt is None else tgt
    return float(calc_loss(jnp.asarray(pred), jnp.asarray(tgt),
                           loss_type=loss_type))


def test_bce_matches_torch():
    ours = jloss("BCE", PRED_BIN, TGT_BIN)
    ref = tF.binary_cross_entropy_with_logits(
        to_torch_nchw(PRED_BIN).squeeze(1), torch.from_numpy(TGT_BIN))
    assert np.isclose(ours, ref.item(), atol=1e-5)


def test_ce_matches_torch():
    ours = jloss("CE")
    ref = torch.nn.CrossEntropyLoss()(to_torch_nchw(PRED_MC),
                                      torch.from_numpy(TGT_MC).long())
    assert np.isclose(ours, ref.item(), atol=1e-5)


def test_mse_l1_rmse():
    assert np.isclose(jloss("mse", PRED_BIN, TGT_BIN),
                      np.mean((PRED_BIN[..., 0] - TGT_BIN) ** 2), atol=1e-6)
    assert np.isclose(jloss("l1loss", PRED_BIN, TGT_BIN[..., None]),
                      np.mean(np.abs(PRED_BIN - TGT_BIN[..., None])), atol=1e-6)
    assert np.isclose(jloss("rmse", PRED_BIN, TGT_BIN[..., None]),
                      np.sqrt(np.mean((PRED_BIN - TGT_BIN[..., None]) ** 2)),
                      atol=1e-6)


def test_multiclass_dice_matches_reference_formula():
    # DiceLoss (loss.py:215-251): softmax, one-hot, squared denominators
    ours = jloss("dice_bce_mc")
    p = torch.softmax(to_torch_nchw(PRED_MC), dim=1).numpy()
    onehot = np.stack([(TGT_MC == i) for i in range(C)], 1).astype(np.float32)
    smooth = 1e-5
    dice = 0.0
    for i in range(C):
        inter = (p[:, i] * onehot[:, i]).sum()
        z = (p[:, i] ** 2).sum()
        y = (onehot[:, i] ** 2).sum()
        dice += 1 - (2 * inter + smooth) / (z + y + smooth)
    dice /= C
    ce = torch.nn.CrossEntropyLoss()(to_torch_nchw(PRED_MC),
                                     torch.from_numpy(TGT_MC).long()).item()
    assert np.isclose(ours, 0.5 * ce + 0.5 * dice, atol=1e-5)


def test_binary_dice_matches_reference_formula():
    ours = jloss("dice", PRED_BIN, TGT_BIN)
    p = 1 / (1 + np.exp(-PRED_BIN[..., 0])).reshape(B, -1)
    t = TGT_BIN.reshape(B, -1)
    num = 2 * (p * t).sum(1) + 1
    den = (np.abs(p) + np.abs(t)).sum(1) + 1
    assert np.isclose(ours, np.mean(1 - num / den), atol=1e-5)


def test_dice_bce_is_half_half():
    ours = jloss("dice_bce", PRED_BIN, TGT_BIN)
    assert np.isclose(
        ours, 0.5 * jloss("BCE", PRED_BIN, TGT_BIN)
        + 0.5 * jloss("dice", PRED_BIN, TGT_BIN), atol=1e-6)


def test_focal_matches_torch_formula():
    ours = jloss("FL", PRED_BIN, TGT_BIN)
    bce = tF.binary_cross_entropy_with_logits(
        to_torch_nchw(PRED_BIN).squeeze(1), torch.from_numpy(TGT_BIN),
        reduction="none")
    pt = torch.exp(-bce)
    ref = (0.25 * (1 - pt) ** 2 * bce).mean().item()
    assert np.isclose(ours, ref, atol=1e-5)


def test_topk_selects_hard_pixels():
    # TopKLoss(topk=2) == BCE over worst half of pixels by gt-probability
    ours = jloss("TopK", PRED_BIN, TGT_BIN)
    logits = PRED_BIN[..., 0].reshape(-1)
    labels = TGT_BIN.reshape(-1)
    fg = 1 / (1 + np.exp(-logits))
    gt_prob = np.where(labels > 0.5, fg, 1 - fg)
    k = logits.size // 2
    idx = np.argsort(gt_prob, kind="stable")[:k]
    ce = np.maximum(logits, 0) - logits * labels + np.log1p(
        np.exp(-np.abs(logits)))
    assert np.isclose(ours, ce[idx].mean(), atol=1e-5)


def test_bce_hem_top500():
    ours = jloss("BCE_HEM", PRED_BIN, TGT_BIN)
    ce = np.maximum(PRED_BIN[..., 0], 0) - PRED_BIN[..., 0] * TGT_BIN + \
        np.log1p(np.exp(-np.abs(PRED_BIN[..., 0])))
    flat = np.sort(ce.reshape(-1))[::-1][:500]
    assert np.isclose(ours, flat.mean(), atol=1e-5)


def test_tversky_binary_and_mc():
    ours = jloss("Tversky", PRED_BIN, TGT_BIN)
    p = 1 / (1 + np.exp(-PRED_BIN[..., 0].reshape(-1)))
    t = TGT_BIN.reshape(-1)
    tp, fp, fn = (p * t).sum(), ((1 - t) * p).sum(), (t * (1 - p)).sum()
    tv = (tp + 1) / (tp + 0.4 * fp + 0.6 * fn + 1)
    assert np.isclose(ours, 1 - tv, atol=1e-5)
    assert 0.0 < jloss("Tversky") < 1.0  # multi-class path runs


def test_hausdorff_dt_matches_scipy_edt():
    from scipy.ndimage import distance_transform_edt as edt

    ours = jloss("HausdorffDTLoss", PRED_BIN, TGT_BIN)
    p = 1 / (1 + np.exp(-PRED_BIN[..., 0]))

    def field(img):
        out = np.zeros_like(img)
        for b in range(img.shape[0]):
            fg = img[b] > 0.5
            if fg.any():
                out[b] = edt(fg) + edt(~fg)
        return out

    pd, td = field(p), field(TGT_BIN)
    ref = ((p - TGT_BIN) ** 2 * (pd**0.2 + td**0.2)).mean()
    assert np.isclose(ours, ref, rtol=1e-4)


def test_hausdorff_er_runs_and_positive():
    v = jloss("HausdorffERLoss", PRED_BIN, TGT_BIN)
    assert v >= 0.0 and np.isfinite(v)


def test_active_contour_matches_formula():
    v = jloss("ActiveContourLoss", PRED_BIN, TGT_BIN)
    assert v > 0 and np.isfinite(v)


def test_log_cosh_dice():
    set_class_number(C)
    from unet_torch_tpu.losses.functional import multiclass_dice_loss

    x = float(multiclass_dice_loss(jnp.asarray(PRED_MC), jnp.asarray(TGT_MC),
                                   C, softmax=True))
    assert np.isclose(jloss("log_cosh_dice_loss"),
                      np.log((np.exp(x) + np.exp(-x)) / 2), atol=1e-6)


def test_unknown_loss_raises():
    with pytest.raises(KeyError):
        jloss("definitely_not_a_loss")


def test_multitask_uncertainty_formula():
    from unet_torch_tpu.losses import multitask_uncertainty_loss

    l1, l2 = jnp.asarray(2.0), jnp.asarray(3.0)
    lv = [jnp.asarray(0.5), jnp.asarray(-0.3)]
    out = float(multitask_uncertainty_loss([l1, l2], lv, [True, False]))
    s1, s2 = np.exp(0.5) ** 0.5, np.exp(-0.3) ** 0.5
    ref = (1 / (2 * s1**2)) * 2.0 + np.log(s1) + (1 / s2**2) * 3.0 + np.log(s2)
    assert np.isclose(out, ref, atol=1e-6)


def test_binary_ce_margin_specialisation_matches_torch():
    """num_classes==2 CE runs on the logit margin (softplus form — full-lane
    rank-3 math on TPU, losses/functional.py::softmax_cross_entropy); pin
    value AND gradient against torch CrossEntropyLoss."""
    from unet_torch_tpu.losses.functional import softmax_cross_entropy

    rng = np.random.RandomState(7)
    pred = rng.randn(2, 8, 8, 2).astype(np.float32) * 3
    tgt = rng.randint(0, 2, (2, 8, 8)).astype(np.int64)

    ours = float(softmax_cross_entropy(jnp.asarray(pred), jnp.asarray(tgt), 2))
    tp = to_torch_nchw(pred).requires_grad_(True)
    ref = torch.nn.CrossEntropyLoss()(tp, torch.from_numpy(tgt))
    assert np.isclose(ours, ref.item(), atol=1e-6)

    ref.backward()
    g_ref = tp.grad.permute(0, 2, 3, 1).numpy()
    import jax
    g_ours = np.asarray(jax.grad(
        lambda l: softmax_cross_entropy(l, jnp.asarray(tgt), 2)
    )(jnp.asarray(pred)))
    assert np.max(np.abs(g_ours - g_ref)) < 1e-6


def test_dice_bce_mc_planes_matches_generic_composition():
    """dice_bce_mc's class-planes path (full-lane rank-3 math on TPU,
    losses/functional.py::_dice_bce_mc_planes) == 0.5*CE + 0.5*softmax-dice
    composed from the generic pieces, value and gradient."""
    import jax
    from unet_torch_tpu.losses.functional import (dice_bce_mc_loss,
                                                  multiclass_dice_loss)

    rng = np.random.RandomState(11)
    for n in (2, 3):
        pred = jnp.asarray(rng.randn(2, 8, 8, n).astype(np.float32) * 2)
        tgt = jnp.asarray(rng.randint(0, n, (2, 8, 8)))

        def generic(p):
            logp = jax.nn.log_softmax(p, axis=-1)
            oh = jax.nn.one_hot(tgt.astype(jnp.int32), n, dtype=p.dtype)
            ce = -jnp.mean(jnp.sum(oh * logp, axis=-1))
            return 0.5 * ce + 0.5 * multiclass_dice_loss(p, tgt, n,
                                                         softmax=True)

        v1 = float(dice_bce_mc_loss(pred, tgt, n))
        v2 = float(generic(pred))
        assert np.isclose(v1, v2, atol=1e-6)
        g1 = jax.grad(lambda p: dice_bce_mc_loss(p, tgt, n))(pred)
        g2 = jax.grad(generic)(pred)
        assert float(jnp.max(jnp.abs(g1 - g2))) < 1e-6


def test_binary_dice_ignore_index_matches_reference():
    """ignore_index masks target==ignore_index pixels out of both tensors
    before the dice sums — oracle is the reference BinaryDiceLoss executed
    from /root/reference (loss.py:254-307)."""
    import sys

    from unet_torch_tpu.losses.functional import binary_dice_loss

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from loss import BinaryDiceLoss as RefBinaryDice

    tgt = TGT_BIN.copy()
    tgt[:, :4] = 255.0  # a band of ignored pixels
    ours = float(binary_dice_loss(jnp.asarray(PRED_BIN), jnp.asarray(tgt),
                                  ignore_index=255))
    ref = RefBinaryDice(ignore_index=255)(
        to_torch_nchw(PRED_BIN).squeeze(1), torch.from_numpy(tgt))
    assert np.isclose(ours, ref.item(), atol=1e-5)
    # and the masking changes the value (the band isn't a no-op)
    plain = float(binary_dice_loss(jnp.asarray(PRED_BIN), jnp.asarray(tgt)))
    assert not np.isclose(ours, plain, atol=1e-4)
