"""Loss zoo — pure jnp functions, NHWC convention.

Capability parity with /root/reference/loss.py (formulas cited per function), built
TPU-first: everything is jit-compatible, static-shaped, and stays on device.  Where
the reference round-trips to CPU numpy/scipy inside the loss (Hausdorff EDT at
loss.py:136-139,185-188), we compute the same quantity on the VPU (separable
min-plus-matmul distance transform) so the step stays a single XLA program.

Conventions: ``pred`` is logits, shape (B, H, W, C); ``target`` is (B, H, W) class
indices / binary maps, or (B, H, W, C) for multi-channel regression.  (The reference
is NCHW; this framework is channels-last throughout — the MXU-native layout.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# elementary pieces
# ---------------------------------------------------------------------------

def sigmoid_bce_with_logits(logits, labels):
    """Numerically-stable BCEWithLogits (per-element)."""
    # max(x,0) - x*z + log(1+exp(-|x|))
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def softmax_cross_entropy(logits, labels, num_classes):
    """torch nn.CrossEntropyLoss (mean) — logits (..., C), labels (...) int.

    The binary case is computed on the logit margin t = z1 - z0:
    CE = softplus(t) - y*t (same formula, fewer padded-lane passes — a
    (B,H,W,2) tensor keeps only 2 of 128 lanes live on TPU, so every
    elementwise op over it costs 64x its useful bytes; the margin is a
    rank-3 (B,H,W) array whose minor dim W fills the lanes)."""
    if num_classes == 2 and logits.shape[-1] == 2:
        t = (logits[..., 1].astype(jnp.float32)
             - logits[..., 0].astype(jnp.float32))
        y = (labels > 0).astype(t.dtype)
        return jnp.mean(jax.nn.softplus(t) - y * t)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=logp.dtype)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def _squeeze_last(pred):
    """pred (B,H,W,1) -> (B,H,W), mirroring the reference's .squeeze(1) on NCHW."""
    if pred.ndim == 4 and pred.shape[-1] == 1:
        return pred[..., 0]
    return pred


# ---------------------------------------------------------------------------
# BCE variants (loss.py:443-467)
# ---------------------------------------------------------------------------

def bce_loss(pred, target):
    """loss.py:443-444 — BCEWithLogits, mean."""
    return jnp.mean(sigmoid_bce_with_logits(_squeeze_last(pred), target))


def topk_bce_loss(pred, target, topk: int = 2):
    """TopKLoss (loss.py:354-378): BCE over the 1/topk fraction of pixels with the
    lowest ground-truth probability (hard-example mining)."""
    logits = _squeeze_last(pred).reshape(-1)
    labels = target.reshape(-1).astype(logits.dtype)
    fg = jax.nn.sigmoid(logits)
    gt_prob = jnp.where(labels > 0.5, fg, 1.0 - fg)
    k = logits.shape[0] // topk
    # lowest-probability pixels == highest (1 - gt_prob)
    _, idx = jax.lax.top_k(-gt_prob, k)
    ce = sigmoid_bce_with_logits(logits, labels)
    return jnp.mean(ce[idx])


def bce_hem_loss(pred, target, k: int = 500, batch_base: bool = False):
    """BCE_HEM (loss.py:447-467): keep top-k pixel losses (or top-2 batch items)."""
    ce = sigmoid_bce_with_logits(_squeeze_last(pred), target.astype(pred.dtype))
    if batch_base:
        per_item = jnp.mean(ce, axis=(1, 2))
        top, _ = jax.lax.top_k(per_item, 2)
        return jnp.mean(top)
    flat = ce.reshape(-1)
    top, _ = jax.lax.top_k(flat, k)
    return jnp.mean(top)


def focal_loss(pred, target, alpha: float = 0.25, gamma: float = 2.0):
    """FocalLoss (loss.py:327-342): alpha*(1-pt)^gamma * BCE.

    (The reference's 'FL' dispatch calls an undefined BinaryFocalLoss —
    loss.py:470-472 latent bug; we dispatch to the real implementation.)
    """
    logits = _squeeze_last(pred)
    labels = target.astype(logits.dtype)
    ce = sigmoid_bce_with_logits(logits, labels)
    pt = jnp.exp(-ce)
    return jnp.mean(alpha * (1.0 - pt) ** gamma * ce)


# ---------------------------------------------------------------------------
# regression losses (loss.py:473-481)
# ---------------------------------------------------------------------------

def mse_loss(pred, target):
    return jnp.mean((_squeeze_last(pred) - _squeeze_last(target)) ** 2)


def mse_mc_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def rmse_loss(pred, target):
    return jnp.sqrt(jnp.mean((pred - target) ** 2))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


# ---------------------------------------------------------------------------
# Dice family (loss.py:215-307)
# ---------------------------------------------------------------------------

def multiclass_dice_loss(pred, target, num_classes, weights=None, softmax=False):
    """DiceLoss (loss.py:215-251): one-hot target, per-class soft dice with squared
    denominators, smooth 1e-5, mean over classes."""
    if softmax:
        pred = jax.nn.softmax(pred, axis=-1)
    onehot = jax.nn.one_hot(target.astype(jnp.int32), num_classes, dtype=pred.dtype)
    smooth = 1e-5
    intersect = jnp.sum(pred * onehot, axis=(0, 1, 2))
    z = jnp.sum(pred * pred, axis=(0, 1, 2))
    y = jnp.sum(onehot * onehot, axis=(0, 1, 2))
    dice = 1.0 - (2.0 * intersect + smooth) / (z + y + smooth)
    if weights is None:
        return jnp.mean(dice)
    w = jnp.asarray(weights, dtype=pred.dtype)
    return jnp.sum(dice * w) / num_classes


def binary_dice_loss(pred, target, smooth: float = 1.0, use_sigmoid: bool = True,
                     batch_dice: bool = False, ignore_index=None):
    """BinaryDiceLoss (loss.py:254-307): per-sample flattened dice, smooth=1.

    ``ignore_index`` masks pixels whose *target* equals it out of both
    prediction and target before the dice sums (loss.py:284-287) — a static
    Python value so the masking compiles away entirely when unused."""
    p = _squeeze_last(pred)
    if use_sigmoid:
        p = jax.nn.sigmoid(p)
    t = target.astype(p.dtype)
    if ignore_index is not None:
        valid = (target != ignore_index).astype(p.dtype)
        p = p * valid
        t = t * valid
    dim0 = 1 if batch_dice else p.shape[0]
    p = p.reshape(dim0, -1)
    t = t.reshape(dim0, -1)
    num = 2.0 * jnp.sum(p * t, axis=1) + smooth
    den = jnp.sum(jnp.abs(p) + jnp.abs(t), axis=1) + smooth
    return jnp.mean(1.0 - num / den)


def dice_bce_loss(pred, target, bce_weight: float = 0.5):
    """dice_bce (loss.py:484-487): 0.5*BCEWithLogits + 0.5*BinaryDice."""
    return bce_weight * bce_loss(pred, target) + (1.0 - bce_weight) * \
        binary_dice_loss(pred, target)


def _dice_bce_mc_planes(pred, target, num_classes, bce_weight):
    """Class-planes evaluation of dice_bce_mc for small C.

    A (B,H,W,C) tensor with C of 2-3 keeps only C of 128 TPU lanes live, so
    the generic one_hot/softmax/log_softmax chain pays ~128/C x its useful
    bytes on every elementwise pass (fwd and bwd).  Slicing the logits into C
    rank-3 (B,H,W) planes up front (one fused read of the padded tensor)
    lets the whole CE + soft-dice computation — sharing a single softmax —
    run at full lane width.  Mathematically identical to
    0.5*CE + 0.5*DiceLoss(softmax), evaluated in f32."""
    y = target.astype(jnp.int32)
    z = [pred[..., c].astype(jnp.float32) for c in range(num_classes)]
    m = z[0]
    for zc in z[1:]:
        m = jnp.maximum(m, zc)
    e = [jnp.exp(zc - m) for zc in z]
    s = sum(e)
    # CE = mean(logsumexp - z_y) = mean(log s + m - z_y)
    z_y = sum(jnp.where(y == c, zc, 0.0) for c, zc in enumerate(z))
    ce = jnp.mean(jnp.log(s) + m - z_y)
    smooth = 1e-5
    dice = 0.0
    for c in range(num_classes):
        p = e[c] / s
        t = (y == c).astype(p.dtype)
        intersect = jnp.sum(p * t)
        dice += 1.0 - (2.0 * intersect + smooth) / (
            jnp.sum(p * p) + jnp.sum(t) + smooth)
    return bce_weight * ce + (1.0 - bce_weight) * dice / num_classes


def dice_bce_mc_planes_folded(planes, target, num_classes,
                              bce_weight: float = 0.5):
    """dice_bce_mc evaluated on W-folded class planes — the fused-head form.

    ``planes``: (2C, B, H, W/2) from FoldedOutConv(planes=True); plane
    n = s*C + c holds class-c logits at W-parity s (nn/folded.fold lane
    order).  ``target``: (B, H, W) class indices.  CE and soft dice are sums
    over pixels, so regrouping pixels by W-parity leaves the value identical
    to dice_bce_mc_loss(unfolded_logits, target) up to summation order; the
    (B,H,W,C) logits tensor (C-minor, 128/C-padded on TPU) never exists in
    forward or backward."""
    c = num_classes
    y = target.astype(jnp.int32)
    ys = [y[:, :, 0::2], y[:, :, 1::2]]            # per-parity targets
    ce_sum = 0.0
    n_pix = 0
    smooth = 1e-5
    inter = [0.0] * c
    psum = [0.0] * c
    tsum = [0.0] * c
    for s in range(2):
        z = [planes[s * c + i].astype(jnp.float32) for i in range(c)]
        m = z[0]
        for zc in z[1:]:
            m = jnp.maximum(m, zc)
        e = [jnp.exp(zc - m) for zc in z]
        se = sum(e)
        z_y = sum(jnp.where(ys[s] == i, zc, 0.0) for i, zc in enumerate(z))
        ce_sum = ce_sum + jnp.sum(jnp.log(se) + m - z_y)
        n_pix += z[0].size
        for i in range(c):
            p = e[i] / se
            t = (ys[s] == i).astype(p.dtype)
            inter[i] = inter[i] + jnp.sum(p * t)
            psum[i] = psum[i] + jnp.sum(p * p)
            tsum[i] = tsum[i] + jnp.sum(t)
    ce = ce_sum / n_pix
    dice = 0.0
    for i in range(c):
        dice += 1.0 - (2.0 * inter[i] + smooth) / (psum[i] + tsum[i] + smooth)
    return bce_weight * ce + (1.0 - bce_weight) * dice / c


def ce_planes_folded(planes, target, num_classes):
    """softmax CE (torch nn.CrossEntropyLoss, mean) on W-folded class
    planes — the fused-head form of softmax_cross_entropy.

    ``planes``: (2C, B, H, W/2) from FoldedOutConv(planes=True); plane
    n = s*C + c holds class-c logits at W-parity s.  ``target``: (B, H, W)
    class indices.  CE is a mean over pixels, so regrouping by W-parity is
    exact up to summation order; for C=2 each parity reduces to the logit
    margin (softplus(t) - y*t), matching softmax_cross_entropy's binary
    fast path."""
    c = num_classes
    y = target.astype(jnp.int32)
    ys = [y[:, :, 0::2], y[:, :, 1::2]]
    ce_sum = 0.0
    n_pix = 0
    for s in range(2):
        z = [planes[s * c + i].astype(jnp.float32) for i in range(c)]
        if c == 2:
            t = z[1] - z[0]
            yb = (ys[s] > 0).astype(t.dtype)
            ce_sum = ce_sum + jnp.sum(jax.nn.softplus(t) - yb * t)
        else:
            m = z[0]
            for zc in z[1:]:
                m = jnp.maximum(m, zc)
            e = [jnp.exp(zc - m) for zc in z]
            se = sum(e)
            z_y = sum(jnp.where(ys[s] == i, zc, 0.0)
                      for i, zc in enumerate(z))
            ce_sum = ce_sum + jnp.sum(jnp.log(se) + m - z_y)
        n_pix += z[0].size
    return ce_sum / n_pix


def dice_bce_planes_folded(planes, target, bce_weight: float = 0.5,
                           smooth: float = 1.0):
    """dice_bce (loss.py:484-487) on W-folded single-channel planes — the
    fused-head form for binary heads.

    ``planes``: (2, B, H, W/2) from FoldedOutConv(planes=True) with C=1.
    BCE is a mean over pixels and BinaryDiceLoss reduces per sample, so
    regrouping pixels by W-parity (plane dim 0 + spatial dims per sample)
    reproduces dice_bce_loss(unfolded_logits, target) exactly up to
    summation order; the feature-minor (B,H,W,1) logits tensor never
    exists in forward or backward."""
    if target.ndim == 4:
        target = target[..., 0]
    z = planes.astype(jnp.float32)
    t = jnp.stack([target[:, :, 0::2], target[:, :, 1::2]], 0)
    t = t.astype(jnp.float32)
    bce = jnp.mean(sigmoid_bce_with_logits(z, t))
    p = jax.nn.sigmoid(z)
    num = 2.0 * jnp.sum(p * t, axis=(0, 2, 3)) + smooth
    den = jnp.sum(jnp.abs(p) + jnp.abs(t), axis=(0, 2, 3)) + smooth
    dice = jnp.mean(1.0 - num / den)
    return bce_weight * bce + (1.0 - bce_weight) * dice


def bce_planes_folded(planes, target):
    """BCEWithLogits (loss.py:443-444) on W-folded single-channel planes."""
    if target.ndim == 4:
        target = target[..., 0]
    z = planes.astype(jnp.float32)
    t = jnp.stack([target[:, :, 0::2], target[:, :, 1::2]], 0)
    return jnp.mean(sigmoid_bce_with_logits(z, t.astype(jnp.float32)))


def mse_planes_folded(planes, target, relu: bool = False):
    """mse (loss.py:473-475; optionally post-ReLU, Trainer.py:709-710,
    881-883) on W-folded single-channel planes — the fused-head form for
    regression/density heads.

    ``planes``: (2, B, H, W/2) from FoldedOutConv(planes=True) with C=1;
    plane s holds the head's logits at W-parity s.  ``target``: (B, H, W)
    or (B, H, W, 1).  A C=1 conv output is laid out feature-minor on TPU
    and padded to the full 128-lane tile; evaluating the loss in plane form
    keeps W/2 in the lanes so that tensor never exists."""
    if target.ndim == 4:
        target = target[..., 0]
    z = planes.astype(jnp.float32)
    if relu:
        z = jax.nn.relu(z)
    ts = jnp.stack([target[:, :, 0::2], target[:, :, 1::2]], 0)
    return jnp.mean((z - ts.astype(jnp.float32)) ** 2)


def dice_bce_mc_loss(pred, target, num_classes, bce_weight: float = 0.5):
    """dice_bce_mc (loss.py:488-500): 0.5*CE + 0.5*DiceLoss(softmax) — flagship."""
    if pred.ndim == 4 and pred.shape[-1] == num_classes and num_classes <= 8:
        return _dice_bce_mc_planes(pred, target, num_classes, bce_weight)
    ce = softmax_cross_entropy(pred, target, num_classes)
    dice = multiclass_dice_loss(pred, target, num_classes, softmax=True)
    return bce_weight * ce + (1.0 - bce_weight) * dice


def log_cosh_dice_loss(pred, target, num_classes):
    """log_cosh_dice_loss (loss.py:503-505)."""
    x = multiclass_dice_loss(pred, target, num_classes, softmax=True)
    return jnp.log((jnp.exp(x) + jnp.exp(-x)) / 2.0)


def dice_score(pred, target, num_classes=None):
    """Dice coefficient (higher is better) — the 'dice_score' accuracy metric."""
    if num_classes and num_classes > 1:
        return 1.0 - multiclass_dice_loss(pred, target, num_classes, softmax=True)
    return 1.0 - binary_dice_loss(pred, target)


# ---------------------------------------------------------------------------
# Tversky (loss.py:380-420)
# ---------------------------------------------------------------------------

def focal_tversky_loss(pred, target, smooth: float = 1.0, alpha: float = 0.5,
                       beta: float = 0.5, gamma: float = 1.0):
    """FocalTverskyLoss: binary (1 channel, sigmoid) or per-class softmax mean."""
    num_classes = pred.shape[-1]
    if num_classes == 1:
        p = jax.nn.sigmoid(pred[..., 0]).reshape(-1)
        t = target.astype(p.dtype).reshape(-1)
        tp = jnp.sum(p * t)
        fp = jnp.sum((1.0 - t) * p)
        fn = jnp.sum(t * (1.0 - p))
        tv = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
        return (1.0 - tv) ** gamma
    p = jax.nn.softmax(pred, axis=-1).reshape(-1, num_classes)
    onehot = jax.nn.one_hot(target.astype(jnp.int32).reshape(-1), num_classes,
                            dtype=p.dtype)
    tp = jnp.sum(p * onehot, axis=0)
    fp = jnp.sum((1.0 - onehot) * p, axis=0)
    fn = jnp.sum(onehot * (1.0 - p), axis=0)
    tv = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return jnp.mean((1.0 - tv) ** gamma)


# ---------------------------------------------------------------------------
# Hausdorff losses (loss.py:51-212) — fully on-device (reference uses CPU scipy)
# ---------------------------------------------------------------------------

def euclidean_distance_transform_sq(mask):
    """Exact squared EDT of a binary mask (H, W): distance to the nearest zero.

    TPU-native separable formulation: EDT²(i,j) = min_l [ f(i,l) + (j-l)² ] where
    f(i,l) = min_k [ INF·(mask==1)(k,l) + (i-k)² ] — two min-plus "matmuls" against
    the squared-distance kernel.  O(H²W + HW²) VPU work, no host round-trip, exact
    (this is the brute-force lower envelope; H,W ≤ ~1k keeps it cheap relative to
    the conv stack).  Matches scipy.ndimage.distance_transform_edt² on the
    complement convention used in loss.py:163-166.
    """
    from unet_torch_tpu.kernels.minplus import minplus

    h, w = mask.shape
    big = jnp.asarray(1e12, jnp.float32)
    # g[k, l] = 0 where mask is background (distance source), INF where foreground
    g = jnp.where(mask > 0, big, 0.0).astype(jnp.float32)
    ii = jnp.arange(h, dtype=jnp.float32)
    dk2 = (ii[:, None] - ii[None, :]) ** 2          # (i, k)
    f = minplus(dk2, g)                              # (i, l)
    jj = jnp.arange(w, dtype=jnp.float32)
    dl2 = (jj[:, None] - jj[None, :]) ** 2          # (l, j)
    d2 = minplus(f, dl2)                             # (i, j)
    return jnp.minimum(d2, big)


def _distance_field(img):
    """HausdorffDTLoss.distance_field (loss.py:153-168): fg_dist + bg_dist of the
    0.5-thresholded map; zero where the image has no foreground."""
    fg = (img > 0.5).astype(jnp.float32)
    fg_d = jnp.sqrt(euclidean_distance_transform_sq(1.0 - fg))  # dist inside fg
    bg_d = jnp.sqrt(euclidean_distance_transform_sq(fg))        # dist inside bg
    field = fg_d + bg_d
    return jnp.where(jnp.any(fg > 0), field, jnp.zeros_like(field))


def hausdorff_dt_loss(pred, target, alpha: float = 0.2):
    """HausdorffDTLoss (loss.py:146-212): (sigmoid(pred)-target)² weighted by
    pred_dt^alpha + target_dt^alpha; distance fields are non-differentiable
    constants (reference computes them under no_grad)."""
    p = jax.nn.sigmoid(_squeeze_last(pred))
    t = target.astype(p.dtype)
    pd = jax.lax.stop_gradient(jax.vmap(_distance_field)(p))
    td = jax.lax.stop_gradient(jax.vmap(_distance_field)(t))
    err = (p - t) ** 2
    # reference class default alpha=0.2 (loss.py:149); calc_loss uses the default
    distance = pd ** alpha + td ** alpha
    return jnp.mean(err * distance)


def hausdorff_er_loss(pred, target, alpha: float = 2.0, erosions: int = 10):
    """HausdorffERLoss (loss.py:51-143): morphological-erosion Hausdorff.

    bound = (sigmoid(pred) - target)²; repeat `erosions` times: convolve with the
    0.2-weighted 3x3 cross, soft-threshold at 0.5, min-max normalise, accumulate
    erosion * (k+1)^alpha.  Whole loop runs on device via lax.fori_loop (the
    reference loops scipy.ndimage.convolve on CPU under no_grad).
    """
    p = jax.nn.sigmoid(_squeeze_last(pred))
    t = target.astype(p.dtype)
    bound = jax.lax.stop_gradient((p - t) ** 2)[..., None]  # (B,H,W,1)
    cross = jnp.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], jnp.float32) * 0.2
    kernel = cross[:, :, None, None]  # HWIO

    def erode_once(carry, k):
        bound, acc = carry
        dil = jax.lax.conv_general_dilated(
            bound, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ero = jnp.maximum(dil - 0.5, 0.0)
        lo = jnp.min(ero, axis=(1, 2, 3), keepdims=True)
        hi = jnp.max(ero, axis=(1, 2, 3), keepdims=True)
        ptp = hi - lo
        ero = jnp.where(ptp > 0, (ero - lo) / jnp.where(ptp > 0, ptp, 1.0), ero)
        acc = acc + ero * (k + 1.0) ** alpha
        return (ero, acc), None

    (_, eroted), _ = jax.lax.scan(
        erode_once, (bound, jnp.zeros_like(bound)),
        jnp.arange(erosions, dtype=jnp.float32))
    return jnp.mean(eroted)


# ---------------------------------------------------------------------------
# Active contour (loss.py:12-48)
# ---------------------------------------------------------------------------

def active_contour_loss(pred, target, smooth: float = 1e-8):
    """ActiveContourLoss: contour-length + region terms (reference hardcodes
    512x512 cuda constants at loss.py:35-36; we use the target's own shape)."""
    p = jax.nn.sigmoid(pred)
    # NHWC: spatial axes 1 (H) and 2 (W)
    x = p[:, 1:, :, :] - p[:, :-1, :, :]
    y = p[:, :, 1:, :] - p[:, :, :-1, :]
    delta_x = x[:, 1:, :-2, :] ** 2
    delta_y = y[:, :-2, 1:, :] ** 2
    length = jnp.sum(jnp.sqrt(jnp.abs(delta_x + delta_y) + smooth))
    p0 = p[..., 0]
    t0 = target if target.ndim == 3 else target[..., 0]
    region_in = jnp.abs(jnp.sum(p0 * (t0 - 1.0) ** 2))
    region_out = jnp.abs(jnp.sum((1.0 - p0) * t0 ** 2))
    return length + region_in + region_out


# ---------------------------------------------------------------------------
# Multitask uncertainty (loss.py:309-325)
# ---------------------------------------------------------------------------

def multitask_uncertainty_loss(loss_values, log_vars, regression_flags):
    """Kendall-style learned log-variance weighting (loss.py:313-325):
    sum_i coeff_i*loss_i + log(sigma_i), coeff = 1/(2 sigma²) for regression tasks,
    1/sigma² otherwise."""
    total = 0.0
    for loss_i, log_var, is_reg in zip(loss_values, log_vars, regression_flags):
        std = jnp.exp(log_var) ** 0.5
        coeff = 1.0 / (2.0 * std**2) if is_reg else 1.0 / (std**2)
        total = total + coeff * loss_i + jnp.log(std)
    return total
