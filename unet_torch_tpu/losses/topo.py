"""Topological (persistent-homology) loss.

The reference workflow depends on a family of topological losses (`TopoLoss`,
`MyTopoLoss1/2/Graph/VR`, `TopoCount` — dispatched at /root/reference/Trainer.py:115
and requested by /root/reference/CLTR/config.json:36-42) whose implementations were
deleted before the snapshot (only __pycache__ remains; SURVEY §0).  This module
re-creates the capability as a Topology-Preserving-Segmentation-style loss
(Hu et al., NeurIPS 2019):

  1. Compute the 0-dimensional persistence diagram of the *superlevel* filtration
     of the predicted likelihood map (union-find with the elder rule), recording
     for every bar the birth/death *critical pixels*.
  2. The ground-truth diagram of a binary mask is k copies of the bar (1, 0),
     where k = number of foreground connected components.
  3. Match the k most persistent predicted bars to (1, 0); the rest match to the
     diagonal.  Loss = Σ_matched (b-1)² + d²  +  Σ_unmatched (b-d)².

TPU-native structure: the inherently-sequential union-find pairing runs on the host
through ``jax.pure_callback`` and returns only *indices* (static-shaped, padded to
``max_bars``); the loss itself is then a differentiable gather over the on-device
likelihood map, so gradients flow exactly through the critical pixels — no custom
VJP needed and the surrounding train step stays one XLA program.

The pairing backend prefers the C++ extension (unet_torch_tpu/native) and falls
back to pure numpy.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_NEIGH8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _superlevel_ph0_np(img: np.ndarray, max_bars: int):
    """0-dim PH of the superlevel filtration of ``img`` (H, W), elder rule.

    Returns (birth_idx, death_idx, n_bars): flat pixel indices of each bar's
    birth/death critical pixels, sorted by persistence (descending), padded to
    ``max_bars``.  The essential bar (last surviving component) dies at the global
    minimum pixel.
    """
    h, w = img.shape
    flat = img.ravel()
    order = np.argsort(-flat, kind="stable")
    parent = np.full(h * w, -1, dtype=np.int64)
    birth_of = np.zeros(h * w, dtype=np.int64)  # root -> birth pixel
    births, deaths = [], []

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for px in order:
        parent[px] = px
        birth_of[px] = px
        y, x = divmod(int(px), w)
        for dy, dx in _NEIGH8:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w:
                npx = ny * w + nx
                if parent[npx] != -1:
                    ra, rb = find(px), find(npx)
                    if ra != rb:
                        ba, bb = birth_of[ra], birth_of[rb]
                        # elder rule: the component with the lower birth value dies
                        if flat[ba] <= flat[bb]:
                            young, old = ra, rb
                            yb = ba
                        else:
                            young, old = rb, ra
                            yb = bb
                        births.append(int(yb))
                        deaths.append(int(px))
                        parent[young] = old
    # essential bar: survives to the global minimum
    if len(order):
        root = find(int(order[0]))
        births.append(int(birth_of[root]))
        deaths.append(int(order[-1]))

    births = np.asarray(births, dtype=np.int64)
    deaths = np.asarray(deaths, dtype=np.int64)
    pers = flat[births] - flat[deaths]
    sel = np.argsort(-pers, kind="stable")[:max_bars]
    births, deaths = births[sel], deaths[sel]
    n = len(births)
    b = np.zeros(max_bars, dtype=np.int32)
    d = np.zeros(max_bars, dtype=np.int32)
    b[:n] = births
    d[:n] = deaths
    return b, d, np.int32(n)


def _count_components_np(mask: np.ndarray) -> int:
    """Connected components (8-conn) of a binary mask — host side (native C++
    union-find when built, cv2 otherwise)."""
    try:
        from unet_torch_tpu.native import ph0 as _native

        return _native.count_components(mask.astype(np.uint8))
    except Exception:  # pragma: no cover
        import cv2

        n, _ = cv2.connectedComponents(mask.astype(np.uint8), connectivity=8)
        return int(n - 1)


def _pairing_host(likelihood: np.ndarray, target: np.ndarray, max_bars: int,
                  kgt_override: np.ndarray | None = None):
    """Host pairing over a batch: (B,H,W)x2 -> padded bar indices + counts.

    ``kgt_override`` supplies the true-component count directly (e.g. the dot
    map sum in the warm-up trainer, where the loss target is [labels, gt_dot]
    — Trainer.py:344-346); otherwise it is the target mask's CC count."""
    try:
        from unet_torch_tpu.native import ph0 as _native
    except Exception:  # pragma: no cover - native build unavailable
        _native = None
    bsz = likelihood.shape[0]
    births = np.zeros((bsz, max_bars), np.int32)
    deaths = np.zeros((bsz, max_bars), np.int32)
    nbars = np.zeros((bsz,), np.int32)
    kgt = np.zeros((bsz,), np.int32)
    for i in range(bsz):
        if _native is not None:
            b, d, n = _native.superlevel_ph0(
                np.asarray(likelihood[i], np.float32), max_bars)
        else:
            b, d, n = _superlevel_ph0_np(likelihood[i], max_bars)
        births[i], deaths[i], nbars[i] = b, d, n
        if kgt_override is not None:
            kgt[i] = int(kgt_override[i])
        else:
            kgt[i] = _count_components_np(target[i] > 0.5)
    return births, deaths, nbars, kgt


def persistence_diagram(likelihood, max_bars: int = 64):
    """Birth/death critical-pixel indices of the top-``max_bars`` 0-dim bars."""
    b, d, n = jax.pure_callback(
        lambda x: _superlevel_ph0_np(np.asarray(x), max_bars),
        (jax.ShapeDtypeStruct((max_bars,), jnp.int32),
         jax.ShapeDtypeStruct((max_bars,), jnp.int32),
         jax.ShapeDtypeStruct((), jnp.int32)),
        likelihood,
    )
    return b, d, n


def topo_loss_from_pairing(logits, births, deaths, nbars, kgt,
                           max_bars: int = 64):
    """The differentiable half of the topo loss: given pairing indices
    (computed on host), gather the critical-pixel likelihoods and penalise.
    Pure jnp — safe inside any jit on any backend."""
    logits = logits[..., 0] if logits.ndim == 4 else logits
    lik = jax.nn.sigmoid(logits)
    bsz = lik.shape[0]
    flat = lik.reshape(bsz, -1)
    bvals = jnp.take_along_axis(flat, births.astype(jnp.int32), axis=1)
    dvals = jnp.take_along_axis(flat, deaths.astype(jnp.int32), axis=1)
    idx = jnp.arange(max_bars)[None, :]
    valid = idx < nbars[:, None]
    matched = valid & (idx < kgt[:, None])
    unmatched = valid & ~matched
    loss = jnp.sum(jnp.where(matched, (bvals - 1.0) ** 2 + dvals**2, 0.0)) + \
        jnp.sum(jnp.where(unmatched, (bvals - dvals) ** 2, 0.0))
    return loss / bsz


def compute_pairing(likelihood: np.ndarray, target: np.ndarray | None,
                    max_bars: int = 64, kgt_override=None):
    """Host-side pairing on concrete arrays (the split-step path for backends
    without host callbacks, e.g. the axon TPU runtime).  ``target`` may be
    None when ``kgt_override`` supplies the component counts (the mask is
    only read for its CC count)."""
    if target is None and kgt_override is None:
        raise ValueError("target may only be None with kgt_override")
    return _pairing_host(np.asarray(likelihood),
                         None if target is None else np.asarray(target),
                         max_bars, kgt_override)


def downsample_max(x, ds: int):
    """2D max-pool a (B, H, W) map by ``ds`` via reshape-max (H, W divisible
    by ds).  Works in jnp (differentiable — the gradient flows to the window
    argmax) and numpy alike.  ds=1 is the identity.

    Used for coarse PH pairing: the superlevel filtration of the max-pooled
    likelihood preserves every local-max birth (a peak survives pooling) while
    the host union-find runs on ds² fewer pixels (the ~41 ms/512²-img native
    pairing cost scales ~linearly in pixels).  sigmoid is monotonic, so
    pooling logits before sigmoid equals pooling the likelihood."""
    if ds == 1:
        return x
    b, h, w = x.shape
    return x.reshape(b, h // ds, ds, w // ds, ds).max(axis=(2, 4))


# ---------------------------------------------------------------------------
# Localized per-window PH constraint — the `TopoCount` flavour
# ---------------------------------------------------------------------------

def _window_pairing_host(likelihood: np.ndarray, dot_counts: np.ndarray,
                         window: int, bars_per_window: int):
    """TopoCount-style localized pairing (Abousamra et al., AAAI 2021
    "Localization in the Crowd with Topological Constraints": a per-window
    0-dim persistence constraint ties the number of significant peaks in
    each window to the dot count there, instead of one global count).

    likelihood: (B, H, W) f32; dot_counts: (B, nwin) int — the per-window
    ground-truth dot counts (window grid in row-major order).  Returns
    (births, deaths) as GLOBAL flat indices (B, nwin*bars), nbars (B, nwin),
    kgt (B, nwin) — all int32, padded per window.
    """
    try:
        from unet_torch_tpu.native import ph0 as _native
    except Exception:  # pragma: no cover - native build unavailable
        _native = None
    bsz, h, w = likelihood.shape
    if h % window or w % window:
        raise ValueError(f"window {window} must divide ({h}, {w})")
    gy, gx = h // window, w // window
    nwin = gy * gx
    births = np.zeros((bsz, nwin * bars_per_window), np.int32)
    deaths = np.zeros((bsz, nwin * bars_per_window), np.int32)
    nbars = np.zeros((bsz, nwin), np.int32)
    for i in range(bsz):
        for wy in range(gy):
            for wx in range(gx):
                crop = np.ascontiguousarray(
                    likelihood[i, wy * window:(wy + 1) * window,
                               wx * window:(wx + 1) * window], np.float32)
                if _native is not None:
                    b, d, n = _native.superlevel_ph0(crop, bars_per_window)
                else:
                    b, d, n = _superlevel_ph0_np(crop, bars_per_window)
                # local (window-flat) -> global flat indices
                ly, lx = np.divmod(b.astype(np.int64), window)
                gb = (wy * window + ly) * w + wx * window + lx
                ly, lx = np.divmod(d.astype(np.int64), window)
                gd = (wy * window + ly) * w + wx * window + lx
                k = wy * gx + wx
                s = slice(k * bars_per_window, (k + 1) * bars_per_window)
                births[i, s] = gb
                deaths[i, s] = gd
                nbars[i, k] = n
    return births, deaths, nbars, np.asarray(dot_counts, np.int32)


def topocount_loss_from_pairing(logits, births, deaths, nbars, kgt,
                                bars_per_window: int):
    """Differentiable half of the localized TopoCount loss: per-window
    matched/unmatched bar penalties gathered from the full likelihood map.

    births/deaths: (B, nwin*bars) global flat indices; nbars/kgt: (B, nwin).
    In each window the kgt most persistent bars match the ideal (1, 0) bar
    and the rest match the diagonal — the same penalty as the global loss,
    applied per window so every annotated dot constrains its own
    neighbourhood."""
    logits = logits[..., 0] if logits.ndim == 4 else logits
    lik = jax.nn.sigmoid(logits)
    bsz = lik.shape[0]
    nwin = nbars.shape[1]
    flat = lik.reshape(bsz, -1)
    bvals = jnp.take_along_axis(flat, births.astype(jnp.int32), axis=1)
    dvals = jnp.take_along_axis(flat, deaths.astype(jnp.int32), axis=1)
    bvals = bvals.reshape(bsz, nwin, bars_per_window)
    dvals = dvals.reshape(bsz, nwin, bars_per_window)
    idx = jnp.arange(bars_per_window)[None, None, :]
    valid = idx < nbars[:, :, None]
    matched = valid & (idx < kgt[:, :, None])
    unmatched = valid & ~matched
    loss = jnp.sum(jnp.where(matched, (bvals - 1.0) ** 2 + dvals**2, 0.0)) + \
        jnp.sum(jnp.where(unmatched, (bvals - dvals) ** 2, 0.0))
    return loss / bsz


def effective_window(h: int, w: int, window: int) -> int:
    """Largest window ≤ ``window`` that tiles (h, w) exactly — clamps the
    512²-tuned default (64) to small inputs (a 64² crop gets one window) and
    walks down to a common divisor for odd sizes.

    Refuses to degenerate: an awkward size (e.g. a prime 509) would walk to
    eff=1, making the host pairing loop O(H·W) windows per image — a silent
    multi-minute hang on the 1-vCPU host.  Below a floor of 8 (when the
    input is at least that big) this raises instead; pad/crop to a multiple
    of 8 or use the global ``TopoLoss``."""
    eff = max(1, min(window, h, w))
    while h % eff or w % eff:
        eff -= 1
    if eff < min(8, h, w):
        raise ValueError(
            f"TopoCount window degenerated to {eff} for a {h}x{w} input "
            f"(no common divisor >= 8 under window={window}); pad/crop the "
            f"input to a multiple of 8 or use the global TopoLoss")
    return eff


def window_dot_counts(gt_dot, window: int):
    """Per-window dot counts (B, nwin) from a (B, H, W) dot map — jnp or
    numpy (row-major window grid, matching _window_pairing_host)."""
    b, h, w = gt_dot.shape
    gy, gx = h // window, w // window
    return gt_dot.reshape(b, gy, window, gx, window).sum(
        axis=(2, 4)).reshape(b, gy * gx)


def compute_pairing_windows(likelihood: np.ndarray, gt_dot: np.ndarray,
                            window: int, bars_per_window: int):
    """Host-side localized pairing on concrete arrays (two-phase TPU path);
    gt_dot may be either a (B, H, W) dot map or precomputed (B, nwin)
    counts."""
    gt_dot = np.asarray(gt_dot)
    if gt_dot.ndim == 3:
        counts = np.asarray(window_dot_counts(gt_dot, window))
    else:
        counts = gt_dot
    return _window_pairing_host(np.asarray(likelihood), counts, window,
                                bars_per_window)


def topocount_loss(pred, gt_dot, window: int = 64, bars_per_window: int = 8):
    """Localized TopoCount loss on (B,H,W,1)/(B,H,W) logits vs a (B,H,W)
    dot-annotation map (each dot = one object).  Routes the per-window PH
    pairing through jax.pure_callback — use compute_pairing_windows +
    topocount_loss_from_pairing on backends without host callbacks (the
    two-phase pattern in train.steps.make_topo_steps)."""
    logits = pred[..., 0] if pred.ndim == 4 else pred
    lik = jax.nn.sigmoid(logits)
    bsz, h, w = lik.shape
    window = effective_window(h, w, window)
    nwin = (h // window) * (w // window)
    counts = window_dot_counts(gt_dot, window).astype(jnp.int32)
    births, deaths, nbars, kgt = jax.pure_callback(
        lambda p, c: _window_pairing_host(np.asarray(p), np.asarray(c),
                                          window, bars_per_window),
        (jax.ShapeDtypeStruct((bsz, nwin * bars_per_window), jnp.int32),
         jax.ShapeDtypeStruct((bsz, nwin * bars_per_window), jnp.int32),
         jax.ShapeDtypeStruct((bsz, nwin), jnp.int32),
         jax.ShapeDtypeStruct((bsz, nwin), jnp.int32)),
        jax.lax.stop_gradient(lik), counts,
    )
    return topocount_loss_from_pairing(pred, births, deaths, nbars, kgt,
                                       bars_per_window)


def topo_loss(pred, target, max_bars: int = 64):
    """Topological loss on (B,H,W,1)/(B,H,W) logits vs binary (B,H,W) target.

    Differentiable through the likelihood values at the critical pixels.
    This single-call form routes the PH pairing through jax.pure_callback —
    use `compute_pairing` + `topo_loss_from_pairing` (two-phase, as in
    train.steps.make_topo_steps' TPU path) on backends without host callbacks.
    """
    logits = pred[..., 0] if pred.ndim == 4 else pred
    lik = jax.nn.sigmoid(logits)
    t = (target > 0.5).astype(jnp.float32)
    bsz = lik.shape[0]

    births, deaths, nbars, kgt = jax.pure_callback(
        lambda p, tt: _pairing_host(np.asarray(p), np.asarray(tt), max_bars),
        (jax.ShapeDtypeStruct((bsz, max_bars), jnp.int32),
         jax.ShapeDtypeStruct((bsz, max_bars), jnp.int32),
         jax.ShapeDtypeStruct((bsz,), jnp.int32),
         jax.ShapeDtypeStruct((bsz,), jnp.int32)),
        jax.lax.stop_gradient(lik), t,
    )
    return topo_loss_from_pairing(pred, births, deaths, nbars, kgt, max_bars)
