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
