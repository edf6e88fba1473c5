"""Topological loss: persistence pairing correctness + gradient flow."""

import numpy as np

import jax
import jax.numpy as jnp

from unet_torch_tpu.losses.topo import (
    _superlevel_ph0_np,
    compute_pairing_windows,
    downsample_max,
    topo_loss,
    topocount_loss,
    topocount_loss_from_pairing,
    window_dot_counts,
)


def _blob_image(centers, shape=(32, 32), sigma=2.0):
    img = np.zeros(shape, np.float32)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    for (cy, cx) in centers:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))
    return np.clip(img, 0, 1)


def test_ph0_counts_blobs():
    img = _blob_image([(8, 8), (24, 24), (8, 24)])
    b, d, n = _superlevel_ph0_np(img, max_bars=16)
    flat = img.ravel()
    pers = flat[b[:n]] - flat[d[:n]]
    # three prominent bars (persistence near the blob heights), rest noise
    assert np.sum(pers > 0.5) == 3


def test_ph0_single_component():
    img = _blob_image([(16, 16)])
    b, d, n = _superlevel_ph0_np(img, max_bars=8)
    flat = img.ravel()
    pers = flat[b[:n]] - flat[d[:n]]
    assert np.sum(pers > 0.5) == 1


def test_topo_loss_zero_when_perfect():
    # prediction with exactly k sharp components matching GT components
    mask = np.zeros((1, 16, 16), np.float32)
    mask[0, 2:6, 2:6] = 1
    mask[0, 10:14, 10:14] = 1
    logits = jnp.asarray((mask * 2 - 1) * 20.0)[..., None]  # sigmoid ~ {0,1}
    loss = float(topo_loss(logits, jnp.asarray(mask), max_bars=8))
    assert loss < 1e-3


def test_topo_loss_penalises_spurious_component():
    mask = np.zeros((1, 16, 16), np.float32)
    mask[0, 2:6, 2:6] = 1
    pred = mask.copy()
    pred[0, 10:14, 10:14] = 1  # spurious blob
    logits = jnp.asarray((pred * 2 - 1) * 20.0)[..., None]
    loss = float(topo_loss(logits, jnp.asarray(mask), max_bars=8))
    assert loss > 0.5  # spurious bar has persistence ~1


def test_topo_loss_gradient_flows_to_critical_pixels():
    rng = np.random.RandomState(0)
    mask = np.zeros((1, 12, 12), np.float32)
    mask[0, 3:7, 3:7] = 1
    logits = jnp.asarray(rng.randn(1, 12, 12, 1).astype(np.float32))

    g = jax.grad(lambda p: topo_loss(p, jnp.asarray(mask), max_bars=8))(logits)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0  # gradient reaches the critical pixels


def test_downsample_max_matches_numpy_and_is_differentiable():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16).astype(np.float32)
    ref = x.reshape(2, 8, 2, 8, 2).max(axis=(2, 4))
    np.testing.assert_array_equal(np.asarray(downsample_max(jnp.asarray(x), 2)),
                                  ref)
    np.testing.assert_array_equal(downsample_max(x, 2), ref)
    assert downsample_max(x, 1) is x
    g = jax.grad(lambda v: jnp.sum(downsample_max(v, 2) ** 2))(jnp.asarray(x))
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
    # gradient lands only on window maxima: one nonzero per 2x2 window
    nz = (g != 0).reshape(2, 8, 2, 8, 2).sum(axis=(2, 4))
    assert (nz == 1).all()


def test_topocount_zero_when_windows_match():
    # 2 blobs in the top-left window, 1 in the bottom-right; dots agree
    pred = np.zeros((1, 32, 32), np.float32)
    dots = np.zeros((1, 32, 32), np.float32)
    for (cy, cx) in [(4, 4), (12, 12), (24, 24)]:
        pred[0, cy - 2:cy + 2, cx - 2:cx + 2] = 1
        dots[0, cy, cx] = 1
    logits = jnp.asarray((pred * 2 - 1) * 20.0)[..., None]
    loss = float(topocount_loss(logits, jnp.asarray(dots), window=16,
                                bars_per_window=4))
    assert loss < 1e-3


def test_topocount_localizes_what_global_misses():
    """GT: 2 dots in window A, 0 in window B.  Pred: 1 blob in each window.
    The GLOBAL count (2 == 2) is satisfied, but the localized TopoCount
    must penalise both the missing bar in A and the spurious bar in B."""
    dots = np.zeros((1, 32, 32), np.float32)
    dots[0, 4, 4] = 1
    dots[0, 12, 12] = 1  # both in window (0,0) at window=16
    pred = np.zeros((1, 32, 32), np.float32)
    pred[0, 2:6, 2:6] = 1       # one blob in window A
    pred[0, 24:28, 24:28] = 1   # one blob in window B (0 dots there)
    logits = jnp.asarray((pred * 2 - 1) * 20.0)[..., None]
    loc = float(topocount_loss(logits, jnp.asarray(dots), window=16,
                               bars_per_window=4))
    # global loss with the same k=2: both bars match the 2 most persistent
    mask = (pred > 0).astype(np.float32)
    glob = float(topo_loss(logits, jnp.asarray(mask), max_bars=8))
    assert loc > 0.5    # B's bar is unmatched (k=0 there): (b-d)^2 ~ 1
    assert glob < 1e-3  # the global view cannot see the misplacement


def test_topocount_two_phase_matches_callback_path():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 32, 32, 1).astype(np.float32))
    dots = jnp.asarray((rng.rand(2, 32, 32) > 0.98).astype(np.float32))
    one_call = float(topocount_loss(logits, dots, window=16,
                                    bars_per_window=4))
    lik = 1.0 / (1.0 + np.exp(-np.asarray(logits)[..., 0]))
    counts = np.asarray(window_dot_counts(np.asarray(dots), 16))
    b, d, n, k = compute_pairing_windows(lik, counts, 16, 4)
    two_phase = float(topocount_loss_from_pairing(
        logits, jnp.asarray(b), jnp.asarray(d), jnp.asarray(n),
        jnp.asarray(k), 4))
    np.testing.assert_allclose(one_call, two_phase, rtol=1e-6)


def test_topocount_gradient_flows():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 16, 16, 1).astype(np.float32))
    dots = np.zeros((1, 16, 16), np.float32)
    dots[0, 4, 4] = 1
    g = jax.grad(lambda p: topocount_loss(p, jnp.asarray(dots), window=8,
                                          bars_per_window=4))(logits)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_calc_loss_topocount_dispatch():
    from unet_torch_tpu.losses import calc_loss

    pred = np.zeros((1, 64, 64), np.float32)
    pred[0, 10:14, 10:14] = 1
    dots = np.zeros((1, 64, 64), np.float32)
    dots[0, 12, 12] = 1
    logits = jnp.asarray((pred * 2 - 1) * 20.0)[..., None]
    loss = float(calc_loss(logits, jnp.asarray(dots), loss_type="TopoCount"))
    assert loss < 1e-3


def test_topo_steps_coarse_pairing_and_topocount():
    """make_topo_steps with pair_downsample=2 (global) and loss_type=
    'TopoCount' (localized): serial step, pipeline, and eval all run and
    advance state; the coarse serial loss equals the loss computed from a
    host pairing of the pooled map (consistency of ds indices)."""
    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_topo_steps

    model = UNet(3, 1, 4)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray((rng.rand(2, 32, 32) > 0.6), jnp.float32)
    dots = jnp.asarray(rng.rand(2, 32, 32) > 0.99, jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)

    # global loss, coarse pairing
    (_w, _we), (topo_step, topo_eval), TopoPipeline = make_topo_steps(
        model, tx, "TopoLoss", 1, pair_downsample=2)
    v = jax.tree.map(jnp.array, variables)
    st = TrainState.create(v["params"], v.get("batch_stats", {}), tx)
    st, loss = topo_step(st, x, y, dots, 1e-3, jax.random.key(1))
    assert np.isfinite(float(loss)) and int(st.step) == 1
    ev_loss, _ = topo_eval(st, x, y, dots)
    assert np.isfinite(float(ev_loss))
    pipe = TopoPipeline()
    st, _ = pipe.step(st, x, y, dots, 1e-3, jax.random.key(2))
    st, drained = pipe.flush(st)
    assert np.isfinite(float(drained[0])) and int(st.step) == 2

    # localized TopoCount (full-res and coarse)
    for extra in ({"window": 8, "bars_per_window": 4},
                  {"window": 8, "bars_per_window": 4, "pair_downsample": 2}):
        (_w2, _we2), (tc_step, tc_eval), TCPipeline = make_topo_steps(
            model, tx, "TopoCount", 1, **extra)
        v = jax.tree.map(jnp.array, variables)
        st = TrainState.create(v["params"], v.get("batch_stats", {}), tx)
        st, loss = tc_step(st, x, y, dots, 1e-3, jax.random.key(1))
        assert np.isfinite(float(loss)) and int(st.step) == 1
        ev_loss, _ = tc_eval(st, x, y, dots)
        assert np.isfinite(float(ev_loss))
        pipe = TCPipeline()
        st, _ = pipe.step(st, x, y, dots, 1e-3, jax.random.key(2))
        st, drained = pipe.flush(st)
        assert np.isfinite(float(drained[0])) and int(st.step) == 2


def test_topo_pipeline_completes_every_batch():
    """Depth-2 pipeline bookkeeping: every batch produces exactly one update
    (state.step advances once per batch), flush drains all pending, and
    epochs shorter than the pipeline depth still train."""
    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_topo_steps

    model = UNet(3, 1, 4)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray((rng.rand(2, 32, 32) > 0.6), jnp.float32)
    dots = jnp.asarray(rng.rand(2, 32, 32) > 0.99, jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)
    (_w, _we), (_ts, _te), TopoPipeline = make_topo_steps(model, tx,
                                                          "TopoLoss", 1)

    for n_batches in (1, 2, 5):  # below, at, and above the default depth
        pipe = TopoPipeline()
        # fresh, unaliased state each round: _topo_update donates its
        # buffers, which would invalidate `variables` itself
        v = jax.tree.map(jnp.array, variables)
        st = TrainState.create(v["params"], v.get("batch_stats", {}), tx)
        start = int(st.step)  # read before the update donates the buffers
        losses = []
        for _ in range(n_batches):
            st, loss = pipe.step(st, x, y, dots, 1e-3, jax.random.key(1))
            if loss is not None:
                losses.append(loss)
        st, drained = pipe.flush(st)
        losses.extend(drained)
        assert int(st.step) == start + n_batches
        # every batch contributes exactly one loss entry (equal weighting)
        assert len(losses) == n_batches
        assert all(np.isfinite(np.asarray(l)) for l in losses)
