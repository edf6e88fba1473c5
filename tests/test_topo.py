"""Topological loss: persistence pairing correctness + gradient flow."""

import numpy as np

import jax
import jax.numpy as jnp

from unet_torch_tpu.losses.topo import _superlevel_ph0_np, topo_loss


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
