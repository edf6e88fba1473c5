"""W-folded level-1 path (nn/folded.py) + the r3 perf VJPs (argmax max-pool,
reverse-free conv-transpose) — equivalence against the plain implementations
and against torch semantics.

Reference ops: DoubleConv /root/reference/Model.py:7-26, MaxPool2d
Model.py:33, ConvTranspose2d Model.py:59.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from unet_torch_tpu.nn import blocks, folded


def _leaf_paths(tree):
    return [jtu.keystr(k) for k, _ in jtu.tree_leaves_with_path(tree)]


# ---------------------------------------------------------------------------
# max_pool_2x2: argmax custom VJP
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(2, 8, 8, 4), (2, 9, 7, 4)])
def test_argmax_pool_matches_default(rng, shape):
    """The (unwired) argmax-VJP pool experiment agrees with the reshape-max
    default on values, and on gradients wherever there are no ties."""
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    np.testing.assert_array_equal(np.asarray(blocks._max_pool_2x2_argmax(x)),
                                  np.asarray(blocks.max_pool_2x2(x)))
    ga = jax.grad(lambda v: jnp.sum(jnp.cos(blocks.max_pool_2x2(v))))(x)
    gb = jax.grad(
        lambda v: jnp.sum(jnp.cos(blocks._max_pool_2x2_argmax(v))))(x)
    # distinct float values -> no ties -> gradients agree exactly
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=0)


def test_argmax_pool_tie_gradient_matches_torch(rng):
    torch = pytest.importorskip("torch")
    xq = np.round(rng.rand(3, 16, 16, 5) * 3) / 3  # quantized -> many ties
    w = np.abs(rng.randn(3, 8, 8, 5)).astype(np.float32)
    gj = jax.grad(
        lambda v: jnp.sum(blocks._max_pool_2x2_argmax(v) * w))(
            jnp.asarray(xq, jnp.float32))
    t = torch.tensor(xq.transpose(0, 3, 1, 2), dtype=torch.float32,
                     requires_grad=True)
    (torch.nn.functional.max_pool2d(t, 2)
     * torch.tensor(w.transpose(0, 3, 1, 2))).sum().backward()
    np.testing.assert_allclose(np.asarray(gj),
                               t.grad.numpy().transpose(0, 2, 3, 1), atol=0)


def test_folded_pool_matches_plain(rng):
    x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    ref = blocks.max_pool_2x2(x)
    got = folded.max_pool_2x2_folded(folded.fold(x))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    gr = jax.grad(lambda v: jnp.sum(jnp.sin(blocks.max_pool_2x2(v))))(x)
    gf = jax.grad(lambda v: jnp.sum(jnp.sin(
        folded.max_pool_2x2_folded(folded.fold(v)))))(x)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gf), atol=0)


# ---------------------------------------------------------------------------
# conv_transpose_2x2: reverse-free custom VJP
# ---------------------------------------------------------------------------

def test_convt_vjp_matches_flax(rng):
    from flax import linen as nn

    x = jnp.asarray(rng.randn(2, 16, 12, 8), jnp.float32)
    ref_m = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    v = ref_m.init(jax.random.key(0), x)
    got_m = blocks.TorchConvTranspose2x2(4)
    np.testing.assert_array_equal(
        np.asarray(ref_m.apply(v, x)),
        np.asarray(got_m.apply({"params": v["params"]}, x)))

    def loss(m, p, xx):
        return jnp.sum(jnp.sin(m.apply({"params": p}, xx)))

    gr = jax.grad(lambda p: loss(ref_m, p, x))(v["params"])
    gg = jax.grad(lambda p: loss(got_m, p, x))(v["params"])
    for k in ("kernel", "bias"):
        np.testing.assert_allclose(np.asarray(gr[k]), np.asarray(gg[k]),
                                   rtol=1e-5, atol=1e-5)
    gxr = jax.grad(lambda xx: loss(ref_m, v["params"], xx))(x)
    gxg = jax.grad(lambda xx: loss(got_m, v["params"], xx))(x)
    np.testing.assert_allclose(np.asarray(gxr), np.asarray(gxg),
                               rtol=1e-5, atol=1e-5)


def test_folded_upconvt_matches_flax(rng):
    from flax import linen as nn

    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    ref_m = nn.ConvTranspose(8, (2, 2), strides=(2, 2))
    v = ref_m.init(jax.random.key(0), x)
    got = folded.FoldedUpConvT(8).apply({"params": v["params"]}, x)
    np.testing.assert_allclose(np.asarray(ref_m.apply(v, x)),
                               np.asarray(folded.unfold(got)),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# folded conv / full-model equivalence
# ---------------------------------------------------------------------------

def test_fold_kernel_conv_equivalence(rng):
    from jax import lax

    x = jnp.asarray(rng.randn(2, 12, 12, 6), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 6, 10) * 0.2, jnp.float32)
    ref = lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = folded.unfold(lax.conv_general_dilated(
        folded.fold(x), folded.fold_kernel(k), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_unet_fold_equivalence(rng):
    from unet_torch_tpu.models.unet import UNet

    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    m0, m1 = UNet(3, 3, 8), UNet(3, 3, 8, fold=True)
    v0 = m0.init(jax.random.key(0), x, train=False)
    v1 = m1.init(jax.random.key(0), x, train=False)
    assert _leaf_paths(v0) == _leaf_paths(v1)
    for (_, a), (_, b) in zip(jtu.tree_leaves_with_path(v0),
                              jtu.tree_leaves_with_path(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.testing.assert_allclose(np.asarray(m0.apply(v0, x, train=False)),
                               np.asarray(m1.apply(v0, x, train=False)),
                               atol=1e-4)
    o0, mut0 = m0.apply(v0, x, train=True, mutable=["batch_stats"])
    o1, mut1 = m1.apply(v0, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-4)
    for (_, a), (_, b) in zip(jtu.tree_leaves_with_path(mut0),
                              jtu.tree_leaves_with_path(mut1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_unet_fold_grad_equivalence(rng):
    from unet_torch_tpu.models.unet import UNet

    x = jnp.asarray(rng.randn(1, 16, 16, 3), jnp.float32)
    m0, m1 = UNet(3, 2, 8), UNet(3, 2, 8, fold=True)
    v = m0.init(jax.random.key(0), x, train=False)

    def loss(m, p):
        out, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.sin(out))

    g0 = jax.jit(jax.grad(lambda p: loss(m0, p)))(v["params"])
    g1 = jax.jit(jax.grad(lambda p: loss(m1, p)))(v["params"])
    for (_, a), (_, b) in zip(jtu.tree_leaves_with_path(g0),
                              jtu.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_unet_fold_odd_size_fallback(rng):
    """Sizes not divisible by 16 silently use the unfolded path — same params,
    same results."""
    from unet_torch_tpu.models.unet import UNet

    x = jnp.asarray(rng.randn(1, 24, 24, 3), jnp.float32)
    m0, m1 = UNet(3, 3, 8), UNet(3, 3, 8, fold=True)
    v = m0.init(jax.random.key(0), x, train=False)
    np.testing.assert_array_equal(
        np.asarray(m0.apply(v, x, train=False)),
        np.asarray(m1.apply(v, x, train=False)))


def test_multitask_fold_equivalence(rng):
    from unet_torch_tpu.models.unet import UNetMultitask

    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    m0, m1 = UNetMultitask(3, 1, 8), UNetMultitask(3, 1, 8, fold=True)
    v = m0.init(jax.random.key(1), x, train=False)
    for a, b in zip(m0.apply(v, x, train=False), m1.apply(v, x, train=False)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# ---------------------------------------------------------------------------
# TPUDropout (rbg-backed nn.Dropout drop-in)
# ---------------------------------------------------------------------------

def test_tpu_dropout_semantics(rng):
    x = jnp.asarray(rng.rand(4, 32, 32, 8) + 1.0, jnp.float32)
    m = blocks.TPUDropout(0.3)
    # deterministic: identity
    y = m.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # train: zeros + 1/(1-p) scaling, keep-rate near p
    y = m.apply({}, x, deterministic=False,
                rngs={"dropout": jax.random.key(0)})
    y = np.asarray(y)
    kept = y != 0
    assert abs(kept.mean() - 0.7) < 0.02
    np.testing.assert_allclose(y[kept], np.asarray(x)[kept] / 0.7, rtol=1e-6)
    # rate 0 / rate 1 edges
    np.testing.assert_array_equal(
        np.asarray(blocks.TPUDropout(0.0).apply(
            {}, x, deterministic=False,
            rngs={"dropout": jax.random.key(0)})), np.asarray(x))
    assert not np.any(np.asarray(blocks.TPUDropout(1.0).apply(
        {}, x, deterministic=False, rngs={"dropout": jax.random.key(0)})))
    # same rng -> same mask (replays deterministically, e.g. under remat)
    a = m.apply({}, x, deterministic=False, rngs={"dropout": jax.random.key(7)})
    b = m.apply({}, x, deterministic=False, rngs={"dropout": jax.random.key(7)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transunet_folded_tail_equivalence():
    """VisionTransformer's W-folded decoder tail (fold=128/C_last) computes
    the same function as the unfolded path on the SAME param tree — fwd,
    grads and BN batch stats (r4, models/transunet/vit.py)."""
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.models.transunet import vit as V
    from unet_torch_tpu.models.transunet import build_transunet

    model = build_transunet("TransUnet", img_size=32, n_channels=3,
                            num_classes=3, variant="testing")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    assert V._tail_fold_factor(model.config, 32) == 8  # engaged

    out_folded = model.apply(variables, x, train=False)

    orig = V._tail_fold_factor
    V._tail_fold_factor = lambda cfg, sz: 1
    try:
        out_ref = model.apply(variables, x, train=False)
        # train-mode grads + batch stats
        def loss(params, fold_on):
            V._tail_fold_factor = orig if fold_on else (lambda c, s: 1)
            out, mut = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)})
            return (out.astype(jnp.float32) ** 2).mean(), mut["batch_stats"]

        # static fold_on + jit: the global patch executes at trace time and
        # the persistent compilation cache absorbs the (slow) CPU compile
        grad_fn = jax.jit(jax.value_and_grad(loss, has_aux=True),
                          static_argnums=1)
        (l1, bs1), g1 = grad_fn(variables["params"], True)
        (l0, bs0), g0 = grad_fn(variables["params"], False)
    finally:
        V._tail_fold_factor = orig

    np.testing.assert_allclose(np.asarray(out_folded), np.asarray(out_ref),
                               atol=2e-5)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat0 = jax.tree_util.tree_leaves(g0)
    for a, b in zip(flat1, flat0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(bs1),
                    jax.tree_util.tree_leaves(bs0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_planes_head_loss_equivalence(rng):
    """Fused planes head (planes=True + dice_bce_mc_planes_folded) matches
    the standard path (unfolded logits + dice_bce_mc_loss): value and
    gradients, train mode."""
    from unet_torch_tpu.losses.functional import (dice_bce_mc_loss,
                                                  dice_bce_mc_planes_folded)
    from unet_torch_tpu.models.unet import UNet

    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 3, (2, 32, 32)), jnp.float32)
    m = UNet(3, 3, 8, fold=True)
    v = m.init(jax.random.key(0), x, train=False)
    assert m.supports_planes(x.shape)

    def loss_std(p):
        out, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        return dice_bce_mc_loss(out, y, 3)

    def loss_planes(p):
        planes, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                            x, train=True, planes=True,
                            mutable=["batch_stats"])
        assert planes.shape == (6, 2, 32, 16)
        return dice_bce_mc_planes_folded(planes, y, 3)

    l0, g0 = jax.jit(jax.value_and_grad(loss_std))(v["params"])
    l1, g1 = jax.jit(jax.value_and_grad(loss_planes))(v["params"])
    # equal up to f32 summation order (pixels regrouped by W-parity)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for (_, a), (_, b) in zip(jtu.tree_leaves_with_path(g0),
                              jtu.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_planes_head_train_step_equivalence(rng):
    """make_single_steps(fused_head=True) takes the planes path and produces
    the same loss/params as the standard step; on a non-divisible size it
    falls back to the standard path."""
    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 3, (2, 32, 32)), jnp.float32)
    m = UNet(3, 3, 8, fold=True)
    tx = make_optimizer("Adam", 1e-3, 0.0)
    v = m.init(jax.random.key(0), x, train=False)

    def run(fused):
        vv = jax.tree.map(jnp.array, v)  # donation-safe fresh buffers
        st = TrainState.create(vv["params"], vv.get("batch_stats", {}), tx)
        step, _ = make_single_steps(m, tx, "dice_bce_mc", "dice_bce_mc", 3,
                                    fused_head=fused)
        st, loss = step(st, x, y, 1e-3, jax.random.key(1))
        return float(loss), st

    l0, st0 = run(False)
    l1, st1 = run(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for (_, a), (_, b) in zip(jtu.tree_leaves_with_path(st0.params),
                              jtu.tree_leaves_with_path(st1.params)):
        # Adam's first-step update is ~±lr even for tiny grads, so f32
        # summation-order noise on near-zero grads shows up at ~5e-4 rel on
        # isolated elements; a wrong plane mapping would diverge at ~2*lr
        # across whole tensors.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-6)

    # odd size: planes unsupported, fused step must fall back and still run
    x_odd = jnp.asarray(rng.randn(2, 24, 24, 3), jnp.float32)
    y_odd = jnp.asarray(rng.randint(0, 3, (2, 24, 24)), jnp.float32)
    assert not m.supports_planes(x_odd.shape)
    vv = jax.tree.map(jnp.array, v)
    st = TrainState.create(vv["params"], vv.get("batch_stats", {}), tx)
    step, _ = make_single_steps(m, tx, "dice_bce_mc", "dice_bce_mc", 3,
                                fused_head=True)
    st, loss = step(st, x_odd, y_odd, 1e-3, jax.random.key(1))
    assert np.isfinite(float(loss))


def test_planes_head_mse_single_equivalence(rng):
    """fused_head on the C=1 regression path (mse + ReLU): one train step
    matches the standard path."""
    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(np.abs(rng.randn(2, 32, 32)), jnp.float32)
    m = UNet(3, 1, 8, fold=True)
    tx = make_optimizer("SGD", 1e-3, 0.0)
    v = m.init(jax.random.key(0), x, train=False)

    def run(fused):
        vv = jax.tree.map(jnp.array, v)
        st = TrainState.create(vv["params"], vv.get("batch_stats", {}), tx)
        step, _ = make_single_steps(m, tx, "mse", "mse", 1, relu_output=True,
                                    fused_head=fused)
        st, loss = step(st, x, y, 1e-3, jax.random.key(1))
        return float(loss), st

    l0, st0 = run(False)
    l1, st1 = run(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for (_, a), (_, b) in zip(jtu.tree_leaves_with_path(st0.params),
                              jtu.tree_leaves_with_path(st1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-6)


@pytest.mark.parametrize("combine", ["sum", "uncertainty", "ratio"])
def test_planes_head_multitask_equivalence(rng, combine):
    """fused_head on the two-head mse loops: one train step (incl. the ratio
    combine's per-image count sums computed in plane form) matches the
    standard path for every combine mode."""
    from unet_torch_tpu.models.unet import UNetMultitask
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_multitask_steps

    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y1 = jnp.asarray(np.abs(rng.randn(2, 32, 32)), jnp.float32)
    y2 = jnp.asarray(np.abs(rng.randn(2, 32, 32)), jnp.float32)
    m = UNetMultitask(3, 1, 8, fold=True)
    tx = make_optimizer("SGD", 1e-3, 0.0)
    v = m.init(jax.random.key(0), x, train=False)

    def run(fused):
        vv = jax.tree.map(jnp.array, v)
        params = (dict(model=vv["params"], log_vars=jnp.zeros(2))
                  if combine == "uncertainty" else vv["params"])
        st = TrainState.create(params, vv.get("batch_stats", {}), tx)
        step, _ = make_multitask_steps(m, tx, "mse", 1, combine=combine,
                                       fused_head=fused)
        st, loss, l1, l2 = step(st, x, y1, y2, 1e-3, jax.random.key(1),
                                jnp.asarray(True))
        return float(loss), float(l1), float(l2), st

    r0 = run(False)
    r1 = run(True)
    np.testing.assert_allclose(r0[:3], r1[:3], rtol=1e-5)
    for (_, a), (_, b) in zip(jtu.tree_leaves_with_path(r0[3].params),
                              jtu.tree_leaves_with_path(r1[3].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-6)


@pytest.mark.parametrize("loss", ["dice_bce", "BCE"])
def test_planes_head_binary_equivalence(rng, loss):
    """fused_head on the binary C=1 losses (BCEWithLogits, dice_bce with
    per-sample dice): one SGD train step matches the standard path."""
    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 2, (2, 32, 32)), jnp.float32)
    m = UNet(3, 1, 8, fold=True)
    tx = make_optimizer("SGD", 1e-3, 0.0)
    v = m.init(jax.random.key(0), x, train=False)

    def run(fused):
        vv = jax.tree.map(jnp.array, v)
        st = TrainState.create(vv["params"], vv.get("batch_stats", {}), tx)
        step, _ = make_single_steps(m, tx, loss, loss, 1, fused_head=fused)
        st, lv = step(st, x, y, 1e-3, jax.random.key(1))
        return float(lv), st

    l0, st0 = run(False)
    l1, st1 = run(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for (_, a), (_, b) in zip(jtu.tree_leaves_with_path(st0.params),
                              jtu.tree_leaves_with_path(st1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-6)


@pytest.mark.parametrize("n_classes", [2, 3])
def test_planes_head_ce_equivalence(rng, n_classes):
    """fused_head on the CE loss (the headline bench config): one SGD train
    step matches the standard path, including the C=2 margin fast path."""
    from unet_torch_tpu.models.unet import UNet
    from unet_torch_tpu.train.optim import make_optimizer
    from unet_torch_tpu.train.state import TrainState
    from unet_torch_tpu.train.steps import make_single_steps

    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, n_classes, (2, 32, 32)), jnp.float32)
    m = UNet(3, n_classes, 8, fold=True)
    tx = make_optimizer("SGD", 1e-3, 0.0)
    v = m.init(jax.random.key(0), x, train=False)

    def run(fused):
        vv = jax.tree.map(jnp.array, v)
        st = TrainState.create(vv["params"], vv.get("batch_stats", {}), tx)
        step, _ = make_single_steps(m, tx, "CE", "CE", n_classes,
                                    fused_head=fused)
        st, lv = step(st, x, y, 1e-3, jax.random.key(1))
        return float(lv), st

    l0, st0 = run(False)
    l1, st1 = run(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for (_, a), (_, b) in zip(jtu.tree_leaves_with_path(st0.params),
                              jtu.tree_leaves_with_path(st1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-6)
