"""Golden-shape and init tests for the UNet family (SURVEY.md §4 strategy)."""

import numpy as np

import jax
import jax.numpy as jnp

from unet_torch_tpu.models import UNet, UNetAttention, UNetMultitask, build_model


def _init_and_run(model, x):
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    return variables, out


def test_unet_shapes_small_base():
    # base=8 keeps CPU compile fast; channel flow mirrors Model.py:95-169
    x = jnp.zeros((2, 64, 64, 1))
    model = UNet(n_channels=1, n_classes=4, base=8)
    variables, out = _init_and_run(model, x)
    assert out.shape == (2, 64, 64, 4)
    # bottleneck width = base*16
    enc = variables["params"]["encoder"]
    assert enc["down4"]["DoubleConv_0"]["Conv_1"]["kernel"].shape[-1] == 128


def test_unet_odd_size_pads_skip():
    # 50 -> 25 -> 12 -> 6 -> 3; decoder must pad to match skips (Model.py:69-73)
    x = jnp.zeros((1, 50, 50, 3))
    model = UNet(n_channels=3, n_classes=2, base=8)
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 50, 50, 2)


def test_unet_multitask_two_heads():
    x = jnp.zeros((1, 32, 32, 1))
    model = UNetMultitask(n_channels=1, n_classes=1, base=8)
    _, (o1, o2) = _init_and_run(model, x)
    assert o1.shape == (1, 32, 32, 1) and o2.shape == (1, 32, 32, 1)


def test_unet_attention_shapes():
    x = jnp.zeros((1, 32, 32, 1))
    model = UNetAttention(n_channels=1, n_classes=3, base=8)
    _, out = _init_and_run(model, x)
    assert out.shape == (1, 32, 32, 3)


def test_build_model_channel_codes():
    # -1 -> 1ch, -2 -> 3ch (Model.py:99-104)
    m = build_model("single", n_channels=-1, n_classes=2, base=8)
    assert m.n_channels == 1
    m = build_model("single", n_channels=-2, n_classes=2, base=8)
    assert m.n_channels == 3
    m = build_model("attention", n_channels=3, n_classes=2, base=8)
    assert isinstance(m, UNetAttention)


def test_batchnorm_updates_stats():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 1),
                    jnp.float32)
    model = UNet(n_channels=1, n_classes=1, base=4)
    variables = model.init(jax.random.key(0), x, train=False)
    out, mut = model.apply(variables, x, train=True,
                           mutable=["batch_stats"])
    before = variables["batch_stats"]["encoder"]["inc"]["BatchNorm_0"]["mean"]
    after = mut["batch_stats"]["encoder"]["inc"]["BatchNorm_0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_unet_head_dtype_f32_logits_same_tree():
    """head_dtype=f32 on a bf16 model: f32 logits, identical param tree
    (checkpoint-compatible), output close to the all-bf16 model."""
    x = jnp.zeros((1, 32, 32, 3))
    m_mixed = UNet(3, 3, 8, dtype=jnp.bfloat16, head_dtype=jnp.float32)
    m_bf16 = UNet(3, 3, 8, dtype=jnp.bfloat16)
    v1, out1 = _init_and_run(m_mixed, x)
    v2, out2 = _init_and_run(m_bf16, x)
    assert out1.dtype == jnp.float32
    assert out2.dtype == jnp.bfloat16
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))
    np.testing.assert_allclose(np.asarray(out1, np.float32),
                               np.asarray(out2, np.float32), atol=3e-2)
