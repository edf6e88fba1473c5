"""Pipeline parallelism over the virtual 8-device mesh: the GPipe'd ViT
encoder must match the sequential Encoder exactly (forward AND gradients),
and the full pipelined VisionTransformer forward must match model.apply.

The reference has no model partitioning (SURVEY.md §5, distributed row);
pp is a TPU scale-out capability of this framework (parallel/pipeline.py).
"""

import numpy as np

import jax
import jax.numpy as jnp

from unet_torch_tpu.core.mesh import make_mesh
from unet_torch_tpu.models.transunet.configs import get_testing
from unet_torch_tpu.models.transunet.vit import Encoder, VisionTransformer
from unet_torch_tpu.parallel.pipeline import (
    pipeline_blocks,
    pipelined_vit_forward,
    stack_block_params,
    unstack_block_params,
    vit_encoder_block_fn,
)


def _wide_testing(num_layers=4):
    cfg = get_testing()
    cfg.hidden_size = 16
    cfg.transformer.num_heads = 2
    cfg.transformer.mlp_dim = 32
    cfg.transformer.num_layers = num_layers
    cfg.transformer.dropout_rate = 0.0
    return cfg


def _encoder_setup(num_layers=4, batch=8, tokens=16):
    cfg = _wide_testing(num_layers)
    enc = Encoder(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, tokens, cfg.hidden_size), jnp.float32)
    params = enc.init(jax.random.key(0), x, train=False)["params"]
    return cfg, enc, params, x


def _blocks_only(cfg, params, x):
    """Sequential block chain WITHOUT the final encoder_norm (the pipeline
    unit is the block stack; the norm is applied by the caller)."""
    from unet_torch_tpu.models.transunet.vit import Block

    for i in range(cfg.transformer.num_layers):
        x = Block(cfg).apply(
            {"params": params[f"encoderblock_{i}"]}, x, train=False)
    return x


def test_stack_roundtrip():
    cfg, _, params, _ = _encoder_setup()
    stacked = stack_block_params(params, cfg.transformer.num_layers)
    back = unstack_block_params(stacked, cfg.transformer.num_layers)
    for i in range(cfg.transformer.num_layers):
        a = jax.tree_util.tree_leaves(params[f"encoderblock_{i}"])
        b = jax.tree_util.tree_leaves(back[f"encoderblock_{i}"])
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_pipeline_matches_sequential_forward():
    cfg, _, params, x = _encoder_setup()
    mesh = make_mesh(n_data=2, n_model=4)
    stacked = stack_block_params(params, cfg.transformer.num_layers)
    ref = _blocks_only(cfg, params, x)
    out = pipeline_blocks(mesh, vit_encoder_block_fn(cfg), stacked, x,
                          n_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_two_layers_per_stage_and_m_not_equal_s():
    """8 layers on 4 stages (2 per stage), M=8 microbatches of size 2."""
    cfg, _, params, x = _encoder_setup(num_layers=8, batch=16)
    mesh = make_mesh(n_data=2, n_model=4)
    stacked = stack_block_params(params, cfg.transformer.num_layers)
    ref = _blocks_only(cfg, params, x)
    out = pipeline_blocks(mesh, vit_encoder_block_fn(cfg), stacked, x,
                          n_microbatches=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_grads_match_sequential():
    """Autodiff through scan+ppermute gives the GPipe backward schedule;
    grads wrt the stacked block params must equal the sequential chain's."""
    cfg, _, params, x = _encoder_setup()
    mesh = make_mesh(n_data=2, n_model=4)
    stacked = stack_block_params(params, cfg.transformer.num_layers)
    block_fn = vit_encoder_block_fn(cfg)

    def loss_pipe(st):
        out = pipeline_blocks(mesh, block_fn, st, x, n_microbatches=4)
        return jnp.sum(out * out)

    def loss_seq(st):
        p = unstack_block_params(st, cfg.transformer.num_layers)
        out = _blocks_only(cfg, p, x)
        return jnp.sum(out * out)

    # jit the grads: the persistent compilation cache (conftest) then makes
    # repeat runs execution-only (this test was the suite's slowest warm)
    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_pipelined_vit_forward_matches_model():
    cfg = _wide_testing(num_layers=4)
    model = VisionTransformer(cfg, img_size=32, num_classes=3)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x[:1], train=False)
    ref = model.apply(variables, x, train=False)
    mesh = make_mesh(n_data=2, n_model=4)
    out = pipelined_vit_forward(cfg, 32, 3, variables, x, mesh,
                                n_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
