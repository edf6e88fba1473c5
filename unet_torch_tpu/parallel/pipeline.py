"""Pipeline parallelism (GPipe) for the transformer encoder families.

The reference is single-GPU (/root/reference/train.py:304) and has no model
partitioning of any kind; its only distributed artifact is dormant NCCL
plumbing (/root/reference/CLTR/misc.py:442-464).  This module is the TPU
scale-out path for models whose *depth* outgrows one chip: the ViT encoder's
``num_layers`` identical pre-LN blocks (models/transunet/vit.py::Encoder,
ref TransUnet/vit_seg_modeling.py:227-244) are split into S contiguous
stages over the ``model`` mesh axis and microbatches flow through them
GPipe-style.

Idiomatic-TPU shape of the implementation:

  - one ``shard_map`` over the whole (data, model) mesh; the stacked
    per-layer parameters are sharded on their leading (layer) axis over
    ``model`` so each device physically holds only its stage's weights;
  - a ``lax.scan`` over M + S - 1 ticks; each tick every stage applies its
    layer chunk to its resident microbatch and hands the activation to the
    next stage with a ring ``lax.ppermute`` (one hop over ICI per tick);
  - the backward schedule is NOT hand-written: differentiating the scan
    reverses it automatically (the transpose of ppermute is the inverse
    permutation), which is exactly the GPipe fwd-all-then-bwd-all schedule;
  - bubble fraction is the textbook (S-1)/(M+S-1) — callers pick
    ``n_microbatches >= 4*S`` to amortise it.

The pipeline composes with the existing axes: batch dims stay sharded over
``data`` (so each tick's microbatch is itself data-parallel), and the
parameter PartitionSpecs of parallel/tensor.py can be applied *within* a
stage for dp x pp x tp.  There is no expert-parallel axis anywhere in this
framework because no model family has MoE layers (SURVEY.md §2.1) — ep is
structurally n/a, not missing.

Scale note: every family the reference ships fits one v5e chip with room to
spare (ViT-B: 12 blocks x 7M params), so pp — like tp — is a scale-out
capability validated on the virtual 8-device CPU mesh (tests/test_pipeline.py,
__graft_entry__.dryrun_multichip) rather than a single-chip bench default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_block_params(encoder_params, n_layers: int):
    """Stack ``encoderblock_0..n-1`` param subtrees on a new leading axis.

    The ViT encoder names its blocks ``encoderblock_{i}``
    (models/transunet/vit.py::Encoder, mirroring ref
    TransUnet/vit_seg_modeling.py:237-244); all blocks share one structure,
    so the stack is exact.  The result's leading axis is the layer axis the
    pipeline shards over ``model``.
    """
    blocks = [encoder_params[f"encoderblock_{i}"] for i in range(n_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_block_params(stacked, n_layers: int):
    """Inverse of :func:`stack_block_params` (for checkpoint round-trips)."""
    return {
        f"encoderblock_{i}": jax.tree_util.tree_map(lambda x, i=i: x[i],
                                                    stacked)
        for i in range(n_layers)
    }


def pipeline_blocks(mesh: Mesh, block_fn, stacked_params, x,
                    n_microbatches: int, *, rng=None, axis: str = "model",
                    data_axis: str = "data"):
    """Apply L stacked layers as an S-stage GPipe over ``mesh[axis]``.

    Args:
      mesh: a (data, model) mesh (core/mesh.py::make_mesh).
      block_fn: ``(layer_params, x, key) -> y`` applying ONE layer; ``key``
        is a PRNG key (folded per (layer, microbatch) — pass ``rng=None``
        and ignore it for deterministic/eval layers).
      stacked_params: pytree with leading layer axis L (stack_block_params);
        L % S == 0, layers [s*L/S, (s+1)*L/S) form stage s.
      x: global activations, batch-leading ``(B, ...)``;
        B % n_microbatches == 0 and the microbatch size must divide by the
        ``data`` axis.
      n_microbatches: M; the pipeline runs M + S - 1 ticks.
      rng: optional base PRNG key for in-layer dropout.

    Returns activations of ``x``'s shape, sharded like the input (batch over
    ``data``, replicated over ``model``).  Differentiable in
    ``stacked_params`` and ``x``.
    """
    n_stages = mesh.shape[axis]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible into "
                         f"{n_stages} stages")
    batch = x.shape[0]
    if batch % n_microbatches:
        raise ValueError(f"batch {batch} not divisible into "
                         f"{n_microbatches} microbatches")
    layers_per_stage = n_layers // n_stages
    microbatch = batch // n_microbatches
    if microbatch % mesh.shape[data_axis]:
        raise ValueError(
            f"microbatch size {microbatch} not divisible by the "
            f"'{data_axis}' axis ({mesh.shape[data_axis]})")
    # (M, mb, ...) microbatch-major staging layout
    xm = x.reshape((n_microbatches, microbatch) + x.shape[1:])
    if rng is None:
        rng = jax.random.key(0)

    def per_device(params_stage, xm_local, key):
        stage = jax.lax.axis_index(axis)

        def apply_stage(h, microbatch_idx):
            def layer(h, sl):
                layer_idx, p = sl
                k = jax.random.fold_in(
                    jax.random.fold_in(key, microbatch_idx), layer_idx)
                return block_fn(p, h, k), None

            local_ids = stage * layers_per_stage + jnp.arange(
                layers_per_stage)
            h, _ = jax.lax.scan(layer, h, (local_ids, params_stage))
            return h

        # the carries become device-varying after the first ppermute / masked
        # write; mark the zero inits varying over the pipeline axis so the
        # scan carry type is stable (shard_map VMA typing)
        state = jax.lax.pcast(jnp.zeros_like(xm_local[0]), (axis,),
                              to="varying")
        out = jax.lax.pcast(jnp.zeros_like(xm_local), (axis,), to="varying")

        def tick(carry, t):
            state, out = carry
            # stage 0 injects microbatch t (clamped once the feed is done);
            # later stages consume what the previous stage ppermuted in.
            feed = jax.lax.dynamic_index_in_dim(
                xm_local, jnp.clip(t, 0, n_microbatches - 1), 0,
                keepdims=False)
            inp = jnp.where(stage == 0, feed, state)
            y = apply_stage(inp, jnp.clip(t - stage, 0, n_microbatches - 1))
            # the last stage finishes microbatch t-(S-1); store it when real
            widx = t - (n_stages - 1)
            widx_c = jnp.clip(widx, 0, n_microbatches - 1)
            valid = jnp.logical_and(stage == n_stages - 1, widx >= 0)
            cur = jax.lax.dynamic_index_in_dim(out, widx_c, 0,
                                               keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, cur), widx_c, 0)
            # ring hop to the next stage (last->0 wraps; stage 0 ignores it)
            state = jax.lax.ppermute(
                y, axis,
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (state, out), None

        (state, out), _ = jax.lax.scan(
            tick, (state, out), jnp.arange(n_microbatches + n_stages - 1))
        # only the last stage holds real outputs: psum-broadcast over the
        # pipeline axis so downstream (replicated-over-model) layers see them
        out = jax.lax.psum(
            jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out)), axis)
        return out

    batch_spec = (P(None, data_axis) if mesh.shape[data_axis] > 1
                  else P(None))
    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), batch_spec, P()),
        out_specs=batch_spec)
    out = fn(stacked_params, xm, rng)
    return out.reshape(x.shape)


def vit_encoder_block_fn(config, dtype=jnp.float32, train: bool = False):
    """``block_fn`` for :func:`pipeline_blocks` applying one ViT Block.

    Dropout (when ``train`` and the config has non-zero rates) draws from the
    per-(layer, microbatch) folded key — a different stream than the
    sequential Encoder's, which is fine: RNG streams are an implementation
    detail, not part of trained-outcome parity (PARITY.md).
    """
    from unet_torch_tpu.models.transunet.vit import Block

    block = Block(config, dtype=dtype)

    def block_fn(p, h, key):
        return block.apply({"params": p}, h, train=train,
                           rngs={"dropout": key} if train else None)

    return block_fn


def pipelined_vit_forward(config, img_size: int, num_classes: int, variables,
                          x, mesh: Mesh, n_microbatches: int, *,
                          dtype=jnp.float32):
    """Full VisionTransformer eval forward with the encoder pipelined.

    Embeddings (ResNetV2 hybrid stem — GroupNorm, stateless), the final
    encoder LayerNorm, DecoderCup and SegmentationHead run replicated over
    ``model`` / sharded over ``data``; only the L identical encoder blocks —
    where a deep ViT's parameters actually live — flow through the pipeline.
    Matches models/transunet/vit.py::VisionTransformer.__call__ exactly
    (ref TransUnet/vit_seg_modeling.py:385-392).
    """
    import flax.linen as nn

    from unet_torch_tpu.models.transunet.vit import (
        DecoderCup,
        Embeddings,
        SegmentationHead,
        _tail_fold_factor,
    )

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tparams = params["transformer"]

    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    emb, features = Embeddings(config, img_size, dtype=dtype).apply(
        {"params": tparams["embeddings"]}, x, train=False)

    n_layers = config.transformer.num_layers
    stacked = stack_block_params(tparams["encoder"], n_layers)
    encoded = pipeline_blocks(mesh, vit_encoder_block_fn(config, dtype),
                              stacked, emb, n_microbatches)
    encoded = nn.LayerNorm(epsilon=1e-6, dtype=dtype).apply(
        {"params": tparams["encoder"]["encoder_norm"]}, encoded)

    fold = _tail_fold_factor(config, img_size)
    dec = DecoderCup(config, dtype=dtype, fold_tail=fold)
    dec_vars = {"params": params["decoder"]}
    if "decoder" in batch_stats:
        dec_vars["batch_stats"] = batch_stats["decoder"]
    xd = dec.apply(dec_vars, encoded, features, train=False)
    head = SegmentationHead(num_classes, dtype=dtype, fold=fold)
    head_vars = {"params": params["segmentation_head"]}
    if "segmentation_head" in batch_stats:
        head_vars["batch_stats"] = batch_stats["segmentation_head"]
    return head.apply(head_vars, xd)
