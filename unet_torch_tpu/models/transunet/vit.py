"""TransUnet — ViT(-hybrid) encoder + cup decoder, Flax NHWC.

Capability parity with /root/reference/TransUnet/vit_seg_modeling.py (cited per
class), designed TPU-first: token tensors stay (B, N, H*D) feeding the MXU,
attention is a single fused einsum path (swappable for the Pallas kernel), and
the align-corners bilinear 2x upsample is expressed as two small matmuls
(interpolation matrices) instead of a gather — MXU-friendly.

  Attention          std MHA, softmax(QK^T/sqrt(d))V      ref :50-94
  Mlp                GELU MLP, xavier/1e-6-normal init    ref :97-119
  Embeddings         patch or ResNetV2-hybrid + pos add   ref :122-165
  Block/Encoder      pre-LN transformer, final LN         ref :168-256
  DecoderCup         reshape tokens -> conv stack         ref :326-367
  SegmentationHead   3x3 conv (+optional upsample)        ref :318-323
  VisionTransformer  gray->RGB repeat, enc-dec-head       ref :370-441
  ...Multitask(/EM)  2 (resp. 6) decoders+heads           ref :444-638
  load_from(.npz)    JAX-format checkpoint loading incl. position-embedding
                     grid re-interpolation                ref :394-441
                     (weights are already HWIO/(in,out) — the reference
                     transposes *to* torch; we load them verbatim)
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from unet_torch_tpu.models.transunet.configs import CONFIGS
from unet_torch_tpu.nn.blocks import TPUBatchNorm, TPUDropout
from unet_torch_tpu.models.transunet.resnetv2 import ResNetV2


def bilinear_upsample_2x(x):
    """UpsamplingBilinear2d(scale_factor=2) == align_corners=True bilinear.

    Expressed as two interpolation-matrix matmuls over H then W; XLA maps these
    onto the MXU instead of emitting gathers.
    """
    b, h, w, c = x.shape
    return _resize_align_corners(x, 2 * h, 2 * w)


def _interp_matrix(n_out, n_in, dtype):
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_in - 1)
    frac = pos - lo
    m = (jax.nn.one_hot(lo, n_in) * (1 - frac)[:, None]
         + jax.nn.one_hot(hi, n_in) * frac[:, None])
    return m.astype(dtype)


def _resize_align_corners(x, out_h, out_w):
    # MEASURED (r3): a batch-broadcast dot_general formulation (interp matrix
    # broadcast over the batch dim so the dot emits (b, out_axis, rest) with
    # no transposes) is 2% SLOWER end-to-end — XLA materialises the broadcast
    # lhs (up to GBs on the 256²->512² block).  The einsum stays.
    b, h, w, c = x.shape
    mh = _interp_matrix(out_h, h, x.dtype)
    mw = _interp_matrix(out_w, w, x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, x)


class Attention(nn.Module):
    """ref :50-94 — per-head scaled dot-product, joint QKV on the MXU.

    ``vis=True`` mirrors the reference's attention-weights return
    (vit_seg_modeling.py:88-90,242-244): the pre-dropout softmax probs are
    sowed into the ``intermediates`` collection as ``attn_weights`` with the
    reference's (B, heads, N, N) layout — retrieve with
    ``model.apply(vars, x, mutable=["intermediates"])``.  The sow-based
    design keeps every __call__ signature unchanged (no (out, weights)
    tuples threaded through Block/Encoder) and costs nothing when vis=False;
    materialising the probs is inherently incompatible with the flash
    kernel, so vis=True routes through the einsum path."""

    num_heads: int
    hidden_size: int
    attention_dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    vis: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        d_head = self.hidden_size // self.num_heads
        dense = lambda name: nn.Dense(self.hidden_size, dtype=self.dtype,
                                      name=name)
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.num_heads, d_head)

        q, k, v = split(q), split(k), split(v)
        from unet_torch_tpu.kernels.attention import (
            _use_pallas_default,
            dropout_flash_attention,
            fused_attention,
        )

        if self.vis:
            scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d_head)
            probs = jax.nn.softmax(scores, axis=-1)
            self.sow("intermediates", "attn_weights", probs)
            if self.attention_dropout_rate and train:
                probs = TPUDropout(self.attention_dropout_rate,
                                   deterministic=False)(probs)
            ctx = jnp.einsum("bhnm,bmhd->bnhd", probs, v)
        elif train and _use_pallas_default():
            # flash forward AND flash backward (two-pass score recompute in
            # VMEM) — the differentiated einsum backward materialised four
            # (B,12,1024,1024) tensors per layer in HBM.  rate==0 skips the
            # in-kernel PRNG statically, so this also covers the standard
            # attention_dropout_rate=0.0 ViT configs.
            rate = float(self.attention_dropout_rate)
            seed = (jax.random.bits(self.make_rng("dropout"),
                                    dtype=jnp.uint32) if rate
                    else jnp.zeros((), jnp.uint32))
            ctx = dropout_flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), seed,
                1.0 / math.sqrt(d_head), rate).transpose(0, 2, 1, 3)
        elif self.attention_dropout_rate and train:
            # CPU fallback: dropout on the attention matrix needs the
            # materialised probs
            scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d_head)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = TPUDropout(self.attention_dropout_rate,
                               deterministic=False)(probs)
            ctx = jnp.einsum("bhnm,bmhd->bnhd", probs, v)
        else:
            ctx = fused_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                scale=1.0 / math.sqrt(d_head)).transpose(0, 2, 1, 3)
        ctx = ctx.reshape(x.shape[0], x.shape[1], self.hidden_size)
        out = dense("out")(ctx)
        return TPUDropout(self.attention_dropout_rate,
                          deterministic=not train)(out)


class Mlp(nn.Module):
    """ref :97-119 — GELU MLP, xavier-uniform kernels, std-1e-6 normal biases."""

    mlp_dim: int
    hidden_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        kinit = nn.initializers.xavier_uniform()
        binit = nn.initializers.normal(stddev=1e-6)
        x = nn.Dense(self.mlp_dim, kernel_init=kinit, bias_init=binit,
                     dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = TPUDropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.hidden_size, kernel_init=kinit, bias_init=binit,
                     dtype=self.dtype, name="fc2")(x)
        return TPUDropout(self.dropout_rate, deterministic=not train)(x)


class Block(nn.Module):
    """ref :168-187 — pre-LN attention + MLP with residuals."""

    config: Any
    dtype: jnp.dtype = jnp.float32
    vis: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        c = self.config
        h = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         name="attention_norm")(x)
        x = Attention(c.transformer.num_heads, c.hidden_size,
                      c.transformer.attention_dropout_rate, dtype=self.dtype,
                      vis=self.vis, name="attn")(x, train=train)
        x = x + h
        h = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ffn_norm")(x)
        x = Mlp(c.transformer.mlp_dim, c.hidden_size,
                c.transformer.dropout_rate, dtype=self.dtype,
                name="ffn")(x, train=train)
        return x + h


class Embeddings(nn.Module):
    """ref :122-165 — patch conv (or hybrid ResNetV2 + 1/16 patch-embed) plus
    learned position embeddings."""

    config: Any
    img_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        c = self.config
        hybrid = c.patches.get("grid") is not None
        if hybrid:
            grid = c.patches["grid"]
            patch = (self.img_size // 16 // grid[0],
                     self.img_size // 16 // grid[1])
            resnet = ResNetV2(tuple(c.resnet.num_layers),
                              c.resnet.width_factor, dtype=self.dtype,
                              name="hybrid_model")
            x, features = resnet(x)
        else:
            patch = tuple(c.patches["size"])
            features = None
        n_patches = (x.shape[1] // patch[0]) * (x.shape[2] // patch[1])
        x = nn.Conv(c.hidden_size, patch, strides=patch, padding="VALID",
                    dtype=self.dtype, name="patch_embeddings")(x)
        x = x.reshape(x.shape[0], -1, c.hidden_size)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, n_patches, c.hidden_size))
        x = x + pos
        x = TPUDropout(c.transformer.dropout_rate,
                       deterministic=not train)(x)
        return x, features


class Encoder(nn.Module):
    """ref :227-244 — num_layers Blocks + final LayerNorm."""

    config: Any
    dtype: jnp.dtype = jnp.float32
    vis: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        for i in range(self.config.transformer.num_layers):
            x = Block(self.config, dtype=self.dtype, vis=self.vis,
                      name=f"encoderblock_{i}")(x, train=train)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                            name="encoder_norm")(x)


class Conv2dReLU(nn.Module):
    """ref :259-281 — conv (+BN) + ReLU."""

    features: int
    kernel_size: tuple = (3, 3)
    padding: int = 1
    use_batchnorm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(self.features, self.kernel_size, padding=self.padding,
                    use_bias=not self.use_batchnorm, dtype=self.dtype,
                    name="conv")(x)
        if self.use_batchnorm:
            # f32 stats, compute-dtype apply (TPUBatchNorm docstring): flax
            # nn.BatchNorm(dtype=f32) promoted every decoder BN+ReLU chain to
            # f32 activations under bf16 compute — 2x HBM bytes.
            x = TPUBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class _FoldedConv3x3NoBias(nn.Module):
    """nn.Conv(features,(3,3),padding=1,use_bias=False) computing on a
    W-folded tensor — identical param tree/init ('kernel', lecun-normal)."""

    features: int
    in_features: int
    fold: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xf):
        from jax import lax

        from unet_torch_tpu.nn.folded import fold_kernel_general

        k = self.param("kernel", nn.linear.default_kernel_init,
                       (3, 3, self.in_features, self.features))
        kf = fold_kernel_general(k.astype(self.dtype), self.fold)
        return lax.conv_general_dilated(
            xf.astype(self.dtype), kf, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class FoldedConv2dReLU(nn.Module):
    """Conv2dReLU on a W-folded tensor (param tree identical: conv/bn)."""

    features: int
    in_features: int
    fold: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xf, *, train: bool):
        from unet_torch_tpu.nn.folded import FoldedBatchNormF

        xf = _FoldedConv3x3NoBias(self.features, self.in_features,
                                  self.fold, dtype=self.dtype,
                                  name="conv")(xf)
        xf = FoldedBatchNormF(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype,
                              fold=self.fold, name="bn")(xf)
        return nn.relu(xf)


class FoldedDecoderTail(nn.Module):
    """The final skip-less DecoderBlock computed in W-folded layout (r4):
    C=16 at full resolution pays an 8x lane-padding tax unfolded — ~10+ ms
    of the 151 ms TransUnet b8 step (profile, BASELINE.md).  Upsample runs
    unfolded (MXU matmuls), then the two convs + BN/ReLU stay folded; the
    caller keeps the tensor folded through SegmentationHead.  Param tree ==
    DecoderBlock (conv1/conv2)."""

    features: int
    in_features: int
    fold: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        from unet_torch_tpu.nn.folded import fold_f

        x = bilinear_upsample_2x(x)
        xf = fold_f(x, self.fold)
        xf = FoldedConv2dReLU(self.features, self.in_features, self.fold,
                              dtype=self.dtype, name="conv1")(xf,
                                                              train=train)
        return FoldedConv2dReLU(self.features, self.features, self.fold,
                                dtype=self.dtype, name="conv2")(xf,
                                                                train=train)


class DecoderBlock(nn.Module):
    """ref :284-315 — bilinear 2x up, concat skip, two Conv2dReLU."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, *, train: bool):
        x = bilinear_upsample_2x(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = Conv2dReLU(self.features, dtype=self.dtype, name="conv1")(
            x, train=train)
        return Conv2dReLU(self.features, dtype=self.dtype, name="conv2")(
            x, train=train)


class DecoderCup(nn.Module):
    """ref :326-367 — tokens -> (B,h,w,hidden) -> conv_more -> 4 DecoderBlocks,
    skips truncated by n_skip."""

    config: Any
    dtype: jnp.dtype = jnp.float32
    # W-fold factor for the final skip-less block (1 = unfolded); when > 1
    # the returned tensor is (B, H, W/fold, fold*C) and the caller's head
    # must consume it folded (SegmentationHead(fold=...))
    fold_tail: int = 1

    @nn.compact
    def __call__(self, hidden_states, features, *, train: bool):
        b, n_patch, hidden = hidden_states.shape
        h = w = int(np.sqrt(n_patch))
        x = hidden_states.reshape(b, h, w, hidden)
        x = Conv2dReLU(512, dtype=self.dtype, name="conv_more")(
            x, train=train)
        n_skip = self.config.get("n_skip", 0)
        channels = list(self.config.decoder_channels)
        for i, feats in enumerate(channels):
            skip = None
            if features is not None and i < n_skip:
                skip = features[i]
            if (self.fold_tail > 1 and i == len(channels) - 1
                    and skip is None):
                return FoldedDecoderTail(feats, x.shape[-1], self.fold_tail,
                                         dtype=self.dtype,
                                         name=f"block_{i}")(x, train=train)
            x = DecoderBlock(feats, dtype=self.dtype, name=f"block_{i}")(
                x, skip, train=train)
        return x


class _FoldedHeadConv(nn.Module):
    """nn.Conv(n_classes,(3,3),padding=1) on a W-folded input — identical
    param tree/init ('kernel' lecun-normal, 'bias' zeros)."""

    n_classes: int
    in_features: int
    fold: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xf):
        from jax import lax

        from unet_torch_tpu.nn.folded import fold_kernel_general

        k = self.param("kernel", nn.linear.default_kernel_init,
                       (3, 3, self.in_features, self.n_classes))
        bias = self.param("bias", nn.initializers.zeros, (self.n_classes,))
        kf = fold_kernel_general(k.astype(self.dtype), self.fold)
        y = lax.conv_general_dilated(
            xf.astype(self.dtype), kf, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.tile(bias.astype(y.dtype), self.fold)


def _tail_fold_factor(config, img_size: int) -> int:
    """W-fold factor for the decoder tail: pack the last decoder stage's
    C (< 128) up to the 128-lane tile when the geometry divides and the
    last block is skip-less (n_skip <= 3 of 4 blocks).  1 = unfolded."""
    channels = list(config.decoder_channels)
    c_last = channels[-1]
    if c_last >= 128 or 128 % c_last != 0:
        return 1
    f = 128 // c_last
    if img_size % f != 0:
        return 1
    if config.get("n_skip", 0) >= len(channels):
        return 1
    return f


class SegmentationHead(nn.Module):
    """ref :318-323 — 3x3 conv + optional bilinear upsampling.  ``fold > 1``
    consumes a W-folded input (from DecoderCup(fold_tail=...)) and unfolds
    after the conv."""

    n_classes: int
    upsampling: int = 1
    dtype: jnp.dtype = jnp.float32
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        if self.fold > 1:
            from unet_torch_tpu.nn.folded import unfold_f

            x = _FoldedHeadConv(self.n_classes, x.shape[-1] // self.fold,
                                self.fold, dtype=self.dtype,
                                name="conv")(x)
            x = unfold_f(x, self.fold)
        else:
            x = nn.Conv(self.n_classes, (3, 3), padding=1, dtype=self.dtype,
                        name="conv")(x)
        if self.upsampling > 1:
            b, h, w, c = x.shape
            x = _resize_align_corners(x, h * self.upsampling,
                                      w * self.upsampling)
        return x


class Transformer(nn.Module):
    config: Any
    img_size: int
    dtype: jnp.dtype = jnp.float32
    vis: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        emb, features = Embeddings(self.config, self.img_size,
                                   dtype=self.dtype, name="embeddings")(
            x, train=train)
        encoded = Encoder(self.config, dtype=self.dtype, vis=self.vis,
                          name="encoder")(emb, train=train)
        return encoded, features


class VisionTransformer(nn.Module):
    """ref :370-441 — single decoder/head segmentation model."""

    config: Any
    img_size: int = 224
    num_classes: int = 2
    dtype: jnp.dtype = jnp.float32
    vis: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.shape[-1] == 1:  # gray -> RGB repeat (ref :387-388)
            x = jnp.repeat(x, 3, axis=-1)
        encoded, features = Transformer(self.config, self.img_size,
                                        dtype=self.dtype, vis=self.vis,
                                        name="transformer")(x, train=train)
        fold = _tail_fold_factor(self.config, self.img_size)
        x = DecoderCup(self.config, dtype=self.dtype, fold_tail=fold,
                       name="decoder")(encoded, features, train=train)
        return SegmentationHead(self.num_classes, dtype=self.dtype,
                                fold=fold,
                                name="segmentation_head")(x)


class VisionTransformerMultitask(nn.Module):
    """ref :444-524 — shared encoder, two decoders+heads."""

    config: Any
    img_size: int = 224
    num_classes: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        encoded, features = Transformer(self.config, self.img_size,
                                        dtype=self.dtype,
                                        name="transformer")(x, train=train)
        fold = _tail_fold_factor(self.config, self.img_size)
        outs = []
        for i in (1, 2):
            xi = DecoderCup(self.config, dtype=self.dtype, fold_tail=fold,
                            name=f"decoder{i}")(encoded, features,
                                                train=train)
            outs.append(SegmentationHead(
                self.num_classes, dtype=self.dtype, fold=fold,
                name=f"segmentation_head{i}")(xi))
        return tuple(outs)


class VisionTransformerMultitaskEM(nn.Module):
    """ref :526-638 — six decoders+heads; returns a 6-tuple of logits."""

    config: Any
    img_size: int = 224
    num_classes: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        encoded, features = Transformer(self.config, self.img_size,
                                        dtype=self.dtype,
                                        name="transformer")(x, train=train)
        fold = _tail_fold_factor(self.config, self.img_size)
        outs = []
        for i in range(1, 7):
            xi = DecoderCup(self.config, dtype=self.dtype, fold_tail=fold,
                            name=f"decoder{i}")(encoded, features,
                                                train=train)
            outs.append(SegmentationHead(
                self.num_classes, dtype=self.dtype, fold=fold,
                name=f"segmentation_head{i}")(xi))
        return tuple(outs)


def build_transunet(model_type: str, img_size: int, n_channels: int,
                    num_classes: int, variant: str = "R50-ViT-B_16",
                    n_skip: int = 3, dtype=jnp.float32):
    """Factory mirroring train.py:213-218,233-237,260-264: R50-ViT-B_16 with
    n_skip=3 and grid = img_size/16."""
    import copy as _copy

    config = _copy.deepcopy(CONFIGS[variant])
    config.n_classes = num_classes
    config.n_skip = n_skip
    if config.patches.get("grid") is not None:
        config.patches.grid = (img_size // 16, img_size // 16)
    if model_type in ("TransUnet", "regression_t"):
        return VisionTransformer(config, img_size, num_classes, dtype=dtype)
    if model_type == "multi_task_regTU":
        return VisionTransformerMultitask(config, img_size, num_classes,
                                          dtype=dtype)
    if model_type == "multitask_em":
        return VisionTransformerMultitaskEM(config, img_size, num_classes,
                                            dtype=dtype)
    raise ValueError(f"Unknown TransUnet model_type {model_type!r}")


# ---------------------------------------------------------------------------
# .npz pretrained-weight loading (ref load_from :394-441)
# ---------------------------------------------------------------------------

def load_npz_into_params(params, weights, config) -> dict:
    """Copy a JAX-format ViT checkpoint (np.load('...npz')) into a flax params
    tree produced by VisionTransformer*.init.

    The npz is already HWIO / (in, out): kernels load verbatim (the reference
    must transpose to OIHW/(out,in), vit_seg_modeling.py:36-40 — we don't).
    Position embeddings are re-gridded with bilinear ndimage.zoom when the
    token counts differ (ref :404-425).  Returns a new params tree.
    """
    import copy as _copy

    from scipy import ndimage

    params = jax.tree_util.tree_map(np.asarray, params)
    params = _copy.deepcopy(params)
    hidden = config.hidden_size

    for tname in list(params):
        if not tname.startswith("transformer"):
            continue
        t = params[tname]
        emb = t["embeddings"]
        emb["patch_embeddings"]["kernel"] = weights["embedding/kernel"]
        emb["patch_embeddings"]["bias"] = weights["embedding/bias"]

        posemb = weights["Transformer/posembed_input/pos_embedding"]
        pos_new = emb["position_embeddings"]
        if posemb.shape == pos_new.shape:
            emb["position_embeddings"] = posemb
        elif posemb.shape[1] - 1 == pos_new.shape[1]:
            emb["position_embeddings"] = posemb[:, 1:]
        else:
            posemb_grid = posemb[0, 1:]
            gs_old = int(np.sqrt(len(posemb_grid)))
            gs_new = int(np.sqrt(pos_new.shape[1]))
            posemb_grid = posemb_grid.reshape(gs_old, gs_old, -1)
            zoom = (gs_new / gs_old, gs_new / gs_old, 1)
            posemb_grid = ndimage.zoom(posemb_grid, zoom, order=1)
            emb["position_embeddings"] = posemb_grid.reshape(
                1, gs_new * gs_new, -1)

        enc = t["encoder"]
        enc["encoder_norm"]["scale"] = \
            weights["Transformer/encoder_norm/scale"]
        enc["encoder_norm"]["bias"] = weights["Transformer/encoder_norm/bias"]
        n_layers = config.transformer.num_layers
        for i in range(n_layers):
            root = f"Transformer/encoderblock_{i}"
            blk = enc[f"encoderblock_{i}"]
            attn = blk["attn"]
            for ours, theirs in (("query", "query"), ("key", "key"),
                                 ("value", "value")):
                attn[ours]["kernel"] = weights[
                    f"{root}/MultiHeadDotProductAttention_1/{theirs}/kernel"
                ].reshape(hidden, hidden)
                attn[ours]["bias"] = weights[
                    f"{root}/MultiHeadDotProductAttention_1/{theirs}/bias"
                ].reshape(-1)
            attn["out"]["kernel"] = weights[
                f"{root}/MultiHeadDotProductAttention_1/out/kernel"
            ].reshape(hidden, hidden)
            attn["out"]["bias"] = weights[
                f"{root}/MultiHeadDotProductAttention_1/out/bias"].reshape(-1)
            blk["ffn"]["fc1"]["kernel"] = weights[f"{root}/MlpBlock_3/Dense_0/kernel"]
            blk["ffn"]["fc1"]["bias"] = weights[f"{root}/MlpBlock_3/Dense_0/bias"]
            blk["ffn"]["fc2"]["kernel"] = weights[f"{root}/MlpBlock_3/Dense_1/kernel"]
            blk["ffn"]["fc2"]["bias"] = weights[f"{root}/MlpBlock_3/Dense_1/bias"]
            blk["attention_norm"]["scale"] = weights[f"{root}/LayerNorm_0/scale"]
            blk["attention_norm"]["bias"] = weights[f"{root}/LayerNorm_0/bias"]
            blk["ffn_norm"]["scale"] = weights[f"{root}/LayerNorm_2/scale"]
            blk["ffn_norm"]["bias"] = weights[f"{root}/LayerNorm_2/bias"]

        if "hybrid_model" in emb:
            hm = emb["hybrid_model"]
            hm["root_conv"]["kernel"] = weights["conv_root/kernel"]
            hm["root_gn"]["scale"] = weights["gn_root/scale"].reshape(-1)
            hm["root_gn"]["bias"] = weights["gn_root/bias"].reshape(-1)
            for bidx, n_units in enumerate(config.resnet.num_layers, start=1):
                for u in range(1, n_units + 1):
                    unit = hm[f"block{bidx}_unit{u}"]
                    root = f"block{bidx}/unit{u}"
                    for conv in ("conv1", "conv2", "conv3"):
                        unit[conv]["kernel"] = weights[f"{root}/{conv}/kernel"]
                    for gn in ("gn1", "gn2", "gn3"):
                        unit[gn]["scale"] = weights[
                            f"{root}/{gn}/scale"].reshape(-1)
                        unit[gn]["bias"] = weights[
                            f"{root}/{gn}/bias"].reshape(-1)
                    if "downsample" in unit:
                        unit["downsample"]["kernel"] = weights[
                            f"{root}/conv_proj/kernel"]
                        unit["gn_proj"]["scale"] = weights[
                            f"{root}/gn_proj/scale"].reshape(-1)
                        unit["gn_proj"]["bias"] = weights[
                            f"{root}/gn_proj/bias"].reshape(-1)
    return params
