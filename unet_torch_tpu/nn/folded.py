"""W-folded level-1 blocks: kill the 2x lane-padding tax on C=64 tensors.

XLA lays (B,H,W,64) bf16 activations out as T(8,128) tiles with C=64 in the
128-lane minor dim -> every byte of level-1 traffic pays a 2x padding
expansion (r1/r2 profiles: ~105 ms of the 191 ms UNet-64 b16 step lives in
inc/up4/outc/down1).  These modules keep the level-1 activations in a
*W-folded* layout (B, H, W/2, 2C) end to end — adjacent W-pixel pairs packed
into the lane dim — so every elementwise/BN/pool op moves half the bytes and
the 3x3 convs contract over dense 128-lane tiles.

The folded conv kernel construction (fold_kernel) restructures a (3,3,Ci,Co)
kernel into (3,3,2Ci,2Co): output position 2t+k_out reads input 2(t+dwf)+k_in
where k_in = k_out + dw - 2*dwf; structural holes are zeros.  Equivalence is
oracle-tested (tests/test_folded.py) and was measured 1.05x fwd / 1.21x grad
vs the unfolded conv on the pure level-1 chain (benchmarks/bench_fold.py).

Param trees are IDENTICAL to the unfolded blocks (kernels stored unfolded,
folding happens in-trace on the tiny weight tensors), so checkpoints, torch
imports and the init RNG stream are unchanged.

Reference ops: DoubleConv /root/reference/Model.py:7-26, MaxPool2d
Model.py:33, ConvTranspose2d(k=2,s=2) Model.py:59, OutConv Model.py:86-92.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from unet_torch_tpu.nn.blocks import (TPUBatchNorm, kaiming_normal,
                                      torch_convt_kernel_init,
                                      torch_uniform_init)

def fold_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) conv kernel -> (3,3,2Ci,2Co) W-folded-layout kernel.

    Folded tap j, input slot k_in, output slot k_out carries original tap
    dw = k_out + dw - 2*dwf (derivation in the module docstring); laid out as
    the (2x2)-block matrices
        tap0 = [[0,  0 ], [k0, 0 ]]     (reads the previous folded column)
        tap1 = [[k1, k0], [k2, k1]]     (centre)
        tap2 = [[0,  k2], [0,  0 ]]     (next folded column)
    built with stack/concat (a dynamic-update-slice chain builds the same
    value but fuses worse)."""
    kh, kw, ci, co = k.shape
    assert kw == 3
    k0, k1, k2 = k[:, 0], k[:, 1], k[:, 2]
    z = jnp.zeros_like(k0)

    def block(a00, a01, a10, a11):
        return jnp.concatenate([
            jnp.concatenate([a00, a01], axis=-1),
            jnp.concatenate([a10, a11], axis=-1)], axis=-2)

    taps = [block(z, z, k0, z), block(k1, k0, k2, k1), block(z, k2, z, z)]
    return jnp.stack(taps, axis=1)


def fold(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H,W//2,2C): W-pixel pairs into the lane dim."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unfold(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


class FoldedConv3x3(nn.Module):
    """3x3 SAME conv on a W-folded tensor.  Param tree == nn.Conv(features,
    (3,3), use_bias=False): a single unfolded 'kernel' (3,3,Ci,Co)."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xf):
        k = self.param("kernel", kaiming_normal,
                       (3, 3, self.in_features, self.features))
        kf = fold_kernel(k.astype(self.dtype))
        return lax.conv_general_dilated(
            xf.astype(self.dtype), kf, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class FoldedBatchNorm(TPUBatchNorm):
    """TPUBatchNorm over a W-folded tensor: stats reduce over both W-parity
    slots of each channel; the affine apply tiles (scale, shift) across the
    two slots.  Param/stat trees identical to TPUBatchNorm (C-sized)."""

    @nn.compact
    def __call__(self, xf):
        c2 = xf.shape[-1]
        features = c2 // 2
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # Reduce the folded tensor at full 2C lane width and combine the
            # two W-parity halves on the tiny (2C,) vector.  (Reducing a
            # (...,2,C) reshape instead materialises half-width padded
            # intermediates in the backward — measured 9 ms/step of
            # divide_multiply fusions at 512² b16.)
            xff = xf.astype(jnp.float32)
            axes = tuple(range(xf.ndim - 1))
            m2 = jnp.mean(xff, axis=axes)
            s2 = jnp.mean(xff * xff, axis=axes)
            mean = 0.5 * (m2[:features] + m2[features:])
            var = jnp.maximum(
                0.5 * (s2[:features] + s2[features:]) - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1.0 - self.momentum) * var)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        mul = jnp.tile(inv.astype(xf.dtype), 2)
        add = jnp.tile((bias - mean * inv).astype(xf.dtype), 2)
        return xf * mul + add


class FoldedConv3x3Pair(nn.Module):
    """3x3 SAME conv over TWO folded inputs summed — the concat-free form of
    conv(concat([a, b])): the stored kernel's input axis splits into the a-
    and b- halves, each folded independently.  Avoids materialising the
    folded concat forward AND the grad-splitting slice backward (1.65 ms at
    512² b16).  Param tree == nn.Conv(features, (3,3), use_bias=False) on the
    concatenated width."""

    features: int
    in_a: int
    in_b: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, af, bf):
        k = self.param("kernel", kaiming_normal,
                       (3, 3, self.in_a + self.in_b, self.features))
        ka = fold_kernel(k[:, :, :self.in_a].astype(self.dtype))
        kb = fold_kernel(k[:, :, self.in_a:].astype(self.dtype))
        conv = lambda x, kk: lax.conv_general_dilated(  # noqa: E731
            x, kk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return conv(af.astype(self.dtype), ka) + conv(bf.astype(self.dtype), kb)


class FoldedDoubleConv(nn.Module):
    """(FoldedConv3x3 -> FoldedBatchNorm -> ReLU) x2.  Param tree ==
    DoubleConv (Conv_0/BatchNorm_0/Conv_1/BatchNorm_1).  When `in_b` is set,
    __call__ takes two folded tensors (the Up concat pair) and Conv_0 runs
    concat-free (FoldedConv3x3Pair)."""

    features: int
    in_features: int
    mid_features: Optional[int] = None
    in_b: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xf, bf=None, train: bool = False):
        mid = self.mid_features or self.features
        if self.in_b:
            xf = FoldedConv3x3Pair(mid, self.in_features, self.in_b,
                                   dtype=self.dtype, name="Conv_0")(xf, bf)
        else:
            xf = FoldedConv3x3(mid, self.in_features, dtype=self.dtype,
                               name="Conv_0")(xf)
        for i, feats in ((0, mid), (1, self.features)):
            if i:
                xf = FoldedConv3x3(feats, mid, dtype=self.dtype,
                                   name="Conv_1")(xf)
            xf = FoldedBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"BatchNorm_{i}")(xf)
            xf = nn.relu(xf)
        return xf


# ---------------------------------------------------------------------------
# Folded 2x2 max pool: (B,H,W2,2C) folded in -> (B,H/2,W2,C) unfolded-pooled
# out.  The W-pair max is an elementwise max between the two lane halves; the
# H-pair max is a reshape-max, mirroring blocks.max_pool_2x2 (plain autodiff
# backward — the argmax custom VJP measured slower, see blocks.max_pool_2x2).
# ---------------------------------------------------------------------------

def max_pool_2x2_folded(xf):
    b, h, w2, c2 = xf.shape
    c = c2 // 2
    # H-pair reshape-max first (full-lane op on the big tensor), then the
    # W-pair lane-half max on the 2x smaller result: the lane split is the
    # only sub-tile op and it touches 1/2 the bytes this way (measured
    # slice_maximum_fusion 2.3 ms -> ~1 ms at 512² b16).
    mh = xf.reshape(b, h // 2, 2, w2, c2).max(axis=2)
    return jnp.maximum(mh[..., :c], mh[..., c:])


class FoldedUpConvT(nn.Module):
    """ConvTranspose k=2 s=2 from an unfolded input straight into the folded
    output layout.  y[b,2h+r,2w+s,o] = x[b,h,w,:] @ k[1-r,1-s,:,o] (the k=s=2
    non-overlap identity, see blocks.conv_transpose_2x2), so the folded output
    row of parity r is ONE dense (C, 2*Co) matmul — MXU-perfect, no
    lhs-dilation, no reverse, and the W-interleave is free (W stays folded).
    Param tree == nn.ConvTranspose((2,2),(2,2)): kernel (2,2,Ci,Co) + bias."""

    features: int
    kernel_init: callable = torch_convt_kernel_init
    bias_init: callable = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        co = self.features
        kernel = self.param("kernel", self.kernel_init, (2, 2, c, co))
        bias = self.param("bias", self.bias_init, (co,))
        krev = kernel[::-1, ::-1].astype(self.dtype)      # [1-r,1-s]
        k2 = krev.transpose(0, 2, 1, 3).reshape(2, c, 2 * co)
        x = x.astype(self.dtype)
        b, h, w, _ = x.shape
        bias2 = jnp.tile(bias.astype(self.dtype), 2)
        # bias added per-row so it rides the matmul epilogue (a post-stack add
        # materialised a separate 1.6 ms full-tensor pass).
        rows = [jnp.einsum("bhwc,cd->bhwd", x, k2[r]) + bias2 for r in range(2)]
        return jnp.stack(rows, axis=2).reshape(b, 2 * h, w, 2 * co)


class FoldedUp(nn.Module):
    """Up block producing a folded output: FoldedUpConvT -> concat-free
    FoldedDoubleConv over the (already folded) skip + upsample pair.  Param
    tree == Up; the spatial pad-to-match (Model.py:69-73) never triggers for
    the even power-of-two sizes the folded path requires (guarded in UNet)."""

    features: int
    dropout: bool = False
    dropout_p: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2f, train: bool = False):
        c = x1.shape[-1]
        x1f = FoldedUpConvT(
            c // 2, dtype=self.dtype, kernel_init=torch_convt_kernel_init,
            bias_init=torch_uniform_init((c // 2) * 4),
            name="ConvTranspose_0")(x1)
        if self.dropout:
            # reference applies dropout to the concat (Model.py:76-79); the
            # concat-free form drops each half with the same rate.  Fold the
            # halves through one Dropout so the mask stream matches a single
            # concat'd call.
            from unet_torch_tpu.nn.blocks import TPUDropout
            cat = TPUDropout(self.dropout_p, deterministic=not train)(
                jnp.concatenate([x2f, x1f], axis=-1))
            c_skip2 = x2f.shape[-1]
            x2f, x1f = cat[..., :c_skip2], cat[..., c_skip2:]
        c_skip = x2f.shape[-1] // 2
        return FoldedDoubleConv(
            self.features, c_skip, in_b=c // 2,
            dtype=self.dtype, name="DoubleConv_0")(x2f, x1f, train=train)


class FoldedOutConv(nn.Module):
    """1x1 conv head on a folded input; returns UNFOLDED logits.  Param tree
    == OutConv (Conv_0: kernel (1,1,Ci,n), bias).

    ``planes=True`` (fused planes head): never materialise the (B,H,W,C)
    logits tensor.  With C of 2-3 classes XLA lays that tensor out C-minor
    (conv outputs are feature-minor on TPU), padding C to the 128-lane tile —
    the forward write, the loss's read and the backward dlogits round trip
    each pay ~128/C x their useful bytes.  Instead contract the folded
    features straight into 2C rank-3 (B,H,W/2) planes (minor dim W/2, full
    lanes); plane n = s*C + c holds class c at W-parity s (nn/folded.fold's
    s-major lane order).  Consumed by
    losses.functional.dice_bce_mc_planes_folded."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xf, planes: bool = False):
        k = self.param("kernel", kaiming_normal,
                       (1, 1, self.in_features, self.features))
        bias = self.param("bias", torch_uniform_init(self.in_features),
                          (self.features,))
        if planes:
            kk = k[0, 0].astype(self.dtype)          # (Ci, C)
            z = jnp.zeros_like(kk)
            # (2Ci, 2C) block-diagonal: lane s*Ci+ci -> plane s*C+c
            k2 = jnp.concatenate([
                jnp.concatenate([kk, z], axis=-1),
                jnp.concatenate([z, kk], axis=-1)], axis=0)
            p = jnp.einsum("nk,bhwk->nbhw", k2.T, xf.astype(self.dtype))
            b2 = jnp.concatenate([bias, bias]).astype(self.dtype)
            return p + b2[:, None, None, None]
        b, h, w2, _ = xf.shape
        xr = xf.astype(self.dtype).reshape(b, h, w2, 2, self.in_features)
        y = jnp.einsum("bhwsc,co->bhwso", xr, k[0, 0].astype(self.dtype))
        y = y + bias.astype(self.dtype)
        return y.reshape(b, h, w2 * 2, self.features)


class _FoldedOutConvWrap(nn.Module):
    """Nests FoldedOutConv's params under Conv_0 to mirror OutConv's tree."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xf, planes: bool = False):
        return FoldedOutConv(self.features, self.in_features,
                             dtype=self.dtype, name="Conv_0")(xf, planes)


# ---------------------------------------------------------------------------
# General-factor W-folding (r4): the TransUnet decoder tail runs C=16 at
# 512² — an 8x lane-padding tax that the r4 profile put at ~10+ ms of the
# 151 ms b8 step.  fold=8 packs 8 W-pixels into the 128-lane dim.
# ---------------------------------------------------------------------------

def fold_f(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H,W//f,f*C): f consecutive W-pixels into lanes."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // f, f * c)


def unfold_f(x: jnp.ndarray, f: int) -> jnp.ndarray:
    b, h, wf, cf = x.shape
    return x.reshape(b, h, wf * f, cf // f)


def fold_kernel_general(k: jnp.ndarray, f: int) -> jnp.ndarray:
    """(3,3,Ci,Co) conv kernel -> (3,3,f*Ci,f*Co) for a W-fold of factor f.

    Folded tap dwf ∈ {-1,0,1}, block (k_in, k_out) carries original W-tap
    dw = k_in - k_out + f*dwf when dw ∈ {-1,0,1}, else zero (for f >= 2 a
    3-wide kernel never reaches beyond the adjacent folded column).
    Reduces to fold_kernel at f=2.  FLOP inflation is f (dense blocks vs
    the 3f non-zero ones) — the trade the UNet fold measured as a wash in
    time and a big win in bytes at C below the 128-lane tile."""
    kh, kw, ci, co = k.shape
    assert kw == 3
    sel = {-1: k[:, 0], 0: k[:, 1], 1: k[:, 2]}
    z = jnp.zeros_like(k[:, 0])

    def tap(dwf):
        rows = []
        for k_in in range(f):
            cols = [sel.get(k_in - k_out + f * dwf, z)
                    for k_out in range(f)]
            rows.append(jnp.concatenate(cols, axis=-1))
        return jnp.concatenate(rows, axis=-2)

    return jnp.stack([tap(-1), tap(0), tap(1)], axis=1)


class FoldedBatchNormF(TPUBatchNorm):
    """FoldedBatchNorm for a general fold factor: stats reduce over all f
    W-slots of each channel at full f*C lane width; affine tiled across
    slots.  Param/stat trees identical to TPUBatchNorm (C-sized)."""

    fold: int = 2

    @nn.compact
    def __call__(self, xf):
        cf = xf.shape[-1]
        f = self.fold
        features = cf // f
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xff = xf.astype(jnp.float32)
            axes = tuple(range(xf.ndim - 1))
            m2 = jnp.mean(xff, axis=axes).reshape(f, features)
            s2 = jnp.mean(xff * xff, axis=axes).reshape(f, features)
            mean = m2.mean(0)
            var = jnp.maximum(s2.mean(0) - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1.0 - self.momentum) * var)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        mul = jnp.tile(inv.astype(xf.dtype), f)
        add = jnp.tile((bias - mean * inv).astype(xf.dtype), f)
        return xf * mul + add
