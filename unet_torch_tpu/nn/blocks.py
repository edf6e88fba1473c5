"""U-Net building blocks — Flax, NHWC, TPU-first.

Capability parity with the reference blocks (all cited), but designed for XLA/MXU:
  * NHWC layout (channels-last) so convs tile directly onto the MXU.
  * BatchNorm runs over the *global* batch under pjit (the whole computation is
    expressed globally; XLA lowers the reduction to a cross-chip psum when the batch
    axis is sharded) — no SyncBN machinery needed.
  * Transposed conv k=2 s=2 is expressed as `flax.linen.ConvTranspose`, which XLA
    lowers to an lhs-dilated convolution (no scatter).

Reference blocks:
  DoubleConv  (conv3x3 pad1 no-bias -> BN -> ReLU) x2   /root/reference/Model.py:7-26
  Down        maxpool2 (+opt dropout) -> DoubleConv      /root/reference/Model.py:29-47
  Up          convT k2 s2 C->C/2, pad-to-match, concat skip, (opt dropout), DoubleConv
                                                         /root/reference/Model.py:50-83
  OutConv     1x1 conv to n_classes                      /root/reference/Model.py:86-92
  Attention_block  additive attention gate               /root/reference/Model.py:257-291
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch's kaiming_normal_ default (fan_in, gain=sqrt(2)) used at Model.py:167-169.
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def torch_uniform_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's default Conv bias init and,
    equivalently, kaiming_uniform_(a=sqrt(5)) for weights (torch _ConvNd
    reset_parameters).  The reference's weights_init (Model.py:167-169) touches
    only nn.Conv2d *weights*, so ConvTranspose2d kernels and every bias keep
    these torch defaults — matched here for trained-outcome parity."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_convt_kernel_init(key, shape, dtype=jnp.float32):
    """torch ConvTranspose2d default weight init.

    torch weight shape is (in, out, kH, kW) and _calculate_fan_in_and_fan_out
    takes dim 1 as the input-fmap count, so fan_in = out_channels * kH * kW;
    kaiming_uniform_(a=sqrt(5)) then gives bound = 1/sqrt(fan_in).  Flax kernel
    shape is (kH, kW, in, out) -> fan_in = shape[-1] * prod(spatial)."""
    fan_in = shape[-1] * math.prod(shape[:-2])
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TPUDropout(nn.Module):
    """nn.Dropout drop-in backed by the hardware rng-bit-generator.

    flax's Dropout draws its mask with the threefry PRNG, which is pure VPU
    arithmetic — ~6 ms per 256M-element mask on v5e (measured in the CLTR
    decoder self-attention, r3 profile; ViT's MLP dropout masks cost several
    ms/step the same way).  The 'rbg' impl lowers to XLA's RngBitGenerator.
    Param-free; same keep/scale semantics as nn.Dropout."""

    rate: float
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic=None):
        det = nn.merge_param("deterministic", self.deterministic,
                             deterministic)
        if det or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        keep = jax.random.bernoulli(
            rbg_key(self.make_rng("dropout")), 1.0 - self.rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.rate), jnp.zeros_like(x))


def rbg_key(key):
    """Convert a (threefry) PRNG key into an 'rbg' key for cheap bulk draws."""
    kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    return jax.random.wrap_key_data(jnp.tile(kd, 2)[:4], impl="rbg")


class TPUBatchNorm(nn.Module):
    """BatchNorm with f32 statistics but compute-dtype apply/output.

    flax's nn.BatchNorm(dtype=f32) promotes the whole normalize path to f32,
    so under bf16 compute every BN+ReLU chain materialises f32 activations —
    2x the HBM bytes of the surrounding convs (measured: the
    convert_reduce/f32-elementwise fusions in the r2 profile).  Here the
    mean/var reductions and running stats stay f32 (accuracy), but the affine
    apply collapses to per-channel bf16 scale+shift, so activations stay in
    the compute dtype end to end.

    Param/stats tree is identical to nn.BatchNorm ({scale,bias} /
    {mean,var}) — checkpoints interchange.  torch semantics matched:
    momentum 0.9 flax == torch BatchNorm2d momentum=0.1 (Model.py:17,21).
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            # fast-variance form, same as flax's default (_compute_stats)
            var = jnp.maximum(
                jnp.mean(xf * xf, axis=reduce_axes) - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1.0 - self.momentum) * var)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        mul = inv.astype(x.dtype)
        add = (bias - mean * inv).astype(x.dtype)
        return x * mul + add


class FastConvTranspose2x2(nn.Module):
    """ConvTranspose k=2 s=2 as one matmul + depth-to-space.

    XLA lowers lax.conv_transpose to an lhs-dilated conv: for k=s=2 that's 4
    kernel taps per output of which 3 hit inserted zeros (plus a kernel
    `reverse` op, visible in the r2 profile) — 4x wasted MXU work.  Here each
    output pixel is exactly one tap: T[b,h,w,(r,s,o)] = sum_c X·K[r,s,c,o],
    a single (BHW,C)x(C,4O) matmul, then interleave (r,s) into space.

    Param tree (kernel (2,2,C,O), bias (O,)) and numerics are bit-compatible
    with flax nn.ConvTranspose((2,2), strides=(2,2)) — verified in
    tests/test_kernels.py; torch imports keep working unchanged.

    MEASURED (r2, UNet-64 bf16 b16 512²): 80.4 img/s vs 82.8 with XLA's
    dilated conv — the depth-to-space interleave costs more than the dilated
    taps save, so this is NOT wired into Up/AttentionGate; kept as an
    oracle-verified experiment (same status as kernels/pool.py).
    """

    features: int
    kernel_init: callable = nn.initializers.lecun_normal()
    bias_init: callable = nn.initializers.zeros
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (2, 2, c, self.features))
        # flax conv_transpose correlates with the spatially flipped kernel
        k = kernel[::-1, ::-1].astype(self.dtype)
        x = x.astype(self.dtype)
        t = jnp.einsum("bhwc,rsco->bhwrso", x, k)
        b, h, w, _r, _s, o = t.shape
        t = t.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, o)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            t = t + bias.astype(self.dtype)
        return t


def max_pool_2x2(x):
    """2x2/stride-2 max pool as a reshape-max.  Backward is an equality-mask
    fusion; gradient splits equally among tied maxima (torch's
    select_and_scatter picks the first; subgradient either way — trained
    outcome parity verified, PARITY_DICE.json).  Reference op:
    /root/reference/Model.py:33 (nn.MaxPool2d(2); torch floors odd trailing
    rows/cols).

    MEASURED (r3, UNet-64 bf16 b16 512²): the argmax custom VJP below
    (_max_pool_2x2_argmax) is 7.5% SLOWER end-to-end (76.7 vs 82.9 img/s,
    benchmarks/bench_variants.py) — the strided window slices + gradient
    interleave cost more than the eq-mask broadcasts they replace — so this
    reshape-max stays the default."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        # torch MaxPool2d(2,2) floors: the trailing odd row/col is ignored
        x = x[:, :h - h % 2, :w - w % 2, :]
        h, w = x.shape[1], x.shape[2]
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


_max_pool_2x2_eq = max_pool_2x2  # oracle alias used by the experiment tests


def _pool_window_slices(x):
    return (x[:, 0::2, 0::2, :], x[:, 0::2, 1::2, :],
            x[:, 1::2, 0::2, :], x[:, 1::2, 1::2, :])


@jax.custom_vjp
def _max_pool_2x2_argmax_even(x):
    x00, x01, x10, x11 = _pool_window_slices(x)
    return jnp.maximum(jnp.maximum(x00, x01), jnp.maximum(x10, x11))


def _max_pool_2x2_fwd(x):
    x00, x01, x10, x11 = _pool_window_slices(x)
    m = jnp.maximum(jnp.maximum(x00, x01), jnp.maximum(x10, x11))
    # first-match index in row-major window order (torch semantics); computed
    # in the same elementwise pass as the max (one read of x).
    idx = jnp.where(
        x00 == m, jnp.uint8(0),
        jnp.where(x01 == m, jnp.uint8(1),
                  jnp.where(x10 == m, jnp.uint8(2), jnp.uint8(3))))
    return m, idx


def _max_pool_2x2_bwd(idx, dy):
    b, h2, w2, c = dy.shape
    zero = jnp.zeros_like(dy)
    g = [jnp.where(idx == k, dy, zero) for k in range(4)]
    # interleave the four masked grads back onto the input grid:
    # row r of each window gets (g[2r], g[2r+1]) stacked along a new W axis.
    row0 = jnp.stack([g[0], g[1]], axis=3).reshape(b, h2, 2 * w2, c)
    row1 = jnp.stack([g[2], g[3]], axis=3).reshape(b, h2, 2 * w2, c)
    dx = jnp.stack([row0, row1], axis=2).reshape(b, 2 * h2, 2 * w2, c)
    return (dx,)


_max_pool_2x2_argmax_even.defvjp(_max_pool_2x2_fwd, _max_pool_2x2_bwd)


def _max_pool_2x2_argmax(x):
    """2x2/stride-2 max pool with an argmax-index custom VJP and torch-exact
    tie semantics (first maximum in row-major window order).

    EXPERIMENT, NOT WIRED: measured 7.5% slower end-to-end than the
    reshape-max default (76.7 vs 82.9 img/s, UNet-64 bf16 b16 512²,
    benchmarks/bench_variants.py v_pool) — the four strided window slices in
    the forward and the stack/reshape gradient interleave in the backward
    outweigh the eq-mask broadcasts they remove.  Kept oracle-tested
    (tests/test_folded.py) as the torch-exact-tie reference.
    """
    _, h, w, _ = x.shape
    if h % 2 or w % 2:
        x = x[:, :h - h % 2, :w - w % 2, :]
    return _max_pool_2x2_argmax_even(x)


@jax.custom_vjp
def conv_transpose_2x2(x, k):
    """ConvTranspose k=2 s=2 'SAME' with a hand-written reverse-free VJP.

    EXPERIMENT, NOT WIRED: forward is bit-identical to flax nn.ConvTranspose
    ((2,2), strides=(2,2)) — an lhs-dilated conv with pad (1,1) — and the VJP
    replaces XLA autodiff's full spatial `reverse` ops on gradient
    activations (4.7 ms/step in the r2 profile) with a stride-2 VALID conv
    (dx) and the standard wgrad conv (dk).  MEASURED 1% slower end-to-end
    (82.0 vs 82.9 img/s, benchmarks/bench_variants.py v_convt): XLA's
    reverse+dilated-conv backward beats these conv forms despite the extra
    data movement.  Oracle-tested in tests/test_folded.py; the *folded*
    decoder path (nn/folded.py FoldedUpConvT) avoids the reverses for real.
    Reference op: ConvTranspose2d(C, C//2, 2, 2) at /root/reference/Model.py:59.
    """
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _convt2x2_fwd(x, k):
    return conv_transpose_2x2(x, k), (x, k)


def _convt2x2_bwd(res, dy):
    x, k = res
    # y[b,2h+u,2w+v,o] = sum_c x[b,h,w,c] k[1-u,1-v,c,o]  (non-overlapping)
    # dx[b,h,w,c] = sum_{u,v,o} dy[b,2h+u,2w+v,o] k[1-u,1-v,c,o]
    kk = jnp.flip(k, (0, 1)).transpose(0, 1, 3, 2)  # (u,v,O->in,C->out)
    dx = jax.lax.conv_general_dilated(
        dy, kk.astype(dy.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # dk[r,s,c,o] = sum_{b,h,w} x[b,h,w,c] dy[b,2h+1-r,2w+1-s,o]: the wgrad
    # conv — x lhs-dilated by 2 and padded (1,1), dy as the sliding kernel,
    # batch contracted as the feature dim (XLA's native wgrad pattern).
    dk = jax.lax.conv_general_dilated(
        x, dy, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("CHWN", "IHWO", "HWNC"),
        preferred_element_type=jnp.float32)
    return dx, dk.astype(k.dtype)


conv_transpose_2x2.defvjp(_convt2x2_fwd, _convt2x2_bwd)


class TorchConvTranspose2x2(nn.Module):
    """Drop-in for nn.ConvTranspose((2,2), strides=(2,2)) with the
    reverse-free custom VJP above (same param tree {kernel, bias}, same
    numerics).  NOT WIRED — see the conv_transpose_2x2 measurement note."""

    features: int
    kernel_init: callable = torch_convt_kernel_init
    bias_init: callable = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (2, 2, c, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        y = conv_transpose_2x2(x.astype(self.dtype), kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)


class DoubleConv(nn.Module):
    """(Conv3x3 pad=1 bias=False -> BatchNorm -> ReLU) * 2, optional mid width."""

    features: int
    mid_features: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_features or self.features
        for i, feats in enumerate((mid, self.features)):
            x = nn.Conv(
                feats,
                (3, 3),
                padding=1,
                use_bias=False,
                kernel_init=kaiming_normal,
                dtype=self.dtype,
            )(x)
            x = TPUBatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch BatchNorm2d momentum=0.1 == flax momentum 0.9
                epsilon=1e-5,
                dtype=self.dtype,
                name=f"BatchNorm_{i}",
            )(x)
            x = nn.relu(x)
        return x


class Down(nn.Module):
    """2x2 max-pool (stride 2), optional dropout, then DoubleConv.

    folded_input=True consumes a W-folded (B,H,W/2,2C) tensor (nn/folded.py)
    and pools it straight back to the unfolded (B,H/2,W/2,C) grid — the
    W-pair max is a free lane-half max.  Param tree is identical either way.
    """

    features: int
    dropout: bool = False
    dropout_p: float = 0.5
    dtype: jnp.dtype = jnp.float32
    folded_input: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.folded_input:
            from unet_torch_tpu.nn.folded import max_pool_2x2_folded
            x = max_pool_2x2_folded(x)
        else:
            x = max_pool_2x2(x)
        if self.dropout:
            x = TPUDropout(self.dropout_p, deterministic=not train)(x)
        return DoubleConv(self.features, dtype=self.dtype)(x, train=train)


def up_conv_transpose(features, dtype):
    """The upsample op used by Up — a module-level factory so the perf
    experiments (benchmarks/bench_variants.py v_convt) can swap in
    TorchConvTranspose2x2 and measure what the model actually runs."""
    return nn.ConvTranspose(
        features, (2, 2), strides=(2, 2), dtype=dtype,
        kernel_init=torch_convt_kernel_init,
        bias_init=torch_uniform_init(features * 4))


class Up(nn.Module):
    """ConvTranspose k=2 s=2 halving channels, pad to skip size, concat, DoubleConv.

    Channel flow mirrors Model.py:50-83: input C -> up to C/2, concat skip (C/2)
    -> C -> DoubleConv -> out_features.
    """

    features: int
    dropout: bool = False
    dropout_p: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        c = x1.shape[-1]
        # NB: both alternative formulations measured SLOWER than XLA's
        # dilated conv here: matmul+depth-to-space (FastConvTranspose2x2,
        # 80.4 vs 82.8 img/s, r2) and the reverse-free custom VJP
        # (conv_transpose_2x2, 82.0 vs 82.9, r3 bench_variants.py).
        x1 = up_conv_transpose(c // 2, self.dtype)(x1)
        # Pad x1 spatially to match the skip feature (reference pads with F.pad,
        # split as [d//2, d - d//2] per axis: Model.py:69-73).
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(
                x1,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
            )
        x = jnp.concatenate([x2, x1], axis=-1)
        if self.dropout:
            x = TPUDropout(self.dropout_p, deterministic=not train)(x)
        return DoubleConv(self.features, dtype=self.dtype)(x, train=train)


class OutConv(nn.Module):
    """1x1 conv head to n_classes (Model.py:86-92)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (1, 1), kernel_init=kaiming_normal,
            bias_init=torch_uniform_init(x.shape[-1]), dtype=self.dtype
        )(x)


class AttentionGate(nn.Module):
    """Additive attention gate (Model.py:257-291).

    q: coarse gating feature (C_q, H, W); x: skip feature (C_x, 2H, 2W).
    up(q) -> W_q, W_x 1x1+BN -> ReLU(Q1+X1) -> psi 1x1+BN+sigmoid -> x * A.
    """

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, x, train: bool = False):
        cq = q.shape[-1]
        q = nn.ConvTranspose(cq, (2, 2), strides=(2, 2), dtype=self.dtype,
                             kernel_init=torch_convt_kernel_init,
                             bias_init=torch_uniform_init(cq * 4))(q)

        def proj(v, feats, name):
            v = nn.Conv(
                feats,
                (1, 1),
                use_bias=True,
                kernel_init=kaiming_normal,
                bias_init=torch_uniform_init(v.shape[-1]),
                dtype=self.dtype,
                name=f"{name}_conv",
            )(v)
            return TPUBatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=f"{name}_bn",
            )(v)

        q1 = proj(q, self.hidden, "W_q")
        x1 = proj(x, self.hidden, "W_x")
        e = nn.relu(q1 + x1)
        a = jax.nn.sigmoid(proj(e, 1, "psi"))
        return x * a
