"""Pallas kernels vs XLA oracles (interpret mode on the CPU test backend)."""

import numpy as np

import jax.numpy as jnp

from unet_torch_tpu.kernels.attention import (
    _attention_pallas,
    attention_reference,
    fused_attention,
)
from unet_torch_tpu.kernels.minplus import minplus_pallas, minplus_reference


def test_fused_attention_matches_reference():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 4, 64, 32), jnp.float32)
    k = jnp.asarray(rng.randn(2, 4, 48, 32), jnp.float32)
    v = jnp.asarray(rng.randn(2, 4, 48, 16), jnp.float32)
    scale = 32 ** -0.5
    ref = attention_reference(q, k, v, scale)
    out = _attention_pallas(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_attention_masked_fallback():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 2, 8, 16), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 8, 16), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 8, 16), jnp.float32)
    mask = jnp.zeros((1, 8), bool).at[0, 5:].set(True)
    out = fused_attention(q, k, v, key_padding_mask=mask)
    # masked keys get zero weight: recompute manually
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * 16**-0.5
    s[..., 5:] = -np.inf
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_minplus_matches_reference():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(70, 50) * 100, jnp.float32)
    b = jnp.asarray(rng.rand(50, 90) * 100, jnp.float32)
    ref = minplus_reference(a, b)
    out = minplus_pallas(a, b, tm=32, tn=32, tk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_attention_gradients_match_reference():
    """custom-VJP (Pallas fwd in interpret mode, einsum bwd) == full autodiff
    of the einsum reference."""
    import jax

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 2, 16, 8), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 12, 8), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 12, 8), jnp.float32)
    scale = 8 ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, scale) ** 2)

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, use_pallas=True,
                                       interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_max_pool_2x2_forward_and_grad_match_xla():
    """Reshape-pool custom VJP == nn.max_pool + XLA select_and_scatter grads
    (both route ties to the first window element)."""
    import jax
    from flax import linen as nn

    from unet_torch_tpu.kernels.pool import max_pool_2x2

    rng = np.random.RandomState(5)
    # include exact ties (ReLU-style zeros) to check tie routing
    x = rng.randn(2, 8, 10, 3).astype(np.float32)
    x[x < 0] = 0.0
    xj = jnp.asarray(x)

    ref_fn = lambda t: jnp.sum(
        nn.max_pool(t, (2, 2), strides=(2, 2)) ** 2)
    our_fn = lambda t: jnp.sum(max_pool_2x2(t) ** 2)

    np.testing.assert_allclose(
        np.asarray(max_pool_2x2(xj)),
        np.asarray(nn.max_pool(xj, (2, 2), strides=(2, 2))))
    g_ref = jax.grad(ref_fn)(xj)
    g_our = jax.grad(our_fn)(xj)
    np.testing.assert_allclose(np.asarray(g_our), np.asarray(g_ref),
                               atol=1e-6)


def test_max_pool_2x2_odd_sizes():
    import jax

    from unet_torch_tpu.kernels.pool import max_pool_2x2

    x = jnp.asarray(np.random.RandomState(6).randn(1, 7, 9, 2), jnp.float32)
    out = max_pool_2x2(x)
    assert out.shape == (1, 3, 4, 2)
    g = jax.grad(lambda t: jnp.sum(max_pool_2x2(t)))(x)
    assert g.shape == x.shape


def test_fast_conv_transpose_matches_flax():
    """FastConvTranspose2x2 == nn.ConvTranspose((2,2),(2,2)) bit-for-bit on
    the same kernel/bias (depth-to-space formulation, nn/blocks.py)."""
    import numpy as np
    from flax import linen as nn

    from unet_torch_tpu.nn.blocks import FastConvTranspose2x2

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 6, 8), jnp.float32)
    kernel = jnp.asarray(rng.randn(2, 2, 8, 4), jnp.float32)
    bias = jnp.asarray(rng.randn(4), jnp.float32)
    ref = nn.ConvTranspose(4, (2, 2), strides=(2, 2)).apply(
        {"params": {"kernel": kernel, "bias": bias}}, x)
    got = FastConvTranspose2x2(4).apply(
        {"params": {"kernel": kernel, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_flash_attention_matches_reference():
    """Flash-tiled kernel (online softmax over Nk tiles) == oracle, including
    ragged tile edges and asymmetric Nq/Nk (kernels/attention.py)."""
    import numpy as np

    from unet_torch_tpu.kernels.attention import (
        _attention_flash,
        attention_reference,
    )

    rng = np.random.RandomState(1)
    for (b, h, nq, nk, d, dv) in [(1, 2, 300, 300, 64, 64),
                                  (1, 8, 2000, 64, 32, 256),
                                  (1, 1, 8, 1500, 128, 128)]:
        q = jnp.asarray(rng.randn(b, h, nq, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, h, nk, dv), jnp.float32)
        scale = d ** -0.5
        ref = attention_reference(q, k, v, scale)
        got = _attention_flash(q, k, v, scale, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=2e-5)


def test_flash_attention_grad_matches_reference():
    import numpy as np

    import jax

    from unet_torch_tpu.kernels.attention import (
        _attention_flash_diff,
        attention_reference,
    )

    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 2, 260, 64), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 140, 64), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 140, 64), jnp.float32)
    scale = 64 ** -0.5

    def f_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, scale) ** 2)

    def f_flash(q, k, v):
        return jnp.sum(_attention_flash_diff(q, k, v, scale, True, False) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_masked_attention_kernels_match_reference():
    """key_padding_mask now stays on the fused kernels (bias formulation);
    fwd+grad parity vs the masked einsum reference (interpret mode)."""
    import numpy as np

    import jax

    from unet_torch_tpu.kernels.attention import (
        _attention_flash_masked_diff,
        _attention_masked_diff,
    )

    rng = np.random.RandomState(3)
    b, h, nq, nk, d = 2, 3, 70, 90, 32
    q = jnp.asarray(rng.randn(b, h, nq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)
    mask = np.zeros((b, nk), bool)
    mask[0, 60:] = True
    mask[1, 75:] = True
    bias = jnp.where(jnp.asarray(mask), -1e30, 0.0).astype(jnp.float32)
    scale = d ** -0.5

    def ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        s = jnp.where(jnp.asarray(mask)[:, None, None, :], -jnp.inf, s)
        return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)

    expect = ref(q, k, v)
    got_w = _attention_masked_diff(q, k, v, bias, scale, True, False)
    got_f = _attention_flash_masked_diff(q, k, v, bias, scale, True, False)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(expect),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(expect),
                               rtol=1e-4, atol=2e-5)

    g_ref = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), (0, 1, 2))(q, k, v)
    g_w = jax.grad(lambda *a: jnp.sum(
        _attention_masked_diff(*a, bias, scale, True, False) ** 2), (0, 1, 2))(
        q, k, v)
    for a, e in zip(g_w, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-3, atol=1e-4)


class TestDropoutFlashAttention:
    """Dropout-flash kernel (train-path attention with in-kernel counter-hash
    masks): oracle = einsum attention with the same mask computed via the
    shared _dropout_keep formula."""

    def _mask(self, A, bh_n, nq, nk, nk_p, seed, rate):
        import jax.numpy as jnp
        thr = min(int(rate * 2 ** 32), 2 ** 32 - 1)
        return jnp.stack([
            A._dropout_keep(jnp.uint32(seed), jnp.uint32(bh), 0, 0,
                            (nq, nk), nk_p, thr)
            for bh in range(bh_n)]).astype(jnp.float32)

    def _oracle(self, q, k, v, mask, scale, rate):
        import jax
        import jax.numpy as jnp
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        p = jax.nn.softmax(s, axis=-1)
        b, h, nq, nk = s.shape
        p = p * mask.reshape(b, h, nq, nk) / (1.0 - rate)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))

    def test_rate0_matches_plain_attention(self):
        import jax.numpy as jnp
        from unet_torch_tpu.kernels import attention as A

        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(1, 2, 24, 8), jnp.float32)
        k = jnp.asarray(rng.randn(1, 2, 40, 8), jnp.float32)
        v = jnp.asarray(rng.randn(1, 2, 40, 8), jnp.float32)
        out = A.dropout_flash_attention(q, k, v, jnp.uint32(7), 8 ** -0.5,
                                        0.0, True)
        ref = A.attention_reference(q, k, v, 8 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        # rate==0 statically skips the in-kernel PRNG in all three passes —
        # the flash backward must still match the einsum gradients (this is
        # the ViT train path, models/transunet/vit.py::Attention)
        import jax

        def loss_k(q, k, v):
            return (A.dropout_flash_attention(q, k, v, jnp.uint32(7),
                                              8 ** -0.5, 0.0, True) ** 2).sum()

        def loss_r(q, k, v):
            return (A.attention_reference(q, k, v, 8 ** -0.5) ** 2).sum()

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    def test_dropout_fwd_bwd_vs_oracle_multitile(self):
        import jax
        import jax.numpy as jnp
        from unet_torch_tpu.kernels import attention as A

        rng = np.random.RandomState(1)
        rate, seed, scale = 0.3, 99, 8 ** -0.5
        q = jnp.asarray(rng.randn(1, 1, 40, 8), jnp.float32)
        k = jnp.asarray(rng.randn(1, 1, 300, 8), jnp.float32)
        v = jnp.asarray(rng.randn(1, 1, 300, 8), jnp.float32)
        mask = self._mask(A, 1, 40, 300, A._ceil_to(300, 128), seed, rate)
        out = A.dropout_flash_attention(q, k, v, jnp.uint32(seed), scale,
                                        rate, True)
        ref = self._oracle(q, k, v, mask, scale, rate)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        # keep fraction sane
        assert abs(float(mask.mean()) - (1 - rate)) < 0.02

        def loss_k(q, k, v):
            return (A.dropout_flash_attention(q, k, v, jnp.uint32(seed),
                                              scale, rate, True) ** 2).sum()

        def loss_o(q, k, v):
            return (self._oracle(q, k, v, mask, scale, rate) ** 2).sum()

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
        go = jax.grad(loss_o, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gk, go):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    def test_deterministic_and_seed_sensitive(self):
        import jax.numpy as jnp
        from unet_torch_tpu.kernels import attention as A

        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(1, 2, 16, 8), jnp.float32)
        k = jnp.asarray(rng.randn(1, 2, 16, 8), jnp.float32)
        v = jnp.asarray(rng.randn(1, 2, 16, 8), jnp.float32)
        a1 = A.dropout_flash_attention(q, k, v, jnp.uint32(5), 8 ** -0.5,
                                       0.5, True)
        a2 = A.dropout_flash_attention(q, k, v, jnp.uint32(5), 8 ** -0.5,
                                       0.5, True)
        b1 = A.dropout_flash_attention(q, k, v, jnp.uint32(6), 8 ** -0.5,
                                       0.5, True)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert np.abs(np.asarray(a1) - np.asarray(b1)).max() > 1e-3


def test_kernel_flop_accounting_tallies_trace_time():
    """kernels/accounting.py: tracing a dropout-flash fwd+bwd under
    count_kernel_flops records the analytic matmul flops (the MFU ledger's
    in-kernel term, benchmarks/mfu.py); outside the context nothing records."""
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.kernels import attention as A
    from unet_torch_tpu.kernels.accounting import count_kernel_flops

    b, h, nq, nk, d = 1, 2, 16, 128, 8
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, nq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)

    def loss(q, k, v):
        return (A.dropout_flash_attention(q, k, v, jnp.uint32(0), d ** -0.5,
                                          0.1, True) ** 2).sum()

    with count_kernel_flops() as tally:
        jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(q, k, v)
    # nq pads to 16 (bq=16), nk pads to 128 (bk=128); the backward is the
    # merged single-pass kernel (5 dots: 3 over dqk, 2 over dv)
    assert tally["dropout_flash_fwd"] == 2 * b * h * 16 * 128 * (d + d)
    assert tally["dropout_flash_bwd1"] == 2 * b * h * 16 * 128 * (3 * d + 2 * d)

    from unet_torch_tpu.kernels import accounting

    assert accounting._TALLY is None  # restored; record() outside is a no-op
    accounting.record("x", 1.0)


def test_dropout_flash_bwd_merged_matches_twopass():
    """The single-pass backward (_dropout_flash_bwd1: dk/dv in a persistent
    whole-K scratch, one s/dp recompute) is bit-identical to the two-pass
    control across asymmetric shapes, ragged padding, and dropout rates
    (interpret mode: the counter-hash mask is identical by construction)."""
    import jax
    import jax.numpy as jnp

    from unet_torch_tpu.kernels import attention as A

    rng = np.random.RandomState(0)
    for (b, h, nq, nk, d, dvd, rate) in [(2, 2, 300, 300, 32, 32, 0.1),
                                         (1, 2, 260, 140, 64, 64, 0.0),
                                         (2, 1, 128, 512, 64, 32, 0.25)]:
        q = jnp.asarray(rng.randn(b, h, nq, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, h, nk, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, h, nk, dvd), jnp.float32)
        g = jnp.asarray(rng.randn(b, h, nq, dvd), jnp.float32)
        seed = jnp.uint32(9)
        scale = d ** -0.5
        # explicit small blocks: _dfa_blocks would give nkt==1 for every
        # shape this size — force the true multi-tile (online-softmax fwd,
        # k-loop bwd) paths the CLTR decoder runs on chip (nk=2048, nkt=2)
        bq, bk = 64, 128
        out, lse = A._dropout_flash_fwd(q, k, v, seed, scale, rate,
                                        block_q=bq, block_k=bk,
                                        interpret=True)
        # fwd vs einsum oracle with the shared counter-hash mask
        nk_p = A._ceil_to(nk, bk)
        thr = min(int(rate * 2 ** 32), 2 ** 32 - 1)
        mask = jnp.stack([
            A._dropout_keep(seed, jnp.uint32(bh), 0, 0, (nq, nk), nk_p, thr)
            for bh in range(b * h)]).astype(jnp.float32).reshape(b, h, nq, nk)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(s, axis=-1)
        if thr:
            p = p * mask / (1.0 - rate)
        ref = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        np.testing.assert_allclose(
            np.asarray(out[:, :nq].reshape(b, h, nq, dvd)),
            np.asarray(ref), atol=1e-5)
        nq_p = lse.shape[1]
        dterm = jnp.einsum("bhqd,bhqd->bhq", g,
                           out[:, :nq].reshape(b, h, nq, dvd)
                           ).reshape(b * h, nq)
        if nq_p != nq:
            dterm = jnp.pad(dterm, ((0, 0), (0, nq_p - nq)))
        dterm = jnp.broadcast_to(dterm[..., None], dterm.shape + (8,))
        args = (q, k, v, seed, lse, dterm, g)
        r2 = A._dropout_flash_bwd(*args, scale, rate, block_q=bq,
                                  block_k=bk, interpret=True)
        r1 = A._dropout_flash_bwd1(*args, scale, rate, block_q=bq,
                                   block_k=bk, interpret=True)
        for a, b_ in zip(r1, r2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-5)


def test_merged_bwd_vmem_gate():
    """_dfa_bwd falls back to the two-pass kernel when the (nk_p, d)
    persistent scratches would blow VMEM (kernels/attention.py)."""
    from unet_torch_tpu.kernels.attention import _merged_bwd_fits

    assert _merged_bwd_fits(2000, 2000, 32, 32, 512, 1024)   # CLTR decoder
    assert _merged_bwd_fits(1024, 1024, 64, 64, 512, 1024)   # ViT-B 512px
    assert not _merged_bwd_fits(8192, 8192, 64, 64, 512, 1024)
