"""On-device auction LSAP vs scipy's exact Hungarian solver."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from unet_torch_tpu.kernels.auction import auction_lsap, auction_lsap_batched


def _total_cost(cost, match, n):
    return sum(cost[match[j], j] for j in range(n))


@pytest.mark.parametrize("q,t", [(20, 5), (50, 50), (200, 40), (64, 1)])
def test_auction_matches_scipy_cost(q, t):
    rng = np.random.RandomState(q * 100 + t)
    cost = rng.rand(q, t) * 10
    rows, cols = linear_sum_assignment(cost)
    opt = cost[rows, cols].sum()

    match = np.asarray(auction_lsap(jnp.asarray(cost)))
    # assignment must be feasible (distinct rows)
    assert len(set(match.tolist())) == t
    ours = _total_cost(cost, match, t)
    assert ours <= opt + 1e-3 * max(1, abs(opt))


def test_auction_with_padding_mask():
    rng = np.random.RandomState(0)
    cost = rng.rand(30, 8) * 5
    valid = np.zeros(8, bool)
    valid[:3] = True
    match = np.asarray(auction_lsap(jnp.asarray(cost), jnp.asarray(valid)))
    rows, cols = linear_sum_assignment(cost[:, :3])
    opt = cost[rows, cols].sum()
    assert len(set(match[:3].tolist())) == 3
    assert _total_cost(cost, match, 3) <= opt + 1e-3
    assert (match[3:] == 0).all()


def test_auction_no_valid_targets():
    cost = jnp.asarray(np.random.RandomState(1).rand(10, 4))
    valid = jnp.zeros(4, bool)
    match = np.asarray(auction_lsap(cost, valid))
    assert (match == 0).all()


def test_auction_batched():
    rng = np.random.RandomState(2)
    costs = rng.rand(2, 3, 25, 6)
    valid = np.ones((2, 3, 6), bool)
    valid[1, :, 4:] = False
    out = np.asarray(auction_lsap_batched(jnp.asarray(costs),
                                          jnp.asarray(valid)))
    assert out.shape == (2, 3, 6)
    for l in range(2):
        for b in range(3):
            n = int(valid[l, b].sum())
            rows, cols = linear_sum_assignment(costs[l, b][:, :n])
            opt = costs[l, b][rows, cols].sum()
            ours = _total_cost(costs[l, b], out[l, b], n)
            assert len(set(out[l, b, :n].tolist())) == n
            assert ours <= opt + 1e-2


def test_auction_exhaustion_never_returns_negative():
    """max_iters exhaustion must not leak -1 (would wrap to the last query in
    criterion.level_losses) — the greedy completion pass guarantees a valid
    duplicate-free assignment."""
    rng = np.random.RandomState(3)
    q, t = 40, 12
    cost = rng.rand(q, t) * 100
    valid = np.ones(t, bool)
    # max_iters=1: one bidding round cannot assign 12 targets
    match = np.asarray(auction_lsap(jnp.asarray(cost), jnp.asarray(valid),
                                    max_iters=1))
    assert (match >= 0).all() and (match < q).all()
    assert len(set(match.tolist())) == t


@pytest.mark.parametrize("spread", [1e-6, 1.0, 1e8])
def test_auction_adversarial_cost_spreads(spread):
    rng = np.random.RandomState(4)
    q, t = 60, 15
    cost = rng.rand(q, t) * spread
    # adversarial: near-ties plus one dominant column
    cost[:, 0] = spread
    cost[7, 0] = 0.0
    match = np.asarray(auction_lsap(jnp.asarray(cost)))
    assert (match >= 0).all()
    assert len(set(match.tolist())) == t
    rows, cols = linear_sum_assignment(cost)
    opt = cost[rows, cols].sum()
    ours = _total_cost(cost, match, t)
    assert ours <= opt + 1e-3 * max(1.0, abs(opt))


class TestPallasAuction:
    """Whole-auction Pallas kernel (interpret mode) vs scipy / the jnp path."""

    def test_pallas_matches_scipy_cost(self):
        from unet_torch_tpu.kernels.auction import auction_lsap_pallas

        rng = np.random.RandomState(7)
        B, Q, T = 5, 200, 17
        costs = rng.rand(B, Q, T) * 10
        valid = np.ones((B, T), bool)
        valid[2, 9:] = False
        valid[4, :] = False
        out = np.asarray(auction_lsap_pallas(jnp.asarray(costs),
                                             jnp.asarray(valid),
                                             interpret=True))
        assert out.shape == (B, T)
        for b in range(B):
            n = int(valid[b].sum())
            if n == 0:
                assert (out[b] == 0).all()
                continue
            rows, cols = linear_sum_assignment(costs[b][:, :n])
            opt = costs[b][rows, cols].sum()
            assert len(set(out[b, :n].tolist())) == n
            ours = _total_cost(costs[b], out[b], n)
            assert ours <= opt + 1e-3 * max(1, abs(opt))
            assert (out[b, n:] == 0).all()

    def test_pallas_matches_jnp_path(self):
        """Same tie rules: the kernel and the vmapped while_loop agree
        exactly on instances with distinct costs."""
        import jax

        from unet_torch_tpu.kernels.auction import (
            auction_lsap,
            auction_lsap_pallas,
        )

        rng = np.random.RandomState(11)
        B, Q, T = 4, 150, 12
        costs = rng.rand(B, Q, T).astype(np.float32) * 3
        valid = np.ones((B, T), bool)
        ker = np.asarray(auction_lsap_pallas(jnp.asarray(costs),
                                             jnp.asarray(valid),
                                             interpret=True))
        ref = np.asarray(jax.vmap(auction_lsap)(jnp.asarray(costs),
                                                jnp.asarray(valid)))
        # both are eps-optimal; costs must agree to eps-bound even where
        # index choices differ
        for b in range(B):
            ck = _total_cost(costs[b], ker[b], T)
            cr = _total_cost(costs[b], ref[b], T)
            assert abs(ck - cr) <= 1e-2

    def test_batched_routing_interpret(self):
        from unet_torch_tpu.kernels.auction import auction_lsap_batched

        rng = np.random.RandomState(13)
        costs = rng.rand(2, 3, 140, 6).astype(np.float32)
        valid = np.ones((2, 3, 6), bool)
        valid[1, :, 4:] = False
        out_k = np.asarray(auction_lsap_batched(jnp.asarray(costs),
                                                jnp.asarray(valid),
                                                interpret=True))
        out_j = np.asarray(auction_lsap_batched(jnp.asarray(costs),
                                                jnp.asarray(valid),
                                                use_pallas=False))
        assert out_k.shape == out_j.shape == (2, 3, 6)
        for l in range(2):
            for b in range(3):
                n = int(valid[l, b].sum())
                ck = _total_cost(costs[l, b], out_k[l, b], n)
                cj = _total_cost(costs[l, b], out_j[l, b], n)
                assert abs(ck - cj) <= 1e-2
