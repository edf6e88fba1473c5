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
