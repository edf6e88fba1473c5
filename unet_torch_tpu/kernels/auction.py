"""Auction-algorithm linear sum assignment — on-device LSAP for DETR matching.

The reference ships the matching to scipy on CPU every step
(/root/reference/CLTR/matcher.py:77-80), stalling the accelerator; our default
CLTR path does the same split explicitly (train/cltr_steps.py).  This module
provides the fully-on-device alternative: Bertsekas' forward auction with
Jacobi (all-bidders-parallel) bidding and ε-scaling, expressed entirely in
`lax.while_loop` — so the matching can live *inside* the jit'd train step and
the whole CLTR iteration fuses into one XLA program.

Bidding is (T, Q) elementwise max/argmax work on the VPU; with Q=2000 queries
and ≤512 targets a bidding round is ~1M lanes — microseconds on TPU versus a
millisecond-scale host round-trip plus transfer.

ε-optimality: the returned assignment's cost is within T·ε_final of optimal;
tests check exact-cost agreement with scipy on random instances (ties may
resolve differently).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e30


def _auction_phase(benefit, valid, price, eps, max_iters):
    """One ε-phase of forward auction.  benefit: (T, Q); valid: (T,) bool.
    Returns (price, owner_q (Q,), match (T,))."""
    T, Q = benefit.shape
    t_ids = jnp.arange(T)

    def cond(state):
        price, owner_q, match, it = state
        return (it < max_iters) & jnp.any((match < 0) & valid)

    def body(state):
        price, owner_q, match, it = state
        unassigned = (match < 0) & valid

        values = benefit - price[None, :]
        i1 = jnp.argmax(values, axis=1)
        v1 = jnp.take_along_axis(values, i1[:, None], axis=1)[:, 0]
        masked = values.at[t_ids, i1].set(_NEG)
        v2 = jnp.max(masked, axis=1)
        bid = price[i1] + (v1 - v2) + eps
        bid = jnp.where(unassigned, bid, _NEG)

        # highest bid per query wins; ties -> lowest target index
        best_bid = jnp.full((Q,), _NEG).at[i1].max(bid)
        contender = unassigned & (bid >= best_bid[i1]) & (bid > _NEG)
        winner_q = jnp.full((Q,), T).at[i1].min(
            jnp.where(contender, t_ids, T))
        won = contender & (winner_q[i1] == t_ids)

        has_winner = winner_q < T
        price = jnp.where(has_winner, jnp.maximum(best_bid, price), price)
        owner_q = jnp.where(has_winner, winner_q, owner_q)
        match = jnp.where(won, i1, match)
        # a target whose query was taken over becomes unassigned
        owned = jnp.where(match >= 0, match, 0)
        still_owner = (match >= 0) & (owner_q[owned] == t_ids)
        match = jnp.where(still_owner, match, -1)
        return price, owner_q, match, it + 1

    init = (price, jnp.full((Q,), T, jnp.int32),
            jnp.full((T,), -1, jnp.int32), jnp.asarray(0, jnp.int32))
    price, owner_q, match, _ = jax.lax.while_loop(cond, body, init)
    return price, owner_q, match


@functools.partial(jax.jit, static_argnames=("max_iters",))
def auction_lsap(cost, valid=None, max_iters: int = 200000):
    """Solve min-cost assignment of columns (targets) to rows (queries).

    cost: (Q, T); valid: (T,) bool mask of real targets.
    Returns match (T,) int32: the assigned row for each valid column
    (0 for invalid columns).

    Single cold-started phase with ε = spread·1e-4.  (ε-scaling with warm
    prices is deliberately NOT used: in the asymmetric Q > T case stale high
    prices on unassigned rows break the optimality bound — the classic
    asymmetric-auction pitfall.  Cold fine-ε converges in a few hundred
    rounds of cheap (T, Q) VPU work for this workload's shapes.)
    """
    Q, T = cost.shape
    if valid is None:
        valid = jnp.ones((T,), bool)
    benefit = jnp.where(valid[:, None], -cost.T, _NEG / 2)
    spread = jnp.maximum(jnp.max(jnp.where(valid[:, None], jnp.abs(cost.T),
                                           0.0)), 1e-6)
    eps = spread * 1e-4
    _price, _owner, match = _auction_phase(benefit, valid, jnp.zeros((Q,)),
                                           eps, max_iters)
    # Safety net: if max_iters exhausted with valid targets unassigned, a -1
    # would wrap to the last query downstream (criterion.py level_losses) — a
    # silent mis-match.  Complete greedily instead: each leftover target takes
    # its best-value unowned query (sequential over T, trivial VPU work;
    # normally a no-op since the auction converges).
    unmatched = (match < 0) & valid
    owned_q = jnp.zeros((Q,), bool).at[jnp.where(match >= 0, match, Q - 1)
                                       ].max(match >= 0)

    def complete(owned, t):
        need = unmatched[t]
        vals = jnp.where(owned, _NEG, benefit[t])
        q = jnp.argmax(vals).astype(jnp.int32)
        owned = owned.at[q].set(owned[q] | need)
        return owned, jnp.where(need, q, match[t])

    _owned, match = jax.lax.scan(complete, owned_q, jnp.arange(T))
    return jnp.where(valid, match, 0).astype(jnp.int32)


def auction_lsap_batched(costs, valid):
    """vmapped solve: costs (..., Q, T), valid (..., T) -> (..., T)."""
    flat_c = costs.reshape((-1,) + costs.shape[-2:])
    flat_v = valid.reshape((-1,) + valid.shape[-1:])
    out = jax.vmap(auction_lsap)(flat_c, flat_v)
    return out.reshape(valid.shape)
