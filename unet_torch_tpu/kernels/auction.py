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
    return _greedy_complete(benefit, valid, match)


def _greedy_complete(benefit, valid, match):
    """Per-instance safety net (see auction_lsap): leftover valid targets take
    their best-value unowned query.  benefit (T, Q); match (T,) with -1 for
    unassigned."""
    T, Q = benefit.shape
    unmatched = (match < 0) & valid
    owned_q = jnp.zeros((Q,), bool).at[jnp.where(match >= 0, match, Q - 1)
                                       ].max(match >= 0)

    def complete(owned, t):
        need = unmatched[t]
        vals = jnp.where(owned, _NEG, benefit[t])
        q = jnp.argmax(vals).astype(jnp.int32)
        owned = owned.at[q].set(owned[q] | need)
        return owned, jnp.where(need, q, match[t])

    _owned, out = jax.lax.scan(complete, owned_q, jnp.arange(T))
    return jnp.where(valid, out, 0).astype(jnp.int32)


def _ceil_to(x, m):
    return -(-x // m) * m


def _auction_pallas(benefit, valid, eps, max_iters, interpret=False):
    """Whole-auction Pallas kernel: one grid cell per instance, the entire
    ε-phase while-loop runs in VMEM.

    Why a kernel: expressed as a vmapped `lax.while_loop`, every bidding
    round materialises the (B, T, Q) value matrix in HBM (~20 ms/92 rounds
    at CLTR b16 shapes) and the single fused loop iterates until the SLOWEST
    instance converges — 96 instances all pay 92 rounds.  In the kernel each
    instance's (T, Q) tile (32x2048 f32 = 256 KB) stays resident in VMEM,
    a round is a handful of VPU passes over it, and each grid cell exits its
    own while-loop at its own convergence.

    benefit (B, Tp, Qp) f32 padded (-1e30 on padded queries / invalid rows),
    valid (B, Tp, 128) f32 (replicated over lanes), eps (B,) f32.
    Returns match (B, Tp) int32 (-1 = unassigned).  Scatter/gather-free:
    every per-target or per-query indexed update is a one-hot compare +
    masked reduction over the resident (Tp, Qp) tile — Mosaic has no
    scatter, and at these shapes the extra passes are VPU-cheap."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tp, Qp = benefit.shape

    def kernel(eps_ref, ben_ref, valid_ref, match_ref):
        i = pl.program_id(0)
        eps = eps_ref[i]
        ben = ben_ref[0]
        vld = valid_ref[0][:, :1] > 0.5  # (Tp, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Qp), 1)
        trow = jax.lax.broadcasted_iota(jnp.int32, (Tp, Qp), 0)

        def cond(state):
            _price, _owner, match, it = state
            return (it < max_iters) & jnp.any((match < 0) & vld)

        def body(state):
            price, owner, match, it = state
            unass = (match < 0) & vld  # (Tp, 1)
            values = ben - price  # (Tp, Qp)
            v1 = jnp.max(values, axis=1, keepdims=True)
            # first argmax (ties -> lowest q, matching the jnp path)
            i1 = jnp.min(jnp.where(values >= v1, col, Qp), axis=1,
                         keepdims=True)
            sel1 = col == i1  # one-hot row selection
            v2 = jnp.max(jnp.where(sel1, _NEG, values), axis=1,
                         keepdims=True)
            p1 = jnp.max(jnp.where(sel1, jnp.broadcast_to(price, (Tp, Qp)),
                                   _NEG), axis=1, keepdims=True)  # price[i1]
            bid = jnp.where(unass, p1 + (v1 - v2) + eps, _NEG)  # (Tp, 1)
            bid_mat = jnp.where(sel1 & unass,
                                jnp.broadcast_to(bid, (Tp, Qp)), _NEG)
            best_bid = jnp.max(bid_mat, axis=0, keepdims=True)  # (1, Qp)
            # highest bid per query wins; ties -> lowest target index
            contender = (bid_mat > _NEG) & (bid_mat >= best_bid)
            winner = jnp.min(jnp.where(contender, trow, Tp), axis=0,
                             keepdims=True)  # (1, Qp)
            has_winner = winner < Tp
            price = jnp.where(has_winner, jnp.maximum(best_bid, price),
                              price)
            owner = jnp.where(has_winner, winner, owner)
            won = jnp.max(jnp.where(
                sel1 & (jnp.broadcast_to(winner, (Tp, Qp)) == trow),
                1, 0), axis=1, keepdims=True) > 0  # (Tp, 1)
            match = jnp.where(won & unass, i1, match)
            # a target whose query was taken over becomes unassigned
            owned_sel = col == match  # empty row when match == -1
            still = jnp.max(jnp.where(
                owned_sel & (jnp.broadcast_to(owner, (Tp, Qp)) == trow),
                1, 0), axis=1, keepdims=True) > 0
            match = jnp.where((match >= 0) & ~still, -1, match)
            return price, owner, match, it + 1

        init = (jnp.zeros((1, Qp), jnp.float32),
                jnp.full((1, Qp), Tp, jnp.int32),
                jnp.full((Tp, 1), -1, jnp.int32),
                jnp.asarray(0, jnp.int32))
        _price, _owner, match, _it = jax.lax.while_loop(cond, body, init)
        match_ref[0] = jnp.broadcast_to(match, (Tp, 128))

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Tp, Qp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tp, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, 128), jnp.int32),
        interpret=interpret,
    )(eps.astype(jnp.float32), benefit, valid, )
    return out[:, :, 0]


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def auction_lsap_pallas(costs, valid, max_iters: int = 20000,
                        interpret: bool = False):
    """Batched on-device LSAP, whole auction in one Pallas kernel.

    costs (B, Q, T) f32; valid (B, T) bool -> match (B, T) int32.
    Same contract as vmap(auction_lsap) including the greedy completion
    safety net and ties-to-lowest-index resolution."""
    B, Q, T = costs.shape
    Tp, Qp = _ceil_to(max(T, 8), 8), _ceil_to(max(Q, 128), 128)
    benefit = jnp.where(valid[:, :, None], -jnp.swapaxes(costs, 1, 2),
                        _NEG / 2)
    spread = jnp.maximum(jnp.max(jnp.where(valid[:, :, None],
                                           jnp.abs(jnp.swapaxes(costs, 1, 2)),
                                           0.0), axis=(1, 2)), 1e-6)
    eps = spread * 1e-4
    ben_p = jnp.full((B, Tp, Qp), _NEG, benefit.dtype
                     ).at[:, :T, :Q].set(benefit)
    vld_p = jnp.zeros((B, Tp), jnp.float32).at[:, :T].set(
        valid.astype(jnp.float32))
    vld_p = jnp.broadcast_to(vld_p[:, :, None], (B, Tp, 128))
    match = _auction_pallas(ben_p.astype(jnp.float32), vld_p, eps,
                            max_iters, interpret=interpret)[:, :T]
    return jax.vmap(_greedy_complete)(benefit, valid, match)


def auction_lsap_batched(costs, valid, use_pallas=None, interpret=False):
    """Batched solve: costs (..., Q, T), valid (..., T) -> (..., T).

    Routes through the whole-auction Pallas kernel on TPU when the padded
    (T, Q) tile fits VMEM comfortably; vmapped lax.while_loop otherwise."""
    flat_c = costs.reshape((-1,) + costs.shape[-2:])
    flat_v = valid.reshape((-1,) + valid.shape[-1:])
    Q, T = flat_c.shape[-2:]
    if use_pallas is None:
        use_pallas = (jax.default_backend() not in ("cpu", "gpu")
                      and _ceil_to(max(T, 8), 8) * _ceil_to(max(Q, 128), 128)
                      * 4 <= 4 * 1024 * 1024)
    if use_pallas or interpret:
        out = auction_lsap_pallas(flat_c, flat_v, interpret=interpret)
    else:
        out = jax.vmap(auction_lsap)(flat_c, flat_v)
    return out.reshape(valid.shape)
