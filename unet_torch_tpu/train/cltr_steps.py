"""CLTR jit'd step functions — two-phase around the host Hungarian matcher.

The reference computes the assignment with scipy on CPU mid-step
(CLTR/matcher.py:77-80), forcing a device->host sync every iteration.  The TPU
build makes that boundary explicit: phase 1 produces all per-level cost
matrices in one fused program, scipy solves the (tiny) LSAPs on host, phase 2
recomputes the forward under grad with the static-shaped match indices and
applies the update.  Both phases share the same dropout rng so the matching
corresponds to the differentiated forward.
"""

from __future__ import annotations

import functools

import jax
import optax


def make_cltr_steps(model, criterion, tx):
    def forward(params, batch_stats, x, train, rng):
        return model.apply({"params": params, "batch_stats": batch_stats}, x,
                           train=train,
                           rngs={"dropout": rng} if train else None)

    @jax.jit
    def cost_step(state, x, tgt_labels, tgt_points, tgt_valid, rng):
        out = forward(state.params, state.batch_stats, x, True, rng)
        return criterion.all_cost_matrices(out, tgt_labels, tgt_points,
                                           tgt_valid)

    @functools.partial(jax.jit, donate_argnums=0)
    def update_step(state, x, tgt_labels, tgt_points, tgt_valid, match_src,
                    lr, rng):
        def objective(params):
            out = forward(params, state.batch_stats, x, True, rng)
            total, loss_dict = criterion.losses(out, tgt_labels, tgt_points,
                                                tgt_valid, match_src)
            return total, loss_dict

        (loss, loss_dict), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        state.opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, opt_state=opt_state,
                              step=state.step + 1), loss, loss_dict)

    @jax.jit
    def infer_step(state, x):
        out = forward(state.params, state.batch_stats, x, False, None)
        return out["pred_logits"], out["pred_points"]

    return cost_step, update_step, infer_step


def make_cltr_fused_step(model, criterion, tx, mesh=None):
    """Single-jit CLTR train step: the Hungarian assignment runs *on device*
    via the auction LSAP solver (kernels/auction.py), so forward, matching,
    loss, backward and update fuse into one XLA program — no host round-trip
    and no duplicated forward (the two-phase path recomputes it).

    The reference stalls on scipy every step (CLTR/matcher.py:77-80); this is
    the TPU-native replacement.

    ``mesh``: pass the mesh when the state is tensor-parallel
    (parallel/tensor.py) over a ``model`` axis.  The matching is tiny
    batch-wise work; constraining the cost matrices to dp-sharded /
    model-replicated keeps the auction while-loop collective-free — without
    the constraint GSPMD may leave costs sharded over ``model`` and insert
    an all-reduce into every bidding round (measured: deadlocks the 8-virtual
    -device CPU dryrun at the 40 s collective-rendezvous timeout).
    """
    import optax as _optax

    from unet_torch_tpu.kernels.auction import auction_lsap_batched

    match_sharding = None
    if mesh is not None and "model" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P

        match_sharding = NamedSharding(mesh, P(None, "data"))

    def forward(params, batch_stats, x, rng):
        return model.apply({"params": params, "batch_stats": batch_stats}, x,
                           train=True, rngs={"dropout": rng})

    @functools.partial(jax.jit, donate_argnums=0)
    def fused_step(state, x, tgt_labels, tgt_points, tgt_valid, lr, rng):
        def objective(params):
            out = forward(params, state.batch_stats, x, rng)
            costs = jax.lax.stop_gradient(
                criterion.all_cost_matrices(out, tgt_labels, tgt_points,
                                            tgt_valid))  # (L, B, Q, T)
            L = costs.shape[0]
            valid_lbt = jax.numpy.broadcast_to(tgt_valid[None],
                                               (L,) + tgt_valid.shape)
            if match_sharding is not None:
                costs = jax.lax.with_sharding_constraint(costs, match_sharding)
                valid_lbt = jax.lax.with_sharding_constraint(valid_lbt,
                                                             match_sharding)
            match_src = auction_lsap_batched(costs, valid_lbt)
            if match_sharding is not None:
                match_src = jax.lax.with_sharding_constraint(match_src,
                                                             match_sharding)
            total, loss_dict = criterion.losses(out, tgt_labels, tgt_points,
                                                tgt_valid, match_src)
            return total, loss_dict

        (loss, loss_dict), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        state.opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = _optax.apply_updates(state.params, updates)
        return (state.replace(params=params, opt_state=opt_state,
                              step=state.step + 1), loss, loss_dict)

    return fused_step


def make_cltr_eval_loss(model, criterion):
    """Jit'd val-loss: dropout-free forward + on-device matching + the same
    weighted criterion as training.  Returns (loss, pred_logits) — used by
    benchmarks/parity_cltr.py for trained-outcome comparison against the
    reference torch criterion run in eval mode."""
    from unet_torch_tpu.kernels.auction import auction_lsap_batched

    @jax.jit
    def eval_loss(state, x, tgt_labels, tgt_points, tgt_valid):
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats}, x, train=False)
        costs = criterion.all_cost_matrices(out, tgt_labels, tgt_points,
                                            tgt_valid)
        L = costs.shape[0]
        valid_lbt = jax.numpy.broadcast_to(tgt_valid[None],
                                           (L,) + tgt_valid.shape)
        match_src = auction_lsap_batched(costs, valid_lbt)
        total, _ = criterion.losses(out, tgt_labels, tgt_points, tgt_valid,
                                    match_src)
        return total, out["pred_logits"]

    return eval_loss
