"""Tensor parallelism for the transformer families — Megatron-style sharding
expressed purely as parameter PartitionSpecs.

The reference is single-GPU (/root/reference/train.py:304); its only
distributed artifact is dormant NCCL plumbing (CLTR/misc.py:442-464).  On TPU
the idiomatic way to split a transformer that outgrows one chip is NOT
hand-written all_reduce calls but sharding annotations on the weights: GSPMD
propagates them through the matmuls and inserts the collectives over ICI.

The classic Megatron pattern, recovered automatically from the specs below:

  column-parallel  attention q/k/v and MLP fc1 shard their OUTPUT features
                   over the ``model`` mesh axis.  Per-head attention compute
                   stays shard-local because hidden = heads x d_head and the
                   (B, N, hidden) -> (B, N, heads, d_head) reshape keeps the
                   sharded axis aligned with heads (requires
                   num_heads % tp == 0).
  row-parallel     attention out and MLP fc2 shard their INPUT features; the
                   matmul produces partial sums that GSPMD all-reduces once —
                   two collectives per transformer block, riding ICI.

Biases follow their kernels: column-parallel biases are feature-sharded,
row-parallel biases are replicated (added once, after the implicit reduce).

TPU caveat: the fused Pallas attention kernels (kernels/attention.py) are not
GSPMD-partitionable custom calls; under a tp>1 mesh the einsum attention path
partitions cleanly over the head axis while a Pallas call would force an
all-gather.  The families this repo rebuilds fit one v5e chip with room to
spare (ViT-B hidden 768), so tp is a scale-out capability — validated on the
virtual 8-device mesh (tests/test_parallel.py, __graft_entry__.dryrun) where
the einsum path runs — not the single-chip bench default.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ViT encoder Dense module names (models/transunet/vit.py::Attention/Mlp) and
# CLTR transformer projection names (models/cltr/transformer.py) by role.
_COLUMN = ("query", "key", "value", "fc1",      # ViT
           "q_proj", "k_proj", "v_proj", "linear1")  # CLTR
_ROW = ("out", "fc2",                            # ViT
        "out_proj", "linear2")                   # CLTR


def _path_names(path):
    return [p.key for p in path if hasattr(p, "key")]


def tp_param_specs(params):
    """PartitionSpec tree for a transformer param tree (ViT or CLTR naming).

    Only the encoder/decoder block projections listed above are sharded; every
    other leaf (norms, embeddings, conv stems, decoder convs, heads) is
    replicated.  The result has exactly the structure of ``params``.
    """

    def spec(path, leaf):
        names = _path_names(path)
        if len(names) >= 2:
            mod, leaf_name = names[-2], names[-1]
            if mod in _COLUMN:
                if leaf_name == "kernel":
                    return P(None, "model")
                if leaf_name == "bias":
                    return P("model")
            if mod in _ROW and leaf_name == "kernel":
                return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_state_tp(mesh: Mesh, state, tx):
    """Place a TrainState with tensor-parallel param/opt shardings.

    Params take :func:`tp_param_specs`; the optimizer state's param-shaped
    leaves (momentum, Adam mu/nu) take the SAME specs so the update never
    reshards; batch_stats/step replicate.  ``tx`` must be the optax transform
    that built ``state.opt_state``.
    """
    import optax

    specs = tp_param_specs(state.params)
    as_sharding = lambda s: NamedSharding(mesh, s)
    param_sh = jax.tree_util.tree_map(as_sharding, specs)
    replicated = NamedSharding(mesh, P())
    opt_sh = optax.tree_map_params(
        tx, lambda _, s: as_sharding(s), state.opt_state, specs,
        transform_non_params=lambda _: replicated)
    return state.replace(
        params=jax.device_put(state.params, param_sh),
        batch_stats=jax.device_put(state.batch_stats, replicated),
        opt_state=jax.device_put(state.opt_state, opt_sh),
        step=jax.device_put(state.step, replicated),
    )
