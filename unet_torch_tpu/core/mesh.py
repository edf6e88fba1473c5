"""Device meshes and sharding helpers.

The reference runs one process on one GPU (`/root/reference/train.py:304`); its only
distributed artifact is dormant NCCL plumbing (`/root/reference/CLTR/misc.py:442-464`).
The TPU build replaces all of that with a `jax.sharding.Mesh`: batch axes are sharded
over the ``data`` mesh axis and XLA inserts the collectives (psum for gradients) over
ICI.  No process-group bootstrapping code exists — `jax.distributed.initialize()` is
the caller's one-liner for multi-host.

Mesh axes:
  data   data parallelism (batch sharding; gradient psum inserted by XLA)
  model  reserved for tensor/spatial partitioning of very large activations
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over available devices.

    ``n_data=None`` uses all devices on the data axis (divided by ``n_model``).
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched arrays: leading axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded over ``data``.

    This is the single host->device boundary of the train loop (the reference crosses
    it per-tensor via ``.to(device)`` at `/root/reference/Trainer.py:700-702`).
    Leaves whose leading axis is not divisible by the data-axis size (e.g. the
    reference's batch-1 validation loader, train.py:333) are replicated instead.
    """
    n_data = mesh.shape["data"]
    sharded = data_sharding(mesh)
    replicated = replicated_sharding(mesh)
    multiprocess = jax.process_count() > 1

    def put(x):
        if multiprocess:
            # x is this process's LOCAL shard (NumpyLoader num_shards);
            # assemble the global array from per-host slices — no cross-host
            # data movement, XLA sees one global batch.  Divisibility is
            # against the PER-PROCESS slice of the data axis (the local
            # shard only feeds this host's devices).
            import numpy as np_

            x = np_.asarray(x)
            local_n = max(1, n_data // jax.process_count())
            if hasattr(x, "shape") and x.ndim > 0 and \
                    x.shape[0] % local_n == 0:
                return jax.make_array_from_process_local_data(sharded, x)
            return jax.make_array_from_process_local_data(replicated, x)
        divisible = hasattr(x, "shape") and x.ndim > 0 and \
            x.shape[0] % n_data == 0
        return jax.device_put(x, sharded if divisible else replicated)

    return jax.tree_util.tree_map(put, batch)


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2):
    """Wrap a host batch iterator with an async device-transfer queue.

    jax.device_put is asynchronous: enqueueing the next batch's transfer while
    the current step computes hides the H2D copy entirely (the reference
    transfers synchronously inside the step, Trainer.py:700-702).
    """
    import collections

    queue = collections.deque()
    for batch in iterator:
        queue.append(shard_batch(mesh, batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
