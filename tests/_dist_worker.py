"""Worker for tests/test_distributed.py — one process of a 2-process CPU
jax.distributed job.  Exercises the real multi-process code paths:
jax.distributed.initialize, core.dist process guards, NumpyLoader epoch
sharding, and shard_batch's make_array_from_process_local_data branch
(core/mesh.py).  Reference dormant equivalent: CLTR/misc.py:442-464."""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)

    import numpy as np

    from unet_torch_tpu.core import dist
    from unet_torch_tpu.core.mesh import make_mesh, shard_batch
    from unet_torch_tpu.data.loader import NumpyLoader

    assert dist.process_count() == nproc
    assert dist.process_index() == pid
    assert len(jax.devices()) == 2 * nproc
    assert len(jax.local_devices()) == 2

    # loader sharding: same permutation everywhere, strided shards -> the
    # union over processes is exactly one epoch with no overlap
    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return np.full((2, 2), i, np.float32), np.int64(i)

    loader = NumpyLoader(DS(), batch_size=2, shuffle=True, seed=7,
                         shard_index=pid, num_shards=nproc)
    seen = []
    first = None
    for xb, ib in loader:
        seen += [int(v) for v in ib]
        if first is None:
            first = xb
    with open(os.path.join(outdir, f"seen{pid}.json"), "w") as f:
        json.dump(sorted(seen), f)

    # shard_batch multiprocess branch: local (2,2,2) -> global (4,2,2)
    mesh = make_mesh()
    g = shard_batch(mesh, first)
    assert g.shape[0] == first.shape[0] * nproc, g.shape
    total = float(jax.jit(lambda a: a.sum())(g))

    # is_main artifact guard: exactly one process writes
    if dist.is_main():
        with open(os.path.join(outdir, "main_artifact.txt"), "a") as f:
            f.write(f"proc{pid}\n")

    with open(os.path.join(outdir, f"out{pid}.json"), "w") as f:
        json.dump({"pid": pid, "global_batch_sum": total,
                   "global_shape": list(g.shape)}, f)


if __name__ == "__main__":
    main()
