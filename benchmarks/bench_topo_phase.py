"""Steady-state rate + phase breakdown of the pipelined topo step (real chip).

Run: python benchmarks/bench_topo_phase.py  (takes ~3-5 min of remote compile
first).  The r4 ladder this script measured is recorded in BASELINE.md."""
import time, numpy as np, jax, jax.numpy as jnp
from unet_torch_tpu.models.unet import UNet
from unet_torch_tpu.train.optim import make_optimizer
from unet_torch_tpu.train.state import TrainState
from unet_torch_tpu.train.steps import make_topo_steps

print("backend:", jax.default_backend(), jax.devices(), flush=True)
B, S = 8, 512
model = UNet(3, 1, 64, fold=True, dtype=jnp.bfloat16)
tx = make_optimizer("Adam", 1e-3, 0.0)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, S, S, 3), jnp.float32)
y = jnp.asarray((rng.rand(B, S, S) > 0.7), jnp.float32)
dots = jnp.asarray(rng.rand(B, S, S) > 0.999, jnp.float32)
variables = model.init(jax.random.key(0), x[:1], train=False)
state = TrainState.create(variables["params"], variables.get("batch_stats", {}), tx)
(_w, _we), (topo_step, _te), TopoPipeline = make_topo_steps(model, tx, "TopoLoss", 1)
pipe = TopoPipeline()
key = jax.random.key(1)

t0 = time.perf_counter()
for i in range(3):
    state, loss = pipe.step(state, x, y, dots, 1e-3, key)
    if loss is not None:
        float(loss)
print(f"warmup (incl compile): {time.perf_counter()-t0:.1f} s", flush=True)

times = []
for i in range(12):
    t0 = time.perf_counter()
    state, loss = pipe.step(state, x, y, dots, 1e-3, key)
    times.append(time.perf_counter() - t0)
state, drained = pipe.flush(state)
print("final loss:", float(drained[-1]), flush=True)
print("steady step ms:", [f"{t*1e3:.0f}" for t in times], flush=True)
agg = sum(times[2:]) / len(times[2:])
print(f"img/s (aggregate): {B/agg:.2f} | median: {B/np.median(times[2:]):.2f}",
      flush=True)
