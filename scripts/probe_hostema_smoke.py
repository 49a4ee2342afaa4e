import time, sys
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from micro_diffusion_tpu.train import HostEMA
from micro_diffusion_tpu.train.optim import ema_update

def log(m): print(f"[{time.time()-T0:6.0f}s] {m}", file=sys.stderr, flush=True)
T0 = time.time()
rng = np.random.default_rng(1)
params = {
    "a": jnp.asarray(rng.standard_normal((4096, 4096), ), jnp.float32),
    "b": jnp.asarray(rng.standard_normal((3, 4097, 513)), jnp.float32),
    "c": jnp.asarray(rng.standard_normal(1_000_001), jnp.float32),
}
log("params made")
ema = HostEMA(params, smoothing=0.9975, chunk_bytes=16 * 1024 * 1024)
log(f"constructed: {len(ema.chunks)} chunks, kinds "
    f"{ {c.sharding.memory_kind for c in ema.chunks} }")
for i in range(3):
    ema.update(params)
ema.block()
log("3 updates done")
t0 = time.time()
for i in range(3):
    ema.update(params)
ema.block()
log(f"3 warm updates: {(time.time()-t0)/3*1e3:.0f} ms each")
got = ema.materialize()
log("materialized")
ref_fn = jax.jit(lambda e, p: ema_update(e, p, jnp.asarray(1), smoothing=0.9975, ema_start=0))
ref = jax.jit(lambda p: jax.tree.map(lambda l: l.astype(jnp.bfloat16), p))(params)
for i in range(6):
    ref = ref_fn(ref, params)
log("ref chain done")
ok = True
for k in params:
    g = np.asarray(got[k], np.float32); r = np.asarray(ref[k], np.float32)
    exact = np.array_equal(g, r)
    log(f"{k} exact: {exact} max_err: {np.abs(g-r).max()}")
    ok = ok and exact
log("PASS" if ok else "FAIL")
