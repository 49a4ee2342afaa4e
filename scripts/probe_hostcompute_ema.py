"""Probe: EMA decay executed ON THE TPU HOST CPU via compute_on('device_host').

Round-4 stage-4 ledger (PERF.md round 4 §2): every measured EMA placement at
K=32 true recipe cadence pays a round-trip of the EMA bytes on the device
stream — HostEMA's decay graphs run ON the device (H2D the EMA chunk, decay,
D2H back = measured ~2.6s/cycle), and AsyncHostEMA's client-RAM fetch crosses
the network tunnel at 0.03 GB/s. The untried placement is XLA host-offloaded
COMPUTE: the EMA lives as fp32 in pinned host RAM and the decay
e' = s*e + (1-s)*p runs on the TPU host's CPU (`compute_on('device_host')`),
so the only device-link traffic per recipe update is the ONE-WAY bf16 params
D2H (~2.33GB for XL: ~0.8s at the measured 2.9 GB/s), with no H2D return leg
and no params-sized HBM residency between updates.

Known relay constraints this design respects (train_step.HostEMA docstring):
  * graphs touching pinned_host: plain array args/results only (no pytrees);
  * sub-32-bit pinned_host buffers permute across executables -> the host EMA
    is fp32 (ALSO better numerics than the in-state bf16 tree).

Probes:
  1. correctness: 5-step decay chain via host-compute vs the pure-device
     fp32 chain, small buffer;
  2. per-update cost at XL scale (1.165B elems, 12 chunks);
  3. overlap: decay dispatches followed immediately by a stream of device
     matmuls — does the host decay hide behind device compute?
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.compute_on import compute_on


def log(msg):
    print(msg, file=sys.stderr, flush=True)


SMOOTH = 0.9975  # stage-4 recipe smoothing (res_512_finetune ema block)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    s_dev = jax.sharding.SingleDeviceSharding(dev)
    s_host = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")

    s = SMOOTH

    def decay_fn(e, p):
        with compute_on("device_host"):
            out = s * e + (1.0 - s) * p.astype(jnp.float32)
        return out

    decay = jax.jit(decay_fn, in_shardings=(s_host, s_dev),
                    out_shardings=s_host, donate_argnums=(0,))

    # mover for verification / barriers: host fp32 -> device, then slice
    to_dev = jax.jit(lambda e: e, in_shardings=(s_host,), out_shardings=s_dev)
    probe = jax.jit(lambda e: e[0])

    # ---- probe 1: correctness (1M elems, 5 chained decays) ----
    n = 1 << 20
    key = jax.random.PRNGKey(0)
    p_dev = [jax.jit(lambda k: jax.random.normal(k, (n,), jnp.bfloat16))(
        jax.random.PRNGKey(i)) for i in range(5)]
    e0 = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.float32))(key)

    try:
        e_host = jax.jit(lambda x: x, in_shardings=(s_dev,),
                         out_shardings=s_host)(e0)
        for p in p_dev:
            e_host = decay(e_host, p)
        got = np.asarray(to_dev(e_host))
    except Exception as exc:  # noqa: BLE001
        log(f"FAIL: host-compute decay did not compile/run: {exc!r}")
        return 1

    ref_fn = jax.jit(lambda e, p: s * e + (1.0 - s) * p.astype(jnp.float32))
    e_ref = e0
    for p in p_dev:
        e_ref = ref_fn(e_ref, p)
    want = np.asarray(e_ref)
    # Host CPU fp32 FMA contraction differs from the TPU's fp32 rounding, so
    # the chains are NOT bit-identical - a few ulp per decay is expected (the
    # alternative in-state placement stores the EMA in bf16, ~1e-2 steps).
    err = float(np.max(np.abs(got - want)))
    scale = float(np.max(np.abs(want)))
    log(f"probe 1 correctness: max|host_chain - device_chain| = {err:.3e} "
        f"(rel {err / scale:.2e})")
    if err / scale > 1e-5:
        log("FAIL: numerics mismatch beyond fp32 rounding")
        return 1

    # ---- probe 2: per-update cost at XL scale ----
    total = 1_165_442_320  # XL param count
    n_chunks = 12
    per = (total + n_chunks - 1) // n_chunks
    log(f"XL scale: {total} elems = {total*4/2**30:.2f} GiB fp32 host EMA, "
        f"{n_chunks} chunks x {per*4/2**20:.0f} MiB")

    mk_p = jax.jit(lambda k: jax.random.normal(k, (per,), jnp.bfloat16))
    mk_e = jax.jit(lambda k: jax.random.normal(k, (per,), jnp.float32),
                   out_shardings=s_host)
    chunks_p = [mk_p(jax.random.PRNGKey(100 + i)) for i in range(n_chunks)]
    chunks_e = [mk_e(jax.random.PRNGKey(200 + i)) for i in range(n_chunks)]
    # settle + warm the decay executable at this shape
    chunks_e = [decay(e, p) for e, p in zip(chunks_e, chunks_p)]
    float(probe(to_dev(chunks_e[-1])))

    drained_dt = 0.0
    for trial in range(3):
        t0 = time.time()
        chunks_e = [decay(e, p) for e, p in zip(chunks_e, chunks_p)]
        float(probe(to_dev(chunks_e[-1])))  # barrier (value fetch)
        drained_dt = time.time() - t0
        log(f"probe 2 trial {trial}: full-XL host-compute EMA update = "
            f"{drained_dt:.2f} s ({total*2/2**30/drained_dt:.2f} GB/s "
            "effective one-way)")

    # ---- probe 3: overlap with device compute ----
    m = 4096
    w = jax.jit(lambda k: jax.random.normal(k, (m, m), jnp.bfloat16))(
        jax.random.PRNGKey(7))

    steps = 600

    @jax.jit
    def burn(x):
        def body(c, _):
            return jnp.tanh(c @ w), None
        out, _ = jax.lax.scan(body, x, None, length=steps)
        return out

    x0 = jax.jit(lambda k: jax.random.normal(k, (m, m), jnp.bfloat16))(
        jax.random.PRNGKey(8))
    r = burn(x0)
    float(r[0, 0].astype(jnp.float32))
    t0 = time.time()
    r = burn(x0)
    float(r[0, 0].astype(jnp.float32))
    t_burn = time.time() - t0
    log(f"probe 3: device burn alone = {t_burn:.2f} s ({steps} matmul steps)")

    t0 = time.time()
    chunks_e = [decay(e, p) for e, p in zip(chunks_e, chunks_p)]
    r = burn(x0)  # dispatched right behind the decays
    float(r[0, 0].astype(jnp.float32))
    float(probe(to_dev(chunks_e[-1])))
    t_both = time.time() - t0
    log(f"probe 3: decay dispatches + device burn = {t_both:.2f} s "
        f"(serial would be ~{t_burn + drained_dt:.2f} s; overlap hides "
        f"{max(0.0, t_burn + drained_dt - t_both):.2f} s)")
    log(f"SUMMARY: per-cycle EMA cost ~{drained_dt:.2f}s drained, "
        f"~{max(0.0, t_both - t_burn):.2f}s effective next to compute")
    return 0


if __name__ == "__main__":
    sys.exit(main())
