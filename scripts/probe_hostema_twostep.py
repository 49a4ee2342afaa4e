"""Can the XL EMA round-trip beat the fused decay's 2.07s?

probe_hostema_xl measured 2.07s per XL update through the single fused
decay executable per chunk (H2D read + compute + D2H write in one program) -
2.1 GiB/s aggregate vs the 0.94s the separately-measured link rates imply
(H2D 11.6 / D2H 2.9 GB/s, probe_hostmem). Hypothesis: the fused program
serializes its input DMA, compute, and output DMA without overlap, and/or
streams below link rate. Variants at XL scale (1.165B bf16 elems, packed
u32 chunks):

  A fused     : the HostEMA._decay pattern (control)
  B two-step  : to_dev mover -> device decay -> to_store mover (3 executables
                per chunk; movers may hit full link rate)
  C rates     : raw H2D / D2H mover rates at this chunk size
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    s_host = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")
    s_dev = jax.sharding.SingleDeviceSharding(dev)
    s = 0.99975

    n = 512 * 1024 * 1024  # bf16 elems per chunk (1GiB packed u32 -> 512Mi)
    n_chunks = 2  # ~2.33GB total = XL EMA size (plus a bit)

    def pack(c):
        u = jax.lax.bitcast_convert_type(c, jnp.uint16).astype(jnp.uint32)
        m = u.shape[0] // 2
        return u[:m] | (u[m:] << 16)

    def unpack(u):
        lo = (u & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        hi = (u >> 16).astype(jnp.uint16)
        return jax.lax.bitcast_convert_type(
            jnp.concatenate([lo, hi]), jnp.bfloat16)

    mk = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.bfloat16))
    p_chunks = [mk(jax.random.PRNGKey(i)) for i in range(n_chunks)]

    to_store = jax.jit(pack, in_shardings=(s_dev,), out_shardings=s_host)
    to_dev = jax.jit(unpack, in_shardings=(s_host,), out_shardings=s_dev)
    fused = jax.jit(
        lambda e, q: pack((s * unpack(e).astype(jnp.float32)
                           + (1 - s) * q.astype(jnp.float32)
                           ).astype(jnp.bfloat16)),
        in_shardings=(s_host, s_dev), out_shardings=s_host,
        donate_argnums=(0,))
    dev_decay = jax.jit(
        lambda e, q: (s * e.astype(jnp.float32)
                      + (1 - s) * q.astype(jnp.float32)).astype(jnp.bfloat16),
        donate_argnums=(0,))
    probe = jax.jit(lambda c: c.astype(jnp.float32)[0])

    # barrier: whole-chunk mover + device probe (host-operand jits with
    # constants/indexing trip the AOT helper: "Could not find a corresponding
    # buffer for value ... constant"). Adds a constant ~90ms H2D to every
    # variant's window - identical bias, comparisons unaffected.
    def barrier(chunks):
        float(probe(to_dev(chunks[-1])))

    gib = n * 2 * n_chunks / 2**30

    e_chunks = [to_store(p) for p in p_chunks]
    barrier(e_chunks)

    # A fused (control)
    e_chunks = [fused(e, p) for e, p in zip(e_chunks, p_chunks)]
    barrier(e_chunks)
    t0 = time.time()
    for _ in range(3):
        e_chunks = [fused(e, p) for e, p in zip(e_chunks, p_chunks)]
    barrier(e_chunks)
    dt = (time.time() - t0) / 3
    log(f"A fused    : {dt*1e3:6.0f} ms ({2*gib/dt:.2f} GiB/s agg)")

    # B two-step
    def two_step(e_chunks):
        devs = [to_dev(e) for e in e_chunks]
        news = [dev_decay(d, p) for d, p in zip(devs, p_chunks)]
        return [to_store(x) for x in news]

    e_chunks = two_step(e_chunks)
    barrier(e_chunks)
    t0 = time.time()
    for _ in range(3):
        e_chunks = two_step(e_chunks)
    barrier(e_chunks)
    dt = (time.time() - t0) / 3
    log(f"B two-step : {dt*1e3:6.0f} ms ({2*gib/dt:.2f} GiB/s agg)")

    # C raw mover rates
    t0 = time.time()
    for _ in range(3):
        devs = [to_dev(e) for e in e_chunks]
    float(probe(devs[-1][:8]))
    dt = (time.time() - t0) / 3
    log(f"C H2D mover: {dt*1e3:6.0f} ms ({gib/dt:.2f} GiB/s)")
    t0 = time.time()
    for _ in range(3):
        outs = [to_store(d) for d in devs]
    barrier(outs)
    dt = (time.time() - t0) / 3
    log(f"C D2H mover: {dt*1e3:6.0f} ms ({gib/dt:.2f} GiB/s)")


if __name__ == "__main__":
    main()
