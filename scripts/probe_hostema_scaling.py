"""Measure where HostEMA update time goes and how it scales with chunk size.

probe_hostema_smoke measured 1535 ms per warm update for a 24M-elem tree
(48MB packed) - ~30x the link-rate estimate. Hypotheses: (a) fixed
per-dispatch latency for host-memory executables through the axon relay,
(b) the flatten graph, (c) D2H/H2D slower than probe_hostmem's 11.6/2.9 GB/s
at these sizes. Times flatten / decay / movers separately across sizes.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench(fn, *args, n=4):
    out = fn(*args)
    jax.block_until_ready(out)
    # value fetch barrier on one element via a tiny jitted slice
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n, out


_probe = None


def _sync(x):
    global _probe
    if isinstance(x, (list, tuple)):
        x = x[-1]
    if getattr(x.sharding, "memory_kind", "device") == "pinned_host":
        s_dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        mover = jax.jit(lambda c: c.astype(jnp.float32)[:1],
                        in_shardings=(x.sharding,), out_shardings=s_dev)
        float(mover(x)[0])
    else:
        float(jnp.asarray(x.reshape(-1)[0], jnp.float32))


def main():
    dev = jax.devices()[0]
    s_host = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")
    s_dev = jax.sharding.SingleDeviceSharding(dev)
    s = 0.9975

    def pack(c):
        u16 = jax.lax.bitcast_convert_type(c.reshape(-1, 2), jnp.uint16)
        return jax.lax.bitcast_convert_type(u16, jnp.uint32)

    def unpack(u):
        u16 = jax.lax.bitcast_convert_type(u, jnp.uint16)
        return jax.lax.bitcast_convert_type(u16, jnp.bfloat16).reshape(-1)

    for mb_elems in (8, 64, 256):  # 2-byte elems, in Mi
        n = mb_elems << 20
        p = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                        jnp.float32)
        p_bf = jax.jit(lambda x: x.astype(jnp.bfloat16))(p)
        to_store = jax.jit(pack, in_shardings=(s_dev,), out_shardings=s_host)
        decay = jax.jit(
            lambda e, q: pack((s * unpack(e).astype(jnp.float32)
                               + (1 - s) * q.astype(jnp.float32)
                               ).astype(jnp.bfloat16)),
            in_shardings=(s_host, s_dev), out_shardings=s_host)
        to_dev = jax.jit(unpack, in_shardings=(s_host,), out_shardings=s_dev)
        dev_decay = jax.jit(
            lambda e, q: (s * e.astype(jnp.float32)
                          + (1 - s) * q.astype(jnp.float32)
                          ).astype(jnp.bfloat16))

        e_host = to_store(p_bf)
        dt_store, e_host = bench(to_store, p_bf)
        dt_decay, _ = bench(decay, e_host, p_bf)
        dt_to_dev, _ = bench(to_dev, e_host)
        dt_dev, _ = bench(dev_decay, p_bf, p_bf)
        mb = n * 2 / (1 << 20)
        log(f"{mb:.0f}MB: to_store(D2H) {dt_store*1e3:7.1f} ms "
            f"({mb/1024/dt_store:5.2f} GB/s) | decay(H2D+D2H) "
            f"{dt_decay*1e3:7.1f} ms ({2*mb/1024/dt_decay:5.2f} GB/s agg) | "
            f"to_dev(H2D) {dt_to_dev*1e3:7.1f} ms ({mb/1024/dt_to_dev:5.2f} "
            f"GB/s) | device-only decay {dt_dev*1e3:6.1f} ms")

    # fixed-latency estimate: tiny host-memory dispatch
    tiny = jnp.ones(1024, jnp.bfloat16)
    to_store_t = jax.jit(pack, in_shardings=(s_dev,), out_shardings=s_host)
    e_t = to_store_t(tiny)
    decay_t = jax.jit(
        lambda e, q: pack((s * unpack(e).astype(jnp.float32)
                           + (1 - s) * q.astype(jnp.float32)
                           ).astype(jnp.bfloat16)),
        in_shardings=(s_host, s_dev), out_shardings=s_host)
    dt, _ = bench(decay_t, e_t, tiny, n=8)
    log(f"tiny (2KB) host decay dispatch: {dt*1e3:.1f} ms  <- fixed overhead")

    # device-only control dispatch latency
    dev_fn = jax.jit(lambda x: x * 1.0009)
    dt, _ = bench(dev_fn, tiny, n=8)
    log(f"tiny device-only dispatch: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
