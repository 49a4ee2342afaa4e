"""Probe device->host transfer bandwidth through the axon relay.

The round-4 host-EMA-offload design (VERDICT round-3 item 1) hinges on pulling
the new params (fp32 4.66GB or a bf16 cast 2.33GB) off the chip once per
recipe optimizer update (every K = 256/mb microbatch steps) and doing the EMA
decay math in host RAM, freeing the 2.33GB resident EMA buffer that blocks
the bf16 grad accumulator at stages 3/4. That only wins if the D2H fetch can
overlap the K grad steps (3.7s at stage 3 mb32, 10.7s at stage 4 mb8).

Measures, on the real chip:
  1. blocking np.asarray fetch of 256MB / 1GB fp32 buffers (GB/s)
  2. jitted fp32->bf16 cast + fetch (effective GB/s per param byte)
  3. copy_to_host_async + later np.asarray (does async help through the relay?)
  4. host->device upload (device_put) for completeness
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")

    for mb in (64, 256, 1024):
        n = mb * 1024 * 1024 // 4
        x = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.float32))(
            jax.random.PRNGKey(0)
        )
        float(x[0])  # settle
        # blocking fetch
        for trial in range(3):
            t0 = time.time()
            h = np.asarray(x)
            dt = time.time() - t0
            log(f"D2H blocking {mb}MB fp32: {dt*1e3:.0f} ms = {mb/1024/dt:.2f} GB/s")
        # async fetch: start copy, then check when np.asarray returns
        t0 = time.time()
        x.copy_to_host_async()
        t_async = time.time() - t0
        t0 = time.time()
        h = np.asarray(x)
        t_fetch = time.time() - t0
        log(f"D2H async {mb}MB: copy_to_host_async returned in {t_async*1e3:.1f} ms, "
            f"np.asarray after: {t_fetch*1e3:.0f} ms")
        # bf16 cast on device then fetch (half the bytes per param)
        xb = jax.jit(lambda a: a.astype(jnp.bfloat16))(x)
        float(xb[0].astype(jnp.float32))
        t0 = time.time()
        hb = np.asarray(xb)
        dt = time.time() - t0
        log(f"D2H {mb//2}MB bf16 (cast of {mb}MB fp32): {dt*1e3:.0f} ms = "
            f"{mb/2/1024/dt:.2f} GB/s wire, {mb/1024/dt:.2f} GB/s per param-fp32-byte")
        # upload
        t0 = time.time()
        y = jax.device_put(h, dev)
        float(y.reshape(-1)[0] if hasattr(y, 'reshape') else y[0])
        dt = time.time() - t0
        log(f"H2D {mb}MB fp32: {dt*1e3:.0f} ms = {mb/1024/dt:.2f} GB/s")
        del x, xb, y

    # Overlap check: does a blocking fetch of buffer A stall an independent
    # jitted computation dispatched right after? (relay semantics unknown)
    n = 256 * 1024 * 1024 // 4
    a = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.float32))(
        jax.random.PRNGKey(1)
    )
    m = 4096
    w = jax.jit(lambda k: jax.random.normal(k, (m, m), jnp.bfloat16))(
        jax.random.PRNGKey(2)
    )

    @jax.jit
    def burn(w):
        def body(c, _):
            return jnp.tanh(c @ w), None
        out, _ = jax.lax.scan(body, w, None, length=64)
        return out.sum()

    float(burn(w))  # compile
    t0 = time.time()
    float(burn(w))
    t_burn = time.time() - t0
    float(a[0])
    t0 = time.time()
    h = np.asarray(a)
    t_fetch = time.time() - t0
    log(f"burn alone: {t_burn*1e3:.0f} ms; fetch 256MB alone: {t_fetch*1e3:.0f} ms")
    # now: dispatch burn, immediately fetch a; if total ~= max(t_burn, t_fetch)
    # they overlap; if ~= sum they serialize.
    t0 = time.time()
    r = burn(w)
    t1 = time.time()
    h = np.asarray(a)
    t2 = time.time()
    float(r)
    t3 = time.time()
    log(f"dispatch burn: {1e3*(t1-t0):.0f} ms; fetch during burn: "
        f"{1e3*(t2-t1):.0f} ms; burn value wait: {1e3*(t3-t2):.0f} ms; "
        f"total {1e3*(t3-t0):.0f} ms vs serial {1e3*(t_burn+t_fetch):.0f} ms")


if __name__ == "__main__":
    main()
