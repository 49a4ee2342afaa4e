"""Validate candidate fixes for the pinned-host bf16 decay corruption.

Round-4 bisect established (probe_decay_corruption.py + session logs):
  * single-array host-memory jits compile + run through the axon AOT helper;
  * creation and host<->device round-trips are bit-exact, INCLUDING bf16;
  * the decay jit e' = s*e + (1-s)*p with a BF16 host operand reads e as a
    deterministic PERMUTATION of its true values (p reads fine) - a layout
    mismatch between the producer executable's host write and the consumer's
    host read that XLA only hits for 16-bit host buffers;
  * the identical decay with FP32 host operands is exact.

Candidate fixes, both keeping the HostEMA chunk design:
  F32  : store chunks in fp32 host memory (proven-exact dtype; 2x bytes)
  PACK : store bf16 numerics bit-packed two-per-u32 (32-bit host buffer like
         fp32, half the transfer bytes; bitcast_convert_type on device)

Each is validated with randn data (linspace masked the permutation in early
probes: adjacent values are nearly equal), multiple coexisting chunks,
back-to-back donated updates, and a final materialize vs a pure-device
reference chain.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_variant(name, store_dtype, pack, n_chunks=3, chunk_elems=1 << 22,
                steps=3, s=0.9975):
    dev = jax.devices()[0]
    s_host = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")
    s_dev = jax.sharding.SingleDeviceSharding(dev)

    rng = np.random.default_rng(0)
    total = n_chunks * chunk_elems
    p_np = rng.standard_normal(total, dtype=np.float32)
    p_chunks = [jnp.asarray(p_np[i * chunk_elems:(i + 1) * chunk_elems])
                for i in range(n_chunks)]

    if pack:
        # store two bf16 values per u32 host element; bitcast_convert_type
        # merges the trailing dim when widening: (n,2) u16 -> (n,) u32
        def encode(c):
            b = c.astype(jnp.bfloat16).reshape(-1, 2)
            u16 = jax.lax.bitcast_convert_type(b, jnp.uint16)
            return jax.lax.bitcast_convert_type(u16, jnp.uint32)

        def decode(u):
            u16 = jax.lax.bitcast_convert_type(u, jnp.uint16)
            return jax.lax.bitcast_convert_type(
                u16, jnp.bfloat16).reshape(-1)

        to_store = jax.jit(encode, in_shardings=(s_dev,),
                           out_shardings=s_host)
        decay = jax.jit(
            lambda e, p: encode(
                (s * decode(e).astype(jnp.float32)
                 + (1.0 - s) * p.astype(jnp.float32)).astype(jnp.bfloat16)),
            in_shardings=(s_host, s_dev), out_shardings=s_host,
            donate_argnums=(0,))
        to_dev = jax.jit(decode, in_shardings=(s_host,), out_shardings=s_dev)
        ref_decay = jax.jit(lambda e, p: (
            s * e.astype(jnp.float32) + (1.0 - s) * p.astype(jnp.float32)
        ).astype(jnp.bfloat16))
        init_cast = jax.jit(lambda c: c.astype(jnp.bfloat16))
    else:
        to_store = jax.jit(lambda c: c.astype(store_dtype),
                           in_shardings=(s_dev,), out_shardings=s_host)
        decay = jax.jit(
            lambda e, p: (s * e.astype(jnp.float32)
                          + (1.0 - s) * p.astype(jnp.float32)
                          ).astype(store_dtype),
            in_shardings=(s_host, s_dev), out_shardings=s_host,
            donate_argnums=(0,))
        to_dev = jax.jit(lambda c: c + jnp.zeros((), store_dtype),
                         in_shardings=(s_host,), out_shardings=s_dev)
        ref_decay = jax.jit(lambda e, p: (
            s * e.astype(jnp.float32) + (1.0 - s) * p.astype(jnp.float32)
        ).astype(store_dtype))
        init_cast = jax.jit(lambda c: c.astype(store_dtype))

    t0 = time.time()
    chunks = [to_store(p) for p in p_chunks]
    # pure-device reference chain (same math, no host memory)
    ref = [init_cast(p) for p in p_chunks]
    float(jnp.sum(ref[0].astype(jnp.float32)))
    log(f"[{name}] created {n_chunks} host chunks "
        f"({chunk_elems * (2 if not pack or True else 2) // (1 << 20)}M elems "
        f"each) in {time.time() - t0:.0f}s")

    t0 = time.time()
    for it in range(steps):
        chunks = [decay(e, p) for e, p in zip(chunks, p_chunks)]
        ref = [ref_decay(e, p) for e, p in zip(ref, p_chunks)]
    # value barrier through to_dev
    outs = [np.asarray(to_dev(c), np.float32) for c in chunks]
    refs = [np.asarray(r, np.float32).reshape(-1) for r in ref]
    dt = time.time() - t0
    ok = True
    for i, (o, r) in enumerate(zip(outs, refs)):
        err = np.abs(o - r)
        exact = np.array_equal(o, r)
        # permutation detector: equal as multisets but not positionally
        perm = (not exact) and np.array_equal(np.sort(o), np.sort(r))
        log(f"[{name}] chunk{i}: max_err {err.max():.6e} exact={exact} "
            f"permuted={perm}")
        ok = ok and exact
    log(f"[{name}] {steps} chained donated updates x{n_chunks} chunks: "
        f"{dt:.1f}s -> {'PASS' if ok else 'FAIL'}")
    return ok


def main():
    log(f"device: {jax.devices()[0]}")
    results = {}
    results["F32"] = run_variant("F32 fp32-store", jnp.float32, pack=False)
    results["PACK"] = run_variant("PACK u32-bitpacked-bf16", None, pack=True)
    # control: the known-broken bf16 store, to confirm the bug still repros
    results["BF16(control)"] = run_variant("BF16 control (expect FAIL)",
                                           jnp.bfloat16, pack=False)
    log(f"summary: {results}")


if __name__ == "__main__":
    main()
