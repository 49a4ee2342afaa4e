"""Isolate which host-memory jit patterns the axon AOT helper accepts.

The single-array EMA jit (probe_hostmem.py) compiles and runs; the
pytree-valued equivalent in tune.py --ema-mode offload 500s with "Tensor which
is moved to host ... is returned from the entry computation but the layout for
this output is not set to host memory". Matrix:

  A. tree arg, BARE shardings (broadcast prefix), no in-body device_put
  B. tree arg, per-leaf sharding TREES, no in-body device_put
  C. tree arg, per-leaf sharding trees, WITH in-body device_put staging
  D. tree arg, bare shardings, WITH device_put staging
  E. single flat array (control - the probe_hostmem pattern)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __import__("os").path.dirname(__file__) or ".")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    s_host = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")
    s_dev = jax.sharding.SingleDeviceSharding(dev)

    params = {"a": jnp.full((256, 128), 1.25, jnp.float32),
              "b": jnp.arange(512, dtype=jnp.float32)}
    ema = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    ema_host = jax.device_put(ema, jax.tree.map(lambda _: s_host, ema))
    host_tree = jax.tree.map(lambda _: s_host, ema)
    dev_tree = jax.tree.map(lambda _: s_dev, params)

    def body_plain(e, p):
        return jax.tree.map(
            lambda el, pl: (0.9 * el.astype(jnp.float32)
                            + 0.1 * pl).astype(el.dtype), e, p)

    def body_staged(e, p):
        return jax.tree.map(
            lambda el, pl: (0.9 * jax.device_put(el, s_dev).astype(jnp.float32)
                            + 0.1 * pl).astype(el.dtype), e, p)

    probe = jax.jit(
        lambda e: jax.tree.leaves(e)[0].astype(jnp.float32).reshape(-1)[0],
        in_shardings=(host_tree,),
    )

    cases = [
        ("A bare-shardings plain", body_plain, s_host, s_dev, s_host),
        ("B tree-shardings plain", body_plain, host_tree, dev_tree, host_tree),
        ("C tree-shardings staged", body_staged, host_tree, dev_tree, host_tree),
        ("D bare-shardings staged", body_staged, s_host, s_dev, s_host),
    ]
    live = ema_host
    for name, body, in_e, in_p, out_e in cases:
        try:
            fn = jax.jit(body, in_shardings=(in_e, in_p), out_shardings=out_e,
                         donate_argnums=(0,))
            t0 = time.time()
            live = fn(live, params)
            v = float(probe(live))
            log(f"{name}: OK ({time.time() - t0:.1f}s, probe {v:.4f})")
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAIL {str(e)[:160]}")
            # donated buffer may be gone; rebuild
            live = jax.device_put(ema, jax.tree.map(lambda _: s_host, ema))

    # F: host tree created BY A JIT with host out_shardings (probe_hostmem's
    # working pattern), plain body, tree shardings
    to_host = jax.jit(lambda p: jax.tree.map(lambda x: x.astype(jnp.bfloat16), p),
                      out_shardings=host_tree)
    try:
        live = to_host(params)
        fnF = jax.jit(body_plain, in_shardings=(host_tree, dev_tree),
                      out_shardings=host_tree, donate_argnums=(0,))
        live = fnF(live, params)
        live = fnF(live, params)
        log(f"F jit-created tree plain: OK (probe {float(probe(live)):.4f})")
    except Exception as e:  # noqa: BLE001
        log(f"F jit-created tree plain: FAIL {str(e)[:160]}")

    # G: jit-created host tree consumed with shardings taken from the arrays
    try:
        live = to_host(params)
        sh = jax.tree.map(lambda l: l.sharding, live)
        kinds = {getattr(s, "memory_kind", None) for s in jax.tree.leaves(sh)}
        fnG = jax.jit(body_plain, in_shardings=(sh, dev_tree),
                      out_shardings=sh, donate_argnums=(0,))
        live = fnG(live, params)
        log(f"G array-sharding tree plain: OK (kinds {kinds}, "
            f"probe {float(probe(live)):.4f})")
    except Exception as e:  # noqa: BLE001
        log(f"G array-sharding tree plain: FAIL {str(e)[:160]}")

    # H: tree DEVICE inputs + single flat HOST in/out (hypothesis: only
    # host-memory TUPLE OUTPUTS break the AOT helper; single outputs are fine)
    sizes = [l.size for l in jax.tree.leaves(ema)]
    to_flat_host = jax.jit(
        lambda p: jnp.concatenate(
            [l.reshape(-1).astype(jnp.bfloat16) for l in jax.tree.leaves(p)]),
        out_shardings=s_host)
    probe_flat = jax.jit(lambda e: e.astype(jnp.float32)[0],
                         in_shardings=(s_host,))
    try:
        eflat = to_flat_host(params)
        fnH = jax.jit(
            lambda e, p: (0.9 * e.astype(jnp.float32) + 0.1 * jnp.concatenate(
                [l.reshape(-1) for l in jax.tree.leaves(p)])
            ).astype(jnp.bfloat16),
            in_shardings=(s_host, s_dev), out_shardings=s_host,
            donate_argnums=(0,))
        eflat = fnH(eflat, params)
        eflat = fnH(eflat, params)
        log(f"H flat-host out, tree dev in: OK (probe {float(probe_flat(eflat)):.4f})")
    except Exception as e:  # noqa: BLE001
        log(f"H flat-host out, tree dev in: FAIL {str(e)[:160]}")

    # I: HOST TREE inputs, single flat host output
    try:
        live = to_host(params)
        fnI = jax.jit(
            lambda e, p: (0.9 * jnp.concatenate(
                [l.reshape(-1).astype(jnp.float32)
                 for l in jax.tree.leaves(e)])
                + 0.1 * jnp.concatenate(
                    [l.reshape(-1) for l in jax.tree.leaves(p)])
            ).astype(jnp.bfloat16),
            in_shardings=(host_tree, s_dev), out_shardings=s_host,
            donate_argnums=(0,))
        out = fnI(live, params)
        log(f"I host-tree in, flat-host out: OK (probe {float(probe_flat(out)):.4f})")
    except Exception as e:  # noqa: BLE001
        log(f"I host-tree in, flat-host out: FAIL {str(e)[:160]}")

    # E: flat single-array control
    flat = jnp.concatenate([l.reshape(-1) for l in jax.tree.leaves(ema)])
    flat_host = jax.device_put(flat, s_host)
    pflat = jnp.concatenate([l.reshape(-1) for l in jax.tree.leaves(params)])
    fnE = jax.jit(
        lambda e, p: (0.9 * e.astype(jnp.float32) + 0.1 * p).astype(e.dtype),
        in_shardings=(s_host, s_dev), out_shardings=s_host,
        donate_argnums=(0,))
    probeE = jax.jit(lambda e: e.astype(jnp.float32)[0],
                     in_shardings=(s_host,))
    try:
        out = fnE(flat_host, pflat)
        log(f"E flat control: OK (probe {float(probeE(out)):.4f})")
    except Exception as e:  # noqa: BLE001
        log(f"E flat control: FAIL {str(e)[:160]}")


if __name__ == "__main__":
    main()
