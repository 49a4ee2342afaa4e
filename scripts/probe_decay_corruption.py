"""Bisect the pinned-host EMA decay corruption seen on the real TPU.

HostEMA's single-in/single-out pattern compiles and runs (probe_hosttree.py):
chunk creation and host<->device round-trips are bit-exact, but the decay jit
e' = s*e + (1-s)*p with (host, device) operands returns wrong values (error
~ 0.1*|p| on the first smoke, suggesting one operand reads as zero).

Variants:
  V1 current   : (e_host donated, p_dev) -> host
  V2 no-donate : same, donate_argnums=()
  V3 swapped   : (p_dev, e_host donated) -> host
  V4 staged    : body device_puts e into device memory before compute
  V5 dev-const : p baked in as a closure constant (isolates arg passing)
  V6 two-step  : host->dev mover jit, then pure-device decay, then dev->host
"""

import sys
import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    s_host = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")
    s_dev = jax.sharding.SingleDeviceSharding(dev)
    n = 1 << 16
    s = 0.9

    p_np = np.linspace(-2.0, 2.0, n, dtype=np.float32)
    e_np = np.full(n, 1.0, np.float32)
    p = jnp.asarray(p_np)
    ref = (s * e_np.astype(np.float32)
           + (1 - s) * p_np).astype(np.float32)

    to_host = jax.jit(lambda c: c + jnp.zeros((), jnp.float32),
                      in_shardings=(s_dev,), out_shardings=s_host)
    to_dev = jax.jit(lambda c: c + jnp.zeros((), jnp.float32),
                     in_shardings=(s_host,), out_shardings=s_dev)

    def fresh_e():
        return to_host(jnp.asarray(e_np))

    def check(name, out_host):
        got = np.asarray(to_dev(out_host))
        err = np.abs(got - ref)
        log(f"{name}: max_err {err.max():.6f} "
            f"(got[0]={got[0]:.4f} ref[0]={ref[0]:.4f} "
            f"got[-1]={got[-1]:.4f} ref[-1]={ref[-1]:.4f})")

    body = lambda e, pp: (s * e.astype(jnp.float32)
                          + (1 - s) * pp.astype(jnp.float32))

    # V1 current (donated host arg)
    try:
        f = jax.jit(body, in_shardings=(s_host, s_dev), out_shardings=s_host,
                    donate_argnums=(0,))
        check("V1 donate", f(fresh_e(), p))
    except Exception as ex:  # noqa: BLE001
        log(f"V1 donate: FAIL {str(ex)[:140]}")

    # V2 no donation
    try:
        f = jax.jit(body, in_shardings=(s_host, s_dev), out_shardings=s_host)
        check("V2 no-donate", f(fresh_e(), p))
    except Exception as ex:  # noqa: BLE001
        log(f"V2 no-donate: FAIL {str(ex)[:140]}")

    # V3 swapped arg order
    try:
        f = jax.jit(lambda pp, e: body(e, pp),
                    in_shardings=(s_dev, s_host), out_shardings=s_host,
                    donate_argnums=(1,))
        check("V3 swapped", f(p, fresh_e()))
    except Exception as ex:  # noqa: BLE001
        log(f"V3 swapped: FAIL {str(ex)[:140]}")

    # V4 in-body staging of the host operand
    try:
        f = jax.jit(lambda e, pp: body(jax.device_put(e, s_dev), pp),
                    in_shardings=(s_host, s_dev), out_shardings=s_host,
                    donate_argnums=(0,))
        check("V4 staged", f(fresh_e(), p))
    except Exception as ex:  # noqa: BLE001
        log(f"V4 staged: FAIL {str(ex)[:140]}")

    # V5 params as closure constant
    try:
        f = jax.jit(lambda e: body(e, p),
                    in_shardings=(s_host,), out_shardings=s_host,
                    donate_argnums=(0,))
        check("V5 const-p", f(fresh_e()))
    except Exception as ex:  # noqa: BLE001
        log(f"V5 const-p: FAIL {str(ex)[:140]}")

    # V6 two-step: move to device, decay purely on device, move back
    try:
        decay_dev = jax.jit(body)
        e_dev = to_dev(fresh_e())
        out = to_host(decay_dev(e_dev, p))
        check("V6 two-step", out)
    except Exception as ex:  # noqa: BLE001
        log(f"V6 two-step: FAIL {str(ex)[:140]}")


if __name__ == "__main__":
    main()
