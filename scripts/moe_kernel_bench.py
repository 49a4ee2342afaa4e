"""Isolated moe_ffn kernel probe on the real chip: fwd and fwd+bwd time vs the
XLA unrolled form, at the production MicroDiT shapes.

  python scripts/moe_kernel_bench.py               # all shapes
  python scripts/moe_kernel_bench.py --shape s1_backbone

Remember PERF.md: isolated wins don't always survive in-step (DMA overlap);
this probe is for correctness-on-hardware + a first-order ranking only.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # noqa: F401  (persistent compile cache)
from micro_diffusion_tpu.ops.moe_ffn import _moe_ffn_ref, moe_ffn

# (name, n, e, k, d, f): n = microbatch, k = capacity*T/E per expert
SHAPES = {
    # stage 1 (256px mask75, mb128): mixer T=256 d=768, backbone T=64 d=1024
    "s1_mixer": (128, 8, 64, 768, 3072),
    "s1_backbone": (128, 8, 16, 1024, 2048),
    # stage 2 (256px mask0, mb16): backbone T=256
    "s2_backbone": (16, 8, 64, 1024, 2048),
    # stage 4 (512px mask0, mb8): mixer/backbone T=1024
    "s4_mixer": (8, 8, 256, 768, 3072),
    "s4_backbone": (8, 8, 256, 1024, 2048),
}


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    # value fetch: the only reliable barrier through the axon relay
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / reps * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default=None, choices=sorted(SHAPES))
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    names = [args.shape] if args.shape else sorted(SHAPES)
    for name in names:
        n, e, k, d, f = SHAPES[name]
        kx, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        xg = (jax.random.normal(kx, (n, e, k, d)) * 0.5).astype(jnp.bfloat16)
        w1 = (jax.random.normal(k1, (e, d, f)) * 0.02).astype(jnp.bfloat16)
        w2 = (jax.random.normal(k2, (e, f, d)) * 0.02).astype(jnp.bfloat16)

        flops = 2 * 2 * n * e * k * d * f  # two dots
        results = {}
        for label, fn in (("pallas", moe_ffn), ("xla", _moe_ffn_ref)):
            fwd = jax.jit(fn)
            grad = jax.jit(
                jax.grad(
                    lambda a, b, c: jnp.sum(fn(a, b, c).astype(jnp.float32)),
                    argnums=(0, 1, 2),
                )
            )
            try:
                t_f = timed(fwd, xg, w1, w2, reps=args.reps)
                t_g = timed(grad, xg, w1, w2, reps=args.reps)
            except Exception as exc:  # noqa: BLE001
                print(f"{name:13s} {label:6s} FAILED: {str(exc)[:140]}")
                continue
            results[label] = (t_f, t_g)
            print(
                f"{name:13s} {label:6s} fwd {t_f:7.2f} ms ({flops / t_f / 1e9:6.1f} "
                f"TFLOPS)  fwd+bwd {t_g:7.2f} ms ({3 * flops / t_g / 1e9:6.1f} TFLOPS)"
            )
        if len(results) == 2:
            pf, pg = results["pallas"]
            xf, xg_ = results["xla"]
            print(f"{name:13s} speedup fwd {xf / pf:.2f}x  fwd+bwd {xg_ / pg:.2f}x")


if __name__ == "__main__":
    main()
