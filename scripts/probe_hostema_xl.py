"""Time HostEMA updates at XL scale (1.16B params) on the real chip.

The number the stage-3/4 bench projections need: one packed pinned-host EMA
round-trip per recipe optimizer update. Uses a flat fake XL param tree (three
big leaves; values irrelevant) and the real HostEMA class.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from micro_diffusion_tpu.train import HostEMA


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n_total = 1_165_442_320  # MicroDiT_XL_2 param count (tests/test_dit.py)
    big = 512 * 1024 * 1024
    leaves = {}
    rest, i = n_total, 0
    make = jax.jit(lambda key, n: jax.random.normal(key, (n,), jnp.float32),
                   static_argnums=(1,))
    while rest > 0:
        n = min(big, rest)
        leaves[f"l{i}"] = make(jax.random.PRNGKey(i), n)
        rest -= n
        i += 1
    t0 = time.time()
    float(leaves["l0"][0])
    log(f"XL-sized params on device: {n_total/1e9:.3f}B fp32 "
        f"({n_total*4/2**30:.2f} GiB) in {time.time()-t0:.0f}s")

    for chunk_mb in (1024, 384):
        t0 = time.time()
        ema = HostEMA(leaves, smoothing=0.99975,
                      chunk_bytes=chunk_mb * 1024 * 1024)
        ema.block()
        log(f"chunk={chunk_mb}MB: constructed {len(ema.chunks)} host chunks "
            f"in {time.time()-t0:.0f}s")
        ema.update(leaves)
        ema.block()  # warm all executables
        t0 = time.time()
        n = 3
        for _ in range(n):
            ema.update(leaves)
        ema.block()
        dt = (time.time() - t0) / n
        gb = n_total * 2 / 2**30
        log(f"chunk={chunk_mb}MB: {dt*1e3:.0f} ms per XL EMA update "
            f"({gb:.2f} GiB each way; {2*gb/dt:.2f} GiB/s aggregate)")
        del ema


if __name__ == "__main__":
    main()
