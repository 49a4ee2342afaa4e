"""Break the split-dispatch recipe cycle into its parts on the real chip:
t_grad (one microbatch grad+accumulate dispatch), t_apply (optimizer/EMA
apply dispatch), and the full K-cycle - to locate where dispatch-mode time
goes vs the in-step (scan) equivalent.

Usage: python scripts/probe_dispatch_parts.py --stage res256_mask0 --mb 64 \
           --accum 4 [--ema]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from micro_diffusion_tpu.models.diffusion import LatentDiffusion
from micro_diffusion_tpu.models.dit import MicroDiT_XL_2
from micro_diffusion_tpu.train import (
    build_optimizer,
    create_train_state,
    make_apply_step,
    make_grad_step,
    zero_grad_accumulator,
)
from micro_diffusion_tpu.train.optim import cosine_with_warmup

STAGES = {
    "res256_mask75": (32, 0.75),
    "res256_mask0": (32, 0.0),
    "res512_mask75": (64, 0.75),
    "res512_mask0": (64, 0.0),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", required=True, choices=sorted(STAGES))
    p.add_argument("--mb", type=int, required=True)
    p.add_argument("--accum", type=int, required=True)
    p.add_argument("--remat", default="attn_moe")
    p.add_argument("--moe", default="onehot")
    p.add_argument("--ema", action="store_true")
    args = p.parse_args()

    res, mask = STAGES[args.stage]
    dit = MicroDiT_XL_2(input_size=res, remat=True, remat_policy=args.remat,
                        moe_dispatch=args.moe)
    model = LatentDiffusion(dit=dit, latent_res=res, train_mask_ratio=mask,
                            latent_scale=1.0)
    rng = jax.random.PRNGKey(0)
    params = bench.fast_params(model, rng)
    sched = cosine_with_warmup(2.4e-4, 2500, 250_000, 0.33)
    tx = build_optimizer(params, sched, clip_norm=0.25,
                         low_precision_moments=True)
    state = create_train_state(params, tx, use_ema=args.ema,
                               ema_dtype=jnp.bfloat16)
    del params

    kwargs = {}
    if args.ema:
        ema_cfg = bench.STAGE_EMA.get(args.stage)
        kwargs = dict(ema_smoothing=ema_cfg["smoothing"] if ema_cfg else 0.9975,
                      ema_start=0, ema_update_interval=1)
    grad_fn = jax.jit(make_grad_step(model), donate_argnums=(1,))
    zero_fn = jax.jit(lambda p: zero_grad_accumulator(p, jnp.bfloat16))
    apply_fn = jax.jit(make_apply_step(tx, sched, **kwargs),
                       static_argnums=(2,), donate_argnums=(0,))
    mbatch = bench._make_batch(args.mb, res)

    # compile both
    t0 = time.time()
    acc = zero_fn(state.params)
    acc = grad_fn(state.params, acc, mbatch, rng, 0)
    float(acc[0])
    print(f"grad compile+first: {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    state, m = apply_fn(state, acc, args.accum)  # donates old state
    float(m["loss"])
    print(f"apply compile+first: {time.time() - t0:.0f}s", flush=True)

    # t_grad: N back-to-back grad dispatches, value-fetch barrier at the end
    n = 6
    acc = zero_fn(state.params)
    acc = grad_fn(state.params, acc, mbatch, rng, 0)
    float(acc[0])
    t0 = time.time()
    for i in range(n):
        acc = grad_fn(state.params, acc, mbatch, rng, i)
    float(acc[0])
    t_grad = (time.time() - t0) / n
    print(f"t_grad = {t_grad * 1e3:.1f} ms/dispatch (x{n})", flush=True)

    # t_apply: barrier before AND after each apply so nothing else is in
    # flight inside the timed window (the zero/grad prep is fetched first)
    reps = 3
    t_apply_total = 0.0
    for _ in range(reps):
        acc = zero_fn(state.params)
        acc = grad_fn(state.params, acc, mbatch, rng, 0)
        float(acc[0])
        t0 = time.time()
        state, m = apply_fn(state, acc, args.accum)
        float(m["loss"])
        t_apply_total += time.time() - t0
    t_apply = t_apply_total / reps
    print(f"t_apply = {t_apply * 1e3:.1f} ms", flush=True)

    k = args.accum
    cyc = k * t_grad + t_apply
    print(f"projected K={k} cycle: {cyc * 1e3:.1f} ms = "
          f"{k * args.mb / cyc:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
