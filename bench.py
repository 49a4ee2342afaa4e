"""Benchmark: MicroDiT-XL training throughput (images/sec/chip) on real TPU hardware.

Measures the jit'd train step for the four reference recipe stages (256px mask-0.75,
256px mask-0, 512px mask-0.75, 512px mask-0; configs/*) on one chip, then reports the
schedule-weighted average images/sec/chip over the full 385k-step recipe.

Baseline: the reference publishes no images/sec. Derived from its own numbers
(BASELINE.md): 385k steps x batch 2048 in 2.6 days on 8xH100 => 3510 img/s cluster
= 439 img/s per H100, schedule-weighted across stages. vs_baseline compares our
schedule-weighted per-chip number against that.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.

Env:
  MDT_BENCH_QUICK=1   -> stage-1 only (fast sanity run); metric name says so
  MDT_BENCH_STEPS=N   -> timed steps per stage (default 10)
"""

import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: XL train-step compiles take 3-10 min through this
# environment's remote compile service; cache hits bring reruns down to seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.expanduser("~"), ".cache", "mdt_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from micro_diffusion_tpu.models.diffusion import LatentDiffusion
from micro_diffusion_tpu.models.dit import MicroDiT_XL_2
from micro_diffusion_tpu.train import build_optimizer, create_train_state, make_train_step
from micro_diffusion_tpu.train.optim import cosine_with_warmup

# Reference-derived baseline (see module docstring).
BASELINE_IMG_PER_SEC_PER_CHIP = 439.0
V5E_PEAK_BF16_TFLOPS = 197.0


# Ground-truth fwd FLOPs per sample (XLA cost_analysis of the jit'd EDM train loss,
# 2MNK convention verified; measured via scripts/tune.py --fwd-flops on the real
# program - the earlier hand model overcounted EC-MoE, which touches 2T tokens of
# 8 experts' weights, not params x tokens).
STAGE_FWD_GFLOPS = {
    (32, 0.75): 96.07,   # res256 mask75
    (32, 0.0): 241.44,   # res256 mask0
    (64, 0.75): 340.19,  # res512 mask75
    (64, 0.0): 883.03,   # res512 mask0
}


def stage_fwd_gflops_per_sample(latent_res: int, mask_ratio: float) -> float:
    return STAGE_FWD_GFLOPS[(latent_res, mask_ratio)]

# (name, latent_res, mask_ratio, schedule_steps, config ladder of
# (remat_policy, mb[, moe_dispatch])). Ladders start at the measured-best config
# (PERF.md) and fall back on compile/OOM failures (the environment's remote compile
# helper 500s on OOM and on very large graphs; every ladder ends with small
# known-good configs). moe_dispatch 'batched' (the 3-D einsum form) has the lowest
# peak HBM but slower expert dots - it is the 512px mask-0 fallback (PERF.md).
STAGES = [
    # measured (current service epoch): attn_moe mb128 174.3 > full mb128 170.5
    # > dots_attn_moe mb64 168.4 (service-dependent fit) > dots mb64 167.1
    # (ditto) > lean mb64 160.5 > xlean mb64 159.1
    ("res256_mask75", 32, 0.75, 250_000,
     (("attn_moe", 128), ("full", 128), ("dots_attn_moe", 64), ("dots", 64),
      ("dots_attn_moe_lean", 64), ("dots_attn_moe_xlean", 64), ("full", 64),
      ("full", 32), ("full", 16))),
    # attn_moe mb32 measured 84.7 = wash with dots_attn_moe mb16 (84.6): the
    # full-remat recompute penalty cancels the bigger-batch amortization here
    ("res256_mask0", 32, 0.0, 30_000,
     (("dots_attn_moe", 16), ("attn_moe", 32), ("dots_attn_moe_lean", 16),
      ("dots_attn_moe_xlean", 16), ("dots", 16), ("full", 16), ("full", 8))),
    # attn_moe mb32 53.5 ~= lean mb16 53.4; dots_attn_moe mb16 measured 54.4
    # under the previous service epoch, currently fails to fit
    ("res512_mask75", 64, 0.75, 50_000,
     (("dots_attn_moe", 16), ("attn_moe", 32), ("dots_attn_moe_lean", 16),
      ("dots_attn_moe_xlean", 16), ("dots", 16), ("full", 8), ("full", 4))),
    ("res512_mask0", 64, 0.0, 55_000,
     # measured: batched mb8 21.4 img/s > xlean-unroll mb8 20.7 (the per-expert
     # hidden/FFN recompute outweighs the unroll's faster dots at this stage);
     # mb16 needs 19.8G > 15.75G HBM even at xlean - not reachable on one chip
     (("dots_attn_moe", 8, "batched"), ("dots_attn_moe_xlean", 8), ("full", 8),
      ("full", 4), ("full", 2))),
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def fast_params(model, rng):
    """Throughput-bench params: correct shapes/dtypes, values ~N(0, 0.02) - avoids the
    slow full-init compile; parameter VALUES don't affect step time."""
    shapes = jax.eval_shape(lambda: model.dit.init(
        {"params": rng, "mask": rng},
        jnp.zeros((1, model.dit.in_channels, model.latent_res, model.latent_res)),
        jnp.zeros((1,)),
        jnp.zeros((1, 1, 77, model.dit.caption_channels)),
    ))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def init_leaves(key):
        keys = jax.random.split(key, len(leaves))
        return [
            jax.random.normal(k, l.shape, l.dtype) * 0.02
            for k, l in zip(keys, leaves)
        ]

    return jax.tree_util.tree_unflatten(treedef, init_leaves(rng))


def _run_config(name, latent_res, mask_ratio, policy, mb, timed_steps,
                moe_dispatch="onehot"):
    """One ladder rung: build state, compile, time. Everything is local so a
    failure frees its device buffers when the frame dies (see bench_stage)."""
    dit = MicroDiT_XL_2(input_size=latent_res, remat=True, remat_policy=policy,
                        moe_dispatch=moe_dispatch)
    model = LatentDiffusion(
        dit=dit, latent_res=latent_res, train_mask_ratio=mask_ratio,
        latent_scale=1.0,
    )
    rng = jax.random.PRNGKey(0)
    log(f"[{name}] creating XL params (remat={policy}, mb={mb})...")
    params = fast_params(model, rng)

    sched = cosine_with_warmup(2.4e-4, 2500, 250_000, 0.33)
    # bf16 moments (fp32 update math): memory + HBM-traffic lever to fit AdamW
    # for 1.16B params in one chip's HBM; the multi-chip recipe shards optimizer
    # state instead (parallel/). Measured-best across all stages (PERF.md).
    tx = build_optimizer(params, sched, clip_norm=0.25,
                         low_precision_moments=True)
    state = create_train_state(params, tx)
    del params

    step_fn = jax.jit(
        make_train_step(model, tx, sched, microbatch_size=None),
        donate_argnums=(0,),
    )
    batch = {
        "image_latents": jax.random.normal(
            jax.random.PRNGKey(1), (mb, 4, latent_res, latent_res)
        ),
        "caption_latents": jax.random.normal(
            jax.random.PRNGKey(2), (mb, 1, 77, 1024)
        ),
        "drop_caption_mask": jnp.ones((mb,)),
    }
    t0 = time.time()
    state, metrics = step_fn(state, batch, rng)
    # NOTE: through the axon relay, block_until_ready can return before the
    # computation finishes; a scalar VALUE fetch is the only reliable barrier.
    float(metrics["loss"])
    log(f"[{name}] compile+first step: {time.time() - t0:.0f}s")
    state, metrics = step_fn(state, batch, rng)  # warmup
    float(metrics["loss"])

    t0 = time.time()
    for _ in range(timed_steps):
        state, metrics = step_fn(state, batch, rng)
    final_loss = float(metrics["loss"])  # forces the whole step chain
    dt = (time.time() - t0) / timed_steps
    img_s = mb / dt
    log(
        f"[{name}] remat={policy} microbatch {mb}: {dt * 1e3:.1f} ms/step = "
        f"{img_s:.1f} img/s/chip (loss {final_loss:.4f})"
    )
    return img_s, mb


def bench_stage(name, latent_res, mask_ratio, config_ladder, timed_steps):
    # NOTE: compile-time OOM projections are deterministic per compile-service
    # instance, but DIFFER across service restarts (the stage-1 best config
    # compiled and ran under one instance and was 680MB over HBM under the
    # next). The ladder is ordered by measured throughput; the first config
    # that compiles under the current service wins.
    for cfg in config_ladder:
        policy, mb = cfg[0], cfg[1]
        # MoE dispatch is a static module attribute (models/layers.py), passed
        # through the factory - NOT an env var (round-2 advisor finding).
        moe = cfg[2] if len(cfg) > 2 else "unroll"
        try:
            return _run_config(name, latent_res, mask_ratio, policy, mb,
                               timed_steps, moe_dispatch=moe)
        except Exception as e:  # OOM / remote-compile 500 -> next config
            log(f"[{name}] config (remat={policy}, mb={mb}) failed: {str(e)[:120]}")
        # A failed rung's 9GB of params/opt-state must be off the chip before
        # the next rung allocates: drop the exception frame refs and collect.
        gc.collect()
    raise RuntimeError(f"{name}: all configs failed")


def main():
    quick = os.environ.get("MDT_BENCH_QUICK") == "1"
    timed_steps = int(os.environ.get("MDT_BENCH_STEPS", "10"))
    stages = STAGES[:1] if quick else STAGES
    only = os.environ.get("MDT_BENCH_STAGES")  # csv filter, e.g. "res512_mask75"
    if only:
        keep = set(only.split(","))
        stages = [s for s in stages if s[0] in keep]

    results = {}
    for name, res, mask, steps, ladder in stages:
        img_s, mb = bench_stage(name, res, mask, ladder, timed_steps)
        # MFU: model FLOPs (3x fwd, excluding remat recompute) / peak
        mfu = 3 * stage_fwd_gflops_per_sample(res, mask) * img_s / (
            V5E_PEAK_BF16_TFLOPS * 1e3
        )
        results[name] = {"img_per_sec_per_chip": img_s, "microbatch": mb,
                         "schedule_steps": steps, "est_mfu": round(mfu, 3)}

    if quick:
        value = results["res256_mask75"]["img_per_sec_per_chip"]
        metric = "MicroDiT-XL stage1 (256px mask0.75) train images/sec/chip"
    else:
        total_images = sum(r["schedule_steps"] * 2048 for r in results.values())
        total_time = sum(
            r["schedule_steps"] * 2048 / r["img_per_sec_per_chip"]
            for r in results.values()
        )
        value = total_images / total_time
        metric = "MicroDiT-XL 4-stage schedule-weighted train images/sec/chip"

    out = {
        "metric": metric,
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / BASELINE_IMG_PER_SEC_PER_CHIP, 4),
        "detail": {
            k: {kk: (round(vv, 2) if isinstance(vv, float) else vv)
                for kk, vv in v.items()}
            for k, v in results.items()
        },
        "baseline_img_per_sec_per_chip": BASELINE_IMG_PER_SEC_PER_CHIP,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
