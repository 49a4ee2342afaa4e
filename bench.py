"""Benchmark: MicroDiT-XL training throughput (images/sec/chip) on real TPU hardware.

Measures the jit'd train step for the four reference recipe stages (256px mask-0.75,
256px mask-0, 512px mask-0.75, 512px mask-0; configs/*) on one chip, then reports the
schedule-weighted average images/sec/chip over the full 385k-step recipe.

Baseline: the reference publishes no images/sec. Derived from its own numbers
(BASELINE.md): 385k steps x batch 2048 in 2.6 days on 8xH100 => 3510 img/s cluster
= 439 img/s per H100, schedule-weighted across stages. vs_baseline compares our
schedule-weighted per-chip number against that.

Output protocol (driver-survivable, round-5): the final line on stdout is ONE
JSON result line. After every completed stage leg the CURRENT partial result
(weighted over the stages measured so far, flagged "partial": true) is printed
too, and a SIGTERM handler + atexit hook re-emit the latest partial - so a
driver timeout (BENCH_r04.json died rc=124 with parsed:null, losing every
measured leg) still yields the weighted metric over measured stages. A
time-budget ladder trimmer (MDT_BENCH_BUDGET_S) drops fallback rungs when the
wall budget runs short. Diagnostics go to stderr.

Env:
  MDT_BENCH_QUICK=1      -> stage-1 only (fast sanity run); metric name says so
  MDT_BENCH_STEPS=N      -> timed steps per stage (default 10)
  MDT_BENCH_BUDGET_S=N   -> wall budget in seconds (default 3600): ladders are
                            trimmed toward lead-rung-only as it depletes
"""

import atexit
import gc
import json
import os
import signal
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
from micro_diffusion_tpu.train import (
    HostComputeEMA,
    HostEMA,
    build_optimizer,
    create_train_state,
    make_apply_step,
    make_ema_step,
    make_grad_step,
    make_train_step,
    zero_grad_accumulator,
)
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

# Per-stage EMA config from the reference recipes (stages 3/4 only;
# res_512_pretrain.yaml:4-9 / res_512_finetune.yaml:4-9): smoothing,
# update_interval 1ba, and ema_start as a fraction of the stage's steps.
# ema_start matters on a 16GB chip: the bf16 EMA buffer (2.33GB) only exists
# after ema_start, so the FIRST 25000/50000 steps of res512_mask75 run without
# it - a faithful two-phase stage with a faster pre-EMA config. res512_mask0's
# pre-phase is 1000/55000 steps (1.8%) - benched as all-EMA (conservative).
STAGE_EMA = {
    "res512_mask75": {"smoothing": 0.99975, "start_frac": 25_000 / 50_000},
    "res512_mask0": {"smoothing": 0.9975, "start_frac": 1_000 / 55_000},
}

# Pre-EMA-phase ladders for stages whose ema_start splits the schedule
# materially. No EMA buffer -> the bf16 grad accumulator (2.33GB) can fit,
# so these rungs reach for recipe accumulation first.
PRE_EMA_LADDERS = {
    "res512_mask75": (
        ("attn_moe", 32, "onehot"), ("attn_moe", 16, "onehot"),
        ("dots_attn_moe", 16, "onehot"),
        ("dots_attn_moe", 8, "onehot"), ("dots_attn_moe", 16, "gather"),
        ("dots_attn_moe_xlean", 16), ("dots", 16), ("full", 8), ("full", 4),
    ),
}

# Reference per-rank batch: 2048 global / 8 ranks (train.py:50). The recipe
# step accumulates K = 256/mb microbatches per optimizer update per rank.
PER_RANK_BATCH = 256

# (name, latent_res, mask_ratio, schedule_steps, config ladder of
# (remat_policy, mb[, moe_dispatch])). Ladders start at the measured-best config
# (PERF.md) and fall back on compile/OOM failures (the environment's remote compile
# helper 500s on OOM and on very large graphs; every ladder ends with small
# known-good configs). moe_dispatch 'batched' (the 3-D einsum form) has the lowest
# peak HBM but slower expert dots - it is the 512px mask-0 fallback (PERF.md).
STAGES = [
    # measured round 3 (lane flash): attn_moe onehot mb128 bare 231.4 img/s;
    # mb256 (K=1 IS the recipe step, optimizer in-step) 225.4 ~= the mb128
    # recipe extrapolation, but its graph takes 27 min to compile vs 4 - so
    # mb128 leads. Round-2 best unroll was 174.3; full 170.5.
    ("res256_mask75", 32, 0.75, 250_000,
     # flow16 (bf16 param/grad flow) is OFF every ladder: measured 2026-08-18,
     # the resident bf16 param tree (+2.33G all step) exceeds what the bf16
     # cotangents save at EVERY XL stage on a 16GB chip (stage-1 mb128 OOM
     # +598M, stage-4 mb8+EMA OOM +1.61G). It stays available for multi-chip
     # runs (sharded state) via train_step param_flow_dtype.
     # mb256 (225.4 img/s, K=1 IS the recipe) sits BELOW the hybrid fallback:
     # its graph is the 27-minute cold-compile worst case - as the first
     # fallback it could eat the driver's whole bench budget on a bad epoch
     (("attn_moe", 128, "onehot"), ("attn_moe", 128, "hybrid"),
      ("attn_moe", 256, "onehot"), ("attn_moe", 128), ("full", 128),
      ("dots_attn_moe", 64, "onehot"), ("dots_attn_moe", 64, "hybrid"),
      ("dots", 64), ("full", 64), ("full", 32), ("full", 16))),
    # measured round 3 (lane flash): attn_moe onehot mb64 102.4 img/s bare ~=
    # mb32 101.7 > dots_attn_moe mb16 94.5 (the pre-lane-flash leader) >
    # round-2 unroll 84.6-86.9. mb64 leads: K=4 recipe amortizes the optimizer
    # hardest, and its compile is the fastest of the probed set (180s).
    ("res256_mask0", 32, 0.0, 30_000,
     (("attn_moe", 64, "onehot"), ("attn_moe", 32, "onehot"),
      ("dots_attn_moe", 16, "onehot"), ("dots_attn_moe", 16, "hybrid"),
      ("dots_attn_moe", 16), ("dots_attn_moe_lean", 16),
      ("dots_attn_moe_xlean", 16), ("dots", 16), ("full", 16), ("full", 8))),
    # EMA (0.99975) is IN the benched step for the 512px stages. attn_moe
    # (save ONLY named attn/moe outputs) is both the fastest AND the only
    # fit next to the bf16 EMA buffer at these resolutions: measured with the
    # fused MoE bwd + lane flash kernels, attn_moe onehot + EMA mb32 = 64.7
    # img/s > mb16 = 59.7-60.1 (dots_attn_moe + EMA OOMs; alean family 44.3).
    # accum_pref "none" on the EMA-phase lead rungs: with the bf16 EMA buffer
    # resident, the bf16 grad accumulator OOMs the chip at RUNTIME (measured
    # RESOURCE_EXHAUSTED for both dispatch and scan) - device-HBM OOM is
    # deterministic, so skip the doomed compiles. The pre-EMA phase (no EMA
    # buffer) accumulates fine (PRE_EMA_LADDERS).
    ("res512_mask75", 64, 0.75, 50_000,
     # Round-4 lead rung (MEASURED 2026-08-19, sweep_r4/r4f): mb16 K=16
     # dispatch with the EMA in the apply graph (in-state bf16) = 69.37 img/s
     # TRUE recipe cadence - accumulator (2.33G) + EMA (2.33G) coexist at
     # mb16's smaller temps; at mb32 the same pair is RESOURCE_EXHAUSTED
     # (re-confirmed this round). The "offload" rung (HostEMA bit-packed in
     # pinned host RAM) ALSO runs true cadence at mb32 but measured 38.6: the
     # EMA round-trip executes on the device stream (~3s/cycle), erasing the
     # accumulation win - kept only as a fallback. K=1 host-EMA rungs
     # (accum_pref "none", 65.0) close the ladder.
     # flow16 rungs retired round-4: the per-grad-graph bf16 param transient
     # runtime-OOMs in dispatch mode at EVERY stage, even mask75-256px mb128
     # K=2 with no EMA resident (sweep_r4 probes 4-6, RESOURCE_EXHAUSTED).
     (("attn_moe", 16, "onehot"),
      ("attn_moe", 32, "onehot", "offload"),
      ("attn_moe", 32, "onehot", "none"), ("attn_moe", 16, "onehot", "none"),
      ("attn_moe", 16, "hybrid"),
      ("dots_attn_moe_alean", 16, "onehot"),
      ("dots_attn_moe_xlean_alean", 16, "hybrid"),
      ("dots_attn_moe", 16, "gather"),
      ("dots_attn_moe_xlean", 16), ("dots", 16), ("full", 8), ("full", 4))),
    ("res512_mask0", 64, 0.0, 55_000,
     # measured mb8 + bf16 EMA (fused MoE bwd + lane flash): attn_moe onehot
     # 23.48 img/s; dots_attn_moe + EMA OOMs (16.47G > 15.75G), alean 15.92.
     # mb16 leads the ladder untested: round-2's "mb16 needs 19.8G" predates
     # the fused MoE kernels (hiddens in VMEM) + attn_moe policy; if it fits,
     # halving the per-image optimizer share is worth ~+5% (stage-3 showed
     # mb32 > mb16 by 7.6%). A compile-OOM rejection costs one ladder step.
     # flow16 rungs removed: mb8 flow16 +EMA compile-OOMs at 17.36G/15.75G
     # (the resident bf16 param tree outweighs the halved grad traffic when
     # the EMA buffer is live). mb16 removed too: measured compile-OOM at
     # 17.28G/15.75G (+1.53G) even with the fused MoE kernels - the round-2
     # projection held. mb8 was the stage-4 single-chip ceiling WITH the EMA
     # buffer resident; the round-4 "offload" rungs (EMA packed in pinned
     # host RAM, TRUE recipe accumulation - see res512_mask75 note) retried
     # mb16 with the freed 2.33GB. Measured 2026-08-19 (sweep_r4): the
     # dots_attn_moe mb16 offload grads compile-OOM (80MB bf16 FFN-hidden
     # temps per block survive the policy at mb16) and flow16 runtime-OOMs
     # everywhere - both retired from the ladder.
     # (dots_attn_moe runtime-OOMs even at mb8 offload K=32, and mb16 offload
     # measured 18.3 img/s - the near-limit 14.95G/15.75G graph compiles to a
     # memory-pressure schedule slower per image than mb8 - both retired)
     # LEAD (measured 2026-08-19, full sweep of every EMA placement): the
     # K=1 + host-cadence-EMA leg at 23.9 img/s. TRUE-recipe K=32 variants,
     # all measured: no-EMA 26.48 (proves the accumulation), in-state EMA
     # RESOURCE_EXHAUSTED (acc 2.33G + EMA 2.33G don't fit at T=1024 temps),
     # offload EMA 20.9/18.3 (never/drain). The offload floor is PHYSICS,
     # not code: the EMA bytes (2.33G bf16) must cross PCIe both ways per
     # update = >=1.0s at the measured link (H2D 11.6, D2H 2.9 GB/s), vs the
     # 0.85s of AdamW that K=32 amortizes away - on ONE 16GB chip the
     # true-cadence leg can at best TIE the K=1 approximation (PERF.md round
     # 4). Multi-chip ZeRO-2 fits in-state fp32 EMA + accumulator at 13.4
     # GiB/device (MULTICHIP_CAPACITY.json) and runs the true recipe.
     # Round-5: the interleaved HostComputeEMA leg (lazy per-chunk staging)
     # measured 23.48 - the best TRUE-cadence leg, still behind the K=1 lead
     # (23.9): the decay D2H executes on the device stream wherever it is
     # dispatched, so the ledger is closed as roofline (PERF.md round 5).
     # It is the first fallback; the offload round-trip rungs follow.
     (("attn_moe", 8, "onehot", "none"),
      ("attn_moe", 8, "onehot", "hostcompute_interleave"),
      ("attn_moe", 8, "onehot", "offload"),
      ("attn_moe", 8, "onehot", "offload_drain"),
      ("attn_moe", 8, "hybrid", "none"),
      ("dots_attn_moe_alean", 8, "onehot"),
      ("dots_attn_moe_xlean_alean", 8, "hybrid"),
      ("dots_attn_moe", 8, "gather"), ("dots_attn_moe", 8, "batched"),
      ("dots_attn_moe_xlean", 8), ("full", 8), ("full", 4), ("full", 2))),
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


def _make_batch(mb, latent_res):
    return {
        "image_latents": jax.random.normal(
            jax.random.PRNGKey(1), (mb, 4, latent_res, latent_res)
        ),
        "caption_latents": jax.random.normal(
            jax.random.PRNGKey(2), (mb, 1, 77, 1024)
        ),
        "drop_caption_mask": jnp.ones((mb,)),
    }


def _time_step(step_fn, state, batch, rng, timed_steps, label):
    t0 = time.time()
    state, metrics = step_fn(state, batch, rng)
    # NOTE: through the axon relay, block_until_ready can return before the
    # computation finishes; a scalar VALUE fetch is the only reliable barrier.
    float(metrics["loss"])
    log(f"{label} compile+first step: {time.time() - t0:.0f}s")
    state, metrics = step_fn(state, batch, rng)  # warmup
    float(metrics["loss"])

    t0 = time.time()
    for _ in range(timed_steps):
        state, metrics = step_fn(state, batch, rng)
    final_loss = float(metrics["loss"])  # forces the whole step chain
    dt = (time.time() - t0) / timed_steps
    return dt, final_loss, state


def _run_config(name, latent_res, mask_ratio, policy, mb, timed_steps,
                moe_dispatch="onehot", use_ema=True, accum_pref=None,
                param_flow_dtype=None):
    """One ladder rung: build state, compile, time the RECIPE step semantics.

    The timed step is the reference's per-rank optimizer step: EMA on for
    stages 3/4 (res_512_pretrain.yaml ema block) and gradient accumulation over
    K = 256/mb microbatches (per-rank batch 2048/8, train.py:50). K=1 and K=2
    are timed directly; the K-step time extrapolates linearly in the microbatch
    leg, t(K) = t_update + K*t_micro, which is exact because every scan
    iteration runs the same graph. Round-2's bench timed the bare step (no EMA,
    update every mb images) - a few percent flattering (VERDICT weak #5); the
    bare number is still reported in the detail dict.

    Everything is local so a failure frees its device buffers when the frame
    dies (see bench_stage)."""
    dit = MicroDiT_XL_2(input_size=latent_res, remat=True, remat_policy=policy,
                        moe_dispatch=moe_dispatch)
    model = LatentDiffusion(
        dit=dit, latent_res=latent_res, train_mask_ratio=mask_ratio,
        latent_scale=1.0,
    )
    rng = jax.random.PRNGKey(0)
    ema = STAGE_EMA[name]["smoothing"] if (use_ema and name in STAGE_EMA) else None
    log(f"[{name}] creating XL params (remat={policy}, mb={mb}, "
        f"ema={'on' if ema else 'off'})...")
    params = fast_params(model, rng)

    sched = cosine_with_warmup(2.4e-4, 2500, 250_000, 0.33)
    # bf16 moments (fp32 update math): memory + HBM-traffic lever to fit AdamW
    # for 1.16B params in one chip's HBM; the multi-chip recipe shards optimizer
    # state instead (parallel/). Measured-best across all stages (PERF.md).
    tx = build_optimizer(params, sched, clip_norm=0.25,
                         low_precision_moments=True)
    # EMA storage: a second fp32 param copy (4.66GB) cannot fit next to params
    # (4.66) + bf16 moments (2.33) + stage-4 activations on 16GB; the bench
    # stores EMA in bf16 (fp32 decay math inside each update, optim.ema_update)
    # and reports it. Multi-chip recipes shard the state and keep fp32.
    # accum_pref "offload": the EMA tree lives OFF-chip (HostEMA: bf16
    # numerics bit-packed in pinned host RAM) - zero HBM residency, so the
    # bf16 dispatch accumulator fits and the stage runs TRUE recipe optimizer
    # cadence (VERDICT round-3 item 1). The state carries no ema_params; one
    # packed host round-trip per optimizer update (~1s for XL) is timed
    # inside the recipe cycle.
    # "offload" lets the EMA host round-trip overlap the next cycle's grad
    # compute; "offload_drain" value-fetch-drains in-flight executions first -
    # required where enqueue-time allocation of the flatten's output buffers
    # (full bf16 params copy) next to live step temps would OOM (stage-4 mb16,
    # sweep_r4 probe 7), at the cost of serializing ~1.2s of transfers.
    # "hostcompute"/"hostcompute_drain": fp32 EMA in pinned host RAM, decay
    # executed on the TPU host CPU (compute_on('device_host'), HostComputeEMA)
    # - only the one-way bf16 params D2H rides the device link per recipe
    # update. Measured round 4 (tune_results.jsonl, 2026-08-19): stage-4 mb8
    # K=32 = 23.26 img/s drained / 23.05 'never'-drain - the fastest
    # TRUE-recipe-cadence legs on one chip (offload round-trip: 20.4-20.9),
    # but still behind the K=1 host-cadence lead (23.9).
    # "hostcompute_interleave": the round-5 lever - chunk decays staged via
    # begin_update and dispatched one-per-grad-gap in the NEXT cycle, so the
    # one-way D2H hides behind grad compute instead of serializing after the
    # apply (the measured 'never'~=drained failure mode, PERF.md round 4 §2).
    offload = accum_pref in ("offload", "offload_drain", "hostcompute",
                             "hostcompute_drain", "hostcompute_interleave")
    in_state_ema = ema is not None and not offload
    state = create_train_state(params, tx, use_ema=in_state_ema,
                               ema_dtype=jnp.bfloat16)
    del params

    def _fresh_state():
        # Rebuild after a FAILED accumulation attempt: jits here donate the
        # TrainState, so a runtime failure (OOM at the value fetch) leaves
        # the old state's buffers deleted - reusing it would make every
        # subsequent attempt fail with 'Array has been deleted'.
        p = fast_params(model, rng)
        return create_train_state(p, tx, use_ema=in_state_ema,
                                  ema_dtype=jnp.bfloat16)

    k_recipe = max(1, PER_RANK_BATCH // mb)
    step_kwargs = {"param_flow_dtype": param_flow_dtype}
    if in_state_ema:
        step_kwargs.update(
            ema_smoothing=ema, ema_start=0, ema_update_interval=1)

    # K=1 leg. When accumulation is known-infeasible (accum_pref "none": the
    # bf16 grad accumulator OOMs next to the resident EMA buffer), this K=1
    # step IS the stage's final config - and the recipe's EMA cadence is one
    # update per optimizer update over 256 per-rank images (update_interval
    # 1ba, res_512_pretrain.yaml:4-9), so the cadence-faithful rate here is
    # one EMA per k_recipe steps. That EMA runs as its OWN host-dispatched
    # graph (make_ema_step): folding the skip into the step as a lax.cond
    # costs ~49MB of cond buffers - measured OOM at stage-4 mb8 (15.79G vs
    # 15.75G) where the plain no-EMA step fits; EMA-every-step costs ~11ms of
    # param+EMA HBM traffic per step, 256/mb times the recipe's share.
    host_ema = ema is not None and accum_pref == "none" and k_recipe > 1
    k1_fallback_tag = None
    k1_kwargs = dict(step_kwargs)
    if host_ema:
        for kk in ("ema_smoothing", "ema_start", "ema_update_interval"):
            k1_kwargs.pop(kk, None)
    step1 = jax.jit(
        make_train_step(model, tx, sched, microbatch_size=None, **k1_kwargs),
        donate_argnums=(0,),
    )
    try:
        dt1, loss1, state = _time_step(
            step1, state, _make_batch(mb, latent_res), rng, timed_steps,
            f"[{name}] K=1",
        )
    except Exception as e:  # noqa: BLE001 - compile 500 / OOM at value fetch
        # Compile-OOM projections are service-epoch dependent: the EMA-FREE
        # K=1 graph (host-EMA leg) was measured to 500 the remote compiler in
        # an epoch where the EMA-IN-STEP graph of the SAME config compiled and
        # ran (2026-08-18, stage-4 mb8 onehot). Before abandoning the rung,
        # retry with EMA folded back into the step at interval 1 - the
        # measured-good graph that the persistent cache most likely holds.
        if not host_ema:
            raise
        log(f"[{name}] host-EMA K=1 graph failed ({str(e)[:100]}); "
            f"retrying with in-step EMA")
        host_ema = False
        accum_pref = "none"  # rung already declared accumulation infeasible
        k1_fallback_tag = "k1_instep_ema"
        k1_kwargs = dict(step_kwargs)
        state = None
        gc.collect()
        state = _fresh_state()
        step1 = jax.jit(
            make_train_step(model, tx, sched, microbatch_size=None,
                            **k1_kwargs),
            donate_argnums=(0,),
        )
        dt1, loss1, state = _time_step(
            step1, state, _make_batch(mb, latent_res), rng, timed_steps,
            f"[{name}] K=1 (in-step EMA)",
        )
    bare_img_s = mb / dt1
    log(f"[{name}] remat={policy} mb{mb} K=1: {dt1 * 1e3:.1f} ms = "
        f"{bare_img_s:.1f} img/s (loss {loss1:.4f})")

    if k_recipe == 1:
        return bare_img_s, bare_img_s, mb, "none"
    if offload and ema is not None:
        hostcompute = accum_pref.startswith("hostcompute")
        cls = HostComputeEMA if hostcompute else HostEMA
        t0 = time.time()
        hema = cls(state.params, ema)
        hema.block()
        log(f"[{name}] {cls.__name__}: {len(hema.chunks)} host chunks "
            f"({time.time() - t0:.0f}s)")
        drain = accum_pref.endswith("_drain")
        interleave = accum_pref == "hostcompute_interleave"
        recipe_img_s, loss_d, state = _time_dispatch_recipe(
            model, tx, sched, state, mb, k_recipe, latent_res,
            step_kwargs, rng, name, host_ema=hema, ema_drain=drain,
            ema_interleave=interleave,
        )
        tag = "hostcompute" if hostcompute else "hostema"
        if interleave:
            tag += "_interleave"
        log(f"[{name}] remat={policy} mb{mb} dispatch K={k_recipe} "
            f"+ {tag} EMA{' (drained)' if drain else ''}: "
            f"{recipe_img_s:.1f} img/s recipe "
            f"(bare {bare_img_s:.1f}, loss {loss_d:.4f})")
        return (recipe_img_s, bare_img_s, mb,
                f"dispatch_k{k_recipe}_bf16_{tag}"
                + ("_drain" if drain else ""))
    if k1_fallback_tag:
        # In-step EMA applied every step (not the recipe's per-update cadence):
        # the bare number IS the recipe number, conservatively.
        return bare_img_s, bare_img_s, mb, k1_fallback_tag
    if host_ema:
        ema_fn = jax.jit(make_ema_step(ema), donate_argnums=(0,))
        state = ema_fn(state)
        float(jax.tree.leaves(state.ema_params)[0].reshape(-1)[0])  # compile
        t0 = time.time()
        for _ in range(4):
            state = ema_fn(state)
        float(jax.tree.leaves(state.ema_params)[0].reshape(-1)[0])
        dt_ema = (time.time() - t0) / 4
        t_cycle = k_recipe * dt1 + dt_ema
        recipe_img_s = k_recipe * mb / t_cycle
        log(f"[{name}] remat={policy} mb{mb} host-EMA every {k_recipe} steps: "
            f"ema {dt_ema * 1e3:.1f} ms -> {recipe_img_s:.1f} img/s recipe "
            f"(bare {bare_img_s:.1f})")
        return recipe_img_s, bare_img_s, mb, f"k1_host_ema_int{k_recipe}"
    # Split-dispatch accumulation FIRST: K small grad graphs + one apply graph
    # per optimizer step, timed directly (no extrapolation). The scanned
    # whole-step accumulation graph 500s the remote compile helper for most XL
    # stages (service-epoch dependent), while the dispatch graphs are a
    # fraction of its size and compile reliably; relay dispatch overhead is
    # measured-zero (PERF.md round 2). bf16 accumulator: the params-sized fp32
    # carry does not fit single-chip; semantics proven scan-identical in
    # tests/test_train.py.
    if accum_pref != "none":
        try:
            recipe_img_s, loss_d, state = _time_dispatch_recipe(
                model, tx, sched, state, mb, k_recipe, latent_res,
                step_kwargs, rng, name,
            )
            log(
                f"[{name}] remat={policy} mb{mb} dispatch K={k_recipe}: "
                f"{recipe_img_s:.1f} img/s recipe (bare {bare_img_s:.1f}, "
                f"loss {loss_d:.4f})"
            )
            return recipe_img_s, bare_img_s, mb, f"dispatch_k{k_recipe}_bf16"
        except Exception as e:  # noqa: BLE001 - OOM surfaces at value fetch
            log(f"[{name}] dispatch accumulation infeasible: {str(e)[:120]}")
            state = None
            gc.collect()
            state = _fresh_state()
    # K=2 scan-accumulated step: t(K) = t_update + K*t_micro. The recipe step
    # AMORTIZES the optimizer+EMA cost (~39ms for XL) over K microbatches, so
    # at K>=16 it beats the bare step per image. The grad accumulator is a
    # params-sized carry: fp32 (4.66GB, Composer-exact) is tried first; if the
    # chip can't fit it, the bf16 accumulator (2.33GB, fp32 mean/clip/update
    # math - see make_train_step) is the single-chip configuration. If neither
    # fits, the stage reports the K=1 number and marks accumulation
    # infeasible: the K=1 step IS a valid single-chip training step (update
    # every mb images), just not the reference's 2048-batch semantics.
    # accum_pref prunes the K=2 dtype ladder: "bf16" skips the fp32 attempt
    # (measured OOM on this chip for every XL stage - each skipped attempt
    # saves a 2-3 min compile), "none" skips K-probing entirely (known-OOM
    # rungs report the honest K=1 marker directly).
    attempts = ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16"))
    if accum_pref == "bf16":
        attempts = ((jnp.bfloat16, "bf16"),)
    elif accum_pref == "none":
        attempts = ()
        log(f"[{name}] K-probing skipped (known-OOM accumulator)")
    dt2 = loss2 = acc_tag = None
    for acc_dtype, tag in attempts:
        try:
            step2 = jax.jit(
                make_train_step(model, tx, sched, microbatch_size=mb,
                                accum_dtype=acc_dtype, **step_kwargs),
                donate_argnums=(0,),
            )
            dt2, loss2, state = _time_step(
                step2, state, _make_batch(2 * mb, latent_res), rng, timed_steps,
                f"[{name}] K=2 ({tag} accum)",
            )
            acc_tag = tag
            break
        except Exception as e:  # noqa: BLE001 - OOM/compile fail at value fetch
            log(f"[{name}] K=2 {tag}-accum infeasible: {str(e)[:120]}")
            state = None
            gc.collect()
            state = _fresh_state()
    if dt2 is None:
        return bare_img_s, bare_img_s, mb, "infeasible_single_chip"
    t_micro = dt2 - dt1  # one fwd+bwd+accumulate leg
    if t_micro <= 0:  # noise guard: fall back to the conservative reading
        t_micro = dt2 / 2
    t_update = max(dt2 - 2 * t_micro, 0.0)
    t_full = t_update + k_recipe * t_micro
    recipe_img_s = k_recipe * mb / t_full
    log(
        f"[{name}] remat={policy} mb{mb} K=2: {dt2 * 1e3:.1f} ms -> recipe "
        f"K={k_recipe}: {t_full * 1e3:.1f} ms = {recipe_img_s:.1f} img/s "
        f"(bare {bare_img_s:.1f}, loss {loss2:.4f})"
    )
    return recipe_img_s, bare_img_s, mb, f"scan_k{k_recipe}_{acc_tag}"


def _time_dispatch_recipe(model, tx, sched, state, mb, k_recipe, latent_res,
                          step_kwargs, rng, name, host_ema=None,
                          ema_drain=False, ema_interleave=False):
    """Time the recipe step in split-dispatch mode: K grad dispatches into a
    donated bf16 accumulator + one optimizer/EMA apply. With ``host_ema`` (a
    HostEMA), the recipe's per-update EMA runs as a packed pinned-host
    round-trip after the apply - its transfer time is inside the timed window
    (final block() barrier). ``ema_interleave`` (HostComputeEMA only): instead
    of enqueuing all chunk decays right after the apply (measured to serialize
    on the device stream: 'never'~=drained, tune_results.jsonl), stage them
    with begin_update and dispatch ONE chunk decay between successive grad
    dispatches of the NEXT cycle so each one-way D2H rides the gaps (VERDICT
    r4 next-round #4). Returns (recipe_img_s, loss, state); raises on
    compile/OOM failure."""
    step_kwargs = dict(step_kwargs)
    flow_dtype = step_kwargs.pop("param_flow_dtype", None)
    grad_fn = jax.jit(make_grad_step(model, param_flow_dtype=flow_dtype),
                      donate_argnums=(1,))
    # Donate the accumulator too: it is consumed by apply_step, and keeping
    # its 2.33GB (bf16, XL) alive as a read-only input denies XLA that space
    # for optimizer temps - measured runtime RESOURCE_EXHAUSTED at stage-3
    # mb32 K=8 (2026-08-18) where the same cycle fit with the buffer freed.
    apply_fn = jax.jit(make_apply_step(tx, sched, **step_kwargs),
                       static_argnums=(2,), donate_argnums=(0, 1))
    # ONE jitted dispatch for the zeroed accumulator: eagerly materializing
    # ~10^3 per-tensor zeros costs ~0.15ms/op through the axon relay
    # (+150-220ms/cycle, measured - it erased the amortization win).
    zero_fn = jax.jit(
        lambda p: zero_grad_accumulator(p, jnp.bfloat16)
    )
    mbatch = _make_batch(mb, latent_res)
    staged = [None]  # previous cycle's StagedEMAUpdate (interleave mode)

    def cycle(state, i):
        acc = zero_fn(state.params)
        r = jax.random.fold_in(rng, i)
        for idx in range(k_recipe):
            acc = grad_fn(state.params, acc, mbatch, r, idx)
            if staged[0] is not None:
                staged[0].tick()  # one chunk decay rides this gap
        if staged[0] is not None:
            staged[0].drain()  # leftovers before the donating apply
        state, m = apply_fn(state, acc, k_recipe)
        if host_ema is not None:
            if ema_drain:
                # Drain in-flight executions first: the EMA flatten's output
                # buffers (full bf16 params copy) allocate at ENQUEUE time,
                # and next to the grad graph's live temps that OOMs at the
                # stage-4 mb16 peak (sweep_r4 probe 7). Without the drain the
                # transfers overlap the next cycle's grad compute instead.
                float(m["loss"])
            # recipe cadence: one EMA update per optimizer update, against
            # the POST-update params (reference update_interval 1ba)
            if ema_interleave:
                staged[0] = host_ema.stage_update(state.params, lazy=True)
            else:
                host_ema.update(state.params)
        return state, m

    t0 = time.time()
    state, m = cycle(state, 0)
    float(m["loss"])  # value fetch = the only reliable barrier (relay)
    if host_ema is not None:
        host_ema.block()
    log(f"[{name}] dispatch K={k_recipe} compile+first cycle: "
        f"{time.time() - t0:.0f}s")
    state, m = cycle(state, 1)
    float(m["loss"])  # warmup
    if host_ema is not None:
        host_ema.block()
    cycles = 2 if k_recipe >= 8 else 4
    t0 = time.time()
    for i in range(cycles):
        state, m = cycle(state, 2 + i)
    loss = float(m["loss"])
    if host_ema is not None:
        host_ema.block()  # include the in-flight EMA transfers in the window
    t_full = (time.time() - t0) / cycles
    return k_recipe * mb / t_full, loss, state


def bench_stage(name, latent_res, mask_ratio, config_ladder, timed_steps,
                use_ema=True):
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
        accum_pref = cfg[3] if len(cfg) > 3 else None
        # 5th element "flow16": bf16 param/grad flow (make_train_step
        # param_flow_dtype) - one cast outside the remat regions, bf16 grads,
        # fp32 update math (trajectory equivalence: tests/test_train.py)
        flow = jnp.bfloat16 if (len(cfg) > 4 and cfg[4] == "flow16") else None
        try:
            recipe_img_s, bare_img_s, mb, accum = _run_config(
                name, latent_res, mask_ratio, policy, mb, timed_steps,
                moe_dispatch=moe, use_ema=use_ema, accum_pref=accum_pref,
                param_flow_dtype=flow,
            )
            return (recipe_img_s, bare_img_s, mb, policy, moe, accum,
                    "bf16" if flow is not None else "fp32")
        except Exception as e:  # OOM / remote-compile 500 -> next config
            log(f"[{name}] config (remat={policy}, mb={mb}) failed: {str(e)[:120]}")
        # A failed rung's 9GB of params/opt-state must be off the chip before
        # the next rung allocates: drop the exception frame refs and collect.
        gc.collect()
    raise RuntimeError(f"{name}: all configs failed")


# Sampling legs (VERDICT round-3 item 5): the 30-step CFG-5 generate() path -
# what the 30k-image FID run and the reference demo exercise
# (/root/reference/micro_diffusion/models/model.py:299-353; 30 Heun steps =
# 59 CFG-doubled DiT forwards per image + one VAE decode). Batch ladders are
# the tuning pass: larger batches amortize the per-step host dispatch and fill
# the MXU; the first batch that fits wins.
SAMPLING_CONFIGS = [
    ("sample_256px", 32, 256, (32, 16, 8)),
    ("sample_512px", 64, 512, (16, 8, 4)),
]


def _run_sampling(name, latent_res, px, bs, timed_runs):
    from micro_diffusion_tpu.models.vae import AutoencoderKL

    dit = MicroDiT_XL_2(input_size=latent_res)  # inference: no remat
    model = LatentDiffusion(
        dit=dit, latent_res=latent_res, train_mask_ratio=0.0,
        latent_scale=0.13025,
    )
    params = fast_params(model, jax.random.PRNGKey(0))
    emb = jax.random.normal(jax.random.PRNGKey(3), (bs, 1, 77, 1024))

    def sample():
        return model.generate(
            params, text_embeddings=emb, guidance_scale=5.0,
            num_inference_steps=30, seed=7, return_only_latents=True,
        )

    t0 = time.time()
    lat = sample()
    float(lat.reshape(-1)[0])  # value fetch = the only reliable barrier
    log(f"[{name}] bs{bs} sampler compile+first: {time.time() - t0:.0f}s")
    t0 = time.time()
    for _ in range(timed_runs):
        lat = sample()
    float(lat.reshape(-1)[0])
    dt_sample = (time.time() - t0) / timed_runs

    # VAE decode (SDXL-VAE architecture, synthetic weights - parameter VALUES
    # don't affect conv throughput). bf16 compute = reference parity (the
    # reference loads the VAE with torch_dtype=bfloat16, model.py:379-382).
    vae = AutoencoderKL(compute_dtype=jnp.bfloat16)
    t0 = time.time()
    vae.init(jax.random.PRNGKey(1), image_size=px)
    img = vae.decode(lat / model.latent_scale)
    float(img.reshape(-1)[0])
    log(f"[{name}] VAE init+decode compile: {time.time() - t0:.0f}s")
    t0 = time.time()
    for _ in range(timed_runs):
        img = vae.decode(lat / model.latent_scale)
    float(img.reshape(-1)[0])
    dt_vae = (time.time() - t0) / timed_runs

    img_s = bs / (dt_sample + dt_vae)
    rec = {
        "img_per_sec_per_chip": round(img_s, 3),
        "batch": bs,
        "steps": 30,
        "guidance_scale": 5.0,
        "sampler_ms_per_image": round(dt_sample / bs * 1e3, 1),
        "vae_decode_ms_per_image": round(dt_vae / bs * 1e3, 1),
        "fid30k_wallclock_hours": round(30_000 / img_s / 3600, 2),
    }
    log(f"[{name}] bs{bs}: sampler {dt_sample * 1e3:.0f} ms + vae "
        f"{dt_vae * 1e3:.0f} ms = {img_s:.2f} img/s "
        f"(30k-image FID: {rec['fid30k_wallclock_hours']:.1f} h)")
    return rec


def bench_sampling(timed_runs=3):
    results = {}
    for name, latent_res, px, ladder in SAMPLING_CONFIGS:
        for bs in ladder:
            try:
                results[name] = _run_sampling(name, latent_res, px, bs,
                                              timed_runs)
                break
            except Exception as e:  # noqa: BLE001 - OOM/compile at value fetch
                log(f"[{name}] bs{bs} failed: {str(e)[:120]}")
                gc.collect()
    return results


def _build_out(results, quick, n_total, sampling=None, partial=False):
    """Assemble the result JSON over the stages measured SO FAR. Partial
    outputs weight over measured stages only and say so in the metric name -
    a timeout mid-ladder still yields an authoritative number for what ran."""
    if not results:
        return None
    if quick:
        value = results["res256_mask75"]["img_per_sec_per_chip"]
        metric = ("MicroDiT-XL stage1 (256px mask0.75) recipe-step train "
                  "images/sec/chip")
    else:
        total_images = sum(r["schedule_steps"] * 2048 for r in results.values())
        total_time = sum(
            r["schedule_steps"] * 2048 / r["img_per_sec_per_chip"]
            for r in results.values()
        )
        value = total_images / total_time
        metric = ("MicroDiT-XL 4-stage schedule-weighted recipe-step train "
                  "images/sec/chip")
        if partial and len(results) < n_total:
            metric += f" (PARTIAL: {len(results)}/{n_total} stages measured)"
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
    if partial:
        out["partial"] = True
    if sampling:
        out["detail"]["sampling"] = sampling
    return out


def main():
    t_start = time.time()
    quick = os.environ.get("MDT_BENCH_QUICK") == "1"
    timed_steps = int(os.environ.get("MDT_BENCH_STEPS", "10"))
    budget = float(os.environ.get("MDT_BENCH_BUDGET_S", "3600"))
    stages = STAGES[:1] if quick else STAGES
    only = os.environ.get("MDT_BENCH_STAGES")  # csv filter, e.g. "res512_mask75"
    if only:
        keep = set(only.split(","))
        stages = [s for s in stages if s[0] in keep]

    results = {}
    sampling = {}
    snap = {"final_emitted": False}

    def emit_partial(reason, from_signal=False):
        """Print the current partial result line (driver-survivability: a
        timeout/kill mid-run must still yield the weighted metric over the
        stages measured so far - BENCH_r04.json lost everything to rc=124).
        Signal path writes with os.write (async-signal-safe): a SIGTERM
        landing mid-print would otherwise die on the reentrant
        BufferedWriter and lose the line entirely."""
        if snap["final_emitted"]:
            return
        out = _build_out(results, quick, len(stages),
                         sampling=sampling or None, partial=True)
        if out is None:
            return
        line = json.dumps(out) + "\n"
        if from_signal:
            os.write(2, f"[bench] partial emit ({reason})\n".encode())
            os.write(1, line.encode())
        else:
            log(f"[bench] emitting partial result ({reason}): "
                f"{len(results)}/{len(stages)} stages")
            print(line, end="", flush=True)

    def on_sigterm(signum, frame):  # noqa: ARG001
        emit_partial(f"signal {signum}", from_signal=True)
        os._exit(0)

    prev_handlers = {
        s: signal.signal(s, on_sigterm)
        for s in (signal.SIGTERM, signal.SIGINT)
    }
    atexit.register(lambda: emit_partial("atexit"))

    def remaining():
        return budget - (time.time() - t_start)

    def trim(ladder, label):
        """Budget-aware ladder trimming: with little wall budget left, only
        the lead rung (+1 fallback) gets a shot - a cold lead-rung compile is
        164-230s (BENCH_r04 tail), so a deep fallback walk cannot finish."""
        r = remaining()
        if r < 0.18 * budget and len(ladder) > 1:
            log(f"[{label}] budget tight ({r:.0f}s left): lead rung only")
            return ladder[:1]
        if r < 0.45 * budget and len(ladder) > 2:
            log(f"[{label}] budget low ({r:.0f}s left): lead + 1 fallback")
            return ladder[:2]
        return ladder

    try:
        _run_stages(stages, results, sampling, timed_steps, quick, trim,
                    remaining, budget, emit_partial)
        out = _build_out(results, quick, len(stages),
                         sampling=sampling or None, partial=False)
        snap["final_emitted"] = True
        print(json.dumps(out), flush=True)
    finally:
        # restore pre-existing handlers even when a stage raises: in-process
        # callers (tests) must not be left with a handler that os._exit(0)s
        # their interpreter on Ctrl+C (round-5 review finding)
        for s, h in prev_handlers.items():
            signal.signal(s, h)


def _run_stages(stages, results, sampling, timed_steps, quick, trim,
                remaining, budget, emit_partial):
    for name, res, mask, steps, ladder in stages:
        img_s, bare, mb, policy, moe, accum, flow = bench_stage(
            name, res, mask, trim(ladder, name), timed_steps
        )
        detail = {
            "bare_step_img_per_sec": bare,
            "microbatch": mb, "remat": policy, "moe_dispatch": moe,
            "ema": name in STAGE_EMA,
            "accum": accum, "param_flow": flow,
        }
        # Two-phase stage: before ema_start the EMA buffer doesn't exist
        # (reference ema_start semantics), so that fraction of the schedule
        # runs the pre-EMA ladder; the stage number is the step-weighted
        # harmonic combination.
        start_frac = STAGE_EMA.get(name, {}).get("start_frac", 0.0)
        if name in PRE_EMA_LADDERS and start_frac >= 0.05:
            (pre_img_s, pre_bare, pre_mb, pre_policy, pre_moe, pre_accum,
             pre_flow) = (
                bench_stage(name, res, mask,
                            trim(PRE_EMA_LADDERS[name], f"{name}-preema"),
                            timed_steps, use_ema=False)
            )
            img_s = 1.0 / (
                start_frac / pre_img_s + (1.0 - start_frac) / img_s
            )
            detail["pre_ema_phase"] = {
                "frac": round(start_frac, 3),
                "img_per_sec_per_chip": round(pre_img_s, 2),
                "bare_step_img_per_sec": round(pre_bare, 2),
                "microbatch": pre_mb, "remat": pre_policy,
                "moe_dispatch": pre_moe, "accum": pre_accum,
                "param_flow": pre_flow,
            }
        # MFU: model FLOPs (3x fwd, excluding remat recompute) / peak
        mfu = 3 * stage_fwd_gflops_per_sample(res, mask) * img_s / (
            V5E_PEAK_BF16_TFLOPS * 1e3
        )
        results[name] = {
            "img_per_sec_per_chip": img_s,  # recipe semantics (EMA + accum)
            **detail,
            "schedule_steps": steps, "est_mfu": round(mfu, 3),
        }
        if len(results) < len(stages):
            emit_partial(f"stage {name} done")

    # Sampling legs (generate() throughput; VERDICT round-3 item 5). Off in
    # quick mode, via MDT_BENCH_SAMPLING=0, and when the budget is nearly
    # spent; failures never sink the training metric.
    if (not quick and os.environ.get("MDT_BENCH_SAMPLING", "1") != "0"
            and remaining() > 0.12 * budget):
        try:
            sampling.update(bench_sampling(timed_runs=3))
        except Exception as e:  # noqa: BLE001
            log(f"[sampling] legs failed: {str(e)[:160]}")
    elif not quick:
        log(f"[sampling] skipped (budget: {remaining():.0f}s left)")


if __name__ == "__main__":
    main()
