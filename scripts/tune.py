"""Single-config train-step throughput probe for the 4 recipe stages (run on TPU).

Run one (stage, remat, microbatch, accum, nu_dtype) config, time the jit'd train step
with a value-fetch barrier (block_until_ready does not block through the axon relay),
and append one JSON line to tune_results.jsonl. Designed to be driven serially by
scripts/sweep_r2.sh with each config in its own subprocess so a compile crash / OOM
can't kill the sweep.

  python scripts/tune.py --stage res512_mask0 --remat dots --mb 8 --nu bf16
  python scripts/tune.py --stage res256_mask75 --remat full --mb 64 --accum 4
  python scripts/tune.py --stage res256_mask75 --fwd-flops   # XLA cost_analysis of fwd

Notes:
  * accum k: batch = k*mb, lax.scan over k microbatches, ONE optimizer update - the
    reference's Composer semantics (device_train_microbatch_size vs per-rank batch).
  * --fwd-flops compiles the fwd loss alone and records XLA cost_analysis flops, the
    ground truth for MFU accounting (VERDICT.md weak #2).
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # configures the persistent compilation cache at import
from micro_diffusion_tpu.models.diffusion import LatentDiffusion
from micro_diffusion_tpu.models.dit import MicroDiT_XL_2
from micro_diffusion_tpu.train import (
    build_optimizer,
    create_train_state,
    make_apply_step,
    make_grad_step,
    make_train_step,
    zero_grad_accumulator,
)
from micro_diffusion_tpu.train.optim import cosine_with_warmup

STAGES = {
    "res256_mask75": (32, 0.75),
    "res256_mask0": (32, 0.0),
    "res512_mask75": (64, 0.75),
    "res512_mask0": (64, 0.0),
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(rec):
    rec["ts"] = time.strftime("%H:%M:%S")
    line = json.dumps(rec)
    print(line)
    with open(os.path.join(os.path.dirname(__file__), "..", "tune_results.jsonl"), "a") as f:
        f.write(line + "\n")


def build(stage, remat, mb, moe="onehot", attn="auto", xattn=None):
    res, mask = STAGES[stage]
    dit = MicroDiT_XL_2(
        input_size=res,
        remat=(remat != "none"),
        remat_policy=remat if remat != "none" else "full",
        moe_dispatch=moe,
        attention_impl=attn,
        xattn_attention_impl=xattn,
    )
    model = LatentDiffusion(
        dit=dit, latent_res=res, train_mask_ratio=mask, latent_scale=1.0
    )
    rng = jax.random.PRNGKey(0)
    params = bench.fast_params(model, rng)
    return model, params, rng


def make_batch(mb, res):
    return {
        "image_latents": jax.random.normal(jax.random.PRNGKey(1), (mb, 4, res, res)),
        "caption_latents": jax.random.normal(jax.random.PRNGKey(2), (mb, 1, 77, 1024)),
        "drop_caption_mask": jnp.ones((mb,)),
    }


def measure_fwd_flops(stage):
    """XLA cost_analysis flops of the fwd EDM loss (per sample) - ground-truth MFU base."""
    res, _ = STAGES[stage]
    model, params, rng = build(stage, "none", 1)
    batch = make_batch(1, res)

    def loss_fn(params, rng, b):
        loss, _, _ = model.forward(params, rng, b, train=True)
        return loss

    lowered = jax.jit(loss_fn).lower(params, rng, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    emit({"kind": "fwd_flops", "stage": stage, "flops_per_sample": flops,
          "gflops_per_sample": flops / 1e9})
    log(f"[{stage}] fwd cost_analysis: {flops / 1e9:.2f} GFLOP/sample")


def run_breakdown(args):
    """Time fwd-only, fwd+bwd, and full step separately to locate the overhead."""
    res, mask = STAGES[args.stage]
    model, params, rng = build(args.stage, args.remat, args.mb, args.moe, args.attn, args.xattn)
    batch = make_batch(args.mb, res)

    def loss_fn(params, rng, b):
        loss, _, _ = model.forward(params, rng, b, train=True)
        return loss

    fwd = jax.jit(loss_fn)

    def _fwd_bwd(p, r, b):
        import optax

        # reduce over every grad leaf so XLA can't dead-code-eliminate the backward
        loss, grads = jax.value_and_grad(loss_fn)(p, r, b)
        return loss + 0.0 * optax.global_norm(grads)

    fwd_bwd = jax.jit(_fwd_bwd)

    out = {"kind": "breakdown", "stage": args.stage, "remat": args.remat,
           "mb": args.mb}
    for name, fn in (("fwd", fwd), ("fwd_bwd", fwd_bwd)):
        t0 = time.time()
        float(fn(params, rng, batch))
        log(f"[{name}] compile+first: {time.time() - t0:.0f}s")
        float(fn(params, rng, batch))
        t0 = time.time()
        for _ in range(args.steps):
            loss = fn(params, rng, batch)
        float(loss)
        out[f"{name}_ms"] = round((time.time() - t0) / args.steps * 1e3, 1)
        log(f"[{name}] {out[f'{name}_ms']} ms")
    emit(out)


def run_inner(args):
    """K chained train steps inside ONE jit (lax.scan): pure device time without
    per-dispatch relay overhead. Compare ms/step against the dispatch-loop number."""
    res, mask = STAGES[args.stage]
    model, params, rng = build(args.stage, args.remat, args.mb, args.moe, args.attn, args.xattn)
    sched = cosine_with_warmup(2.4e-4, 2500, 250_000, 0.33)
    tx = build_optimizer(
        params, sched, clip_norm=0.25,
        mu_dtype=jnp.bfloat16 if args.nu == "fp32" else None,
        low_precision_moments=(args.nu == "bf16"),
    )
    state = create_train_state(params, tx)
    del params
    step = make_train_step(model, tx, sched, microbatch_size=None)
    batch = make_batch(args.mb, res)
    k = args.inner

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batch, rng):
        def body(s, i):
            s2, m = step(s, batch, jax.random.fold_in(rng, i))
            return s2, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(k))

    t0 = time.time()
    state, losses = multi_step(state, batch, rng)
    float(losses[-1])
    log(f"compile+first {k}-step chain: {time.time() - t0:.0f}s")
    t0 = time.time()
    state, losses = multi_step(state, batch, rng)
    final = float(losses[-1])
    dt = (time.time() - t0) / k
    emit({"kind": "inner", "stage": args.stage, "remat": args.remat, "mb": args.mb,
          "nu": args.nu, "inner_k": k, "ms_per_step": round(dt * 1e3, 1),
          "img_per_sec": round(args.mb / dt, 2), "loss": round(final, 4)})
    log(f"{dt * 1e3:.1f} ms/device-step = {args.mb / dt:.1f} img/s")


def run_profile(args):
    """jax.profiler trace of the train step; parse the xplane and print the top ops
    by device time (tensorboard_plugin_profile/tensorflow are in the image)."""
    import glob

    res, mask = STAGES[args.stage]
    model, params, rng = build(args.stage, args.remat, args.mb, args.moe, args.attn, args.xattn)
    sched = cosine_with_warmup(2.4e-4, 2500, 250_000, 0.33)
    tx = build_optimizer(params, sched, clip_norm=0.25,
                         low_precision_moments=(args.nu == "bf16"),
                         mu_dtype=jnp.bfloat16 if args.nu == "fp32" else None)
    state = create_train_state(params, tx)
    del params
    step_fn = jax.jit(make_train_step(model, tx, sched, microbatch_size=None),
                      donate_argnums=(0,))
    batch = make_batch(args.mb, res)
    t0 = time.time()
    state, metrics = step_fn(state, batch, rng)
    float(metrics["loss"])  # compile + warm
    log(f"[profile] compile+first step: {time.time() - t0:.0f}s")

    trace_dir = os.path.join(os.path.dirname(__file__), "..", "profile_trace",
                             f"{args.stage}_{args.remat}_{args.mb}")
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, metrics = step_fn(state, batch, rng)
        float(metrics["loss"])
        log("[profile] traced steps done; stopping trace (xplane download "
            "through the relay can take minutes)...")

    log("[profile] trace written; parsing xplane...")
    planes = summarize_xplane(trace_dir)
    emit({"kind": "profile", "stage": args.stage, "remat": args.remat,
          "mb": args.mb, "planes": planes})


def summarize_xplane(trace_dir):
    """Aggregate device-plane op durations from the newest .xplane.pb under dir
    (first-party wire-format parser; the image's TF/plugin converter is broken)."""
    import glob
    import re

    from xplane_summary import parse_xspace

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        return {"error": "no xplane.pb written"}
    with open(paths[-1], "rb") as f:
        planes = parse_xspace(f.read())
    out = {}
    for plane in planes:
        totals = {}
        n_events = 0
        for _line_name, events in plane["lines"]:
            for mid, dur in events:
                n_events += 1
                nm = plane["event_meta"].get(mid, f"#{mid}")
                if re.fullmatch(r"\d+", nm):
                    continue
                totals[nm] = totals.get(nm, 0) + dur
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
        out[plane["name"]] = {
            "events": n_events,
            "top_ops_ms": [(n[:140], round(ps / 1e9, 3)) for n, ps in top],
        }
    return out


def run_matmul_peak(args):
    """Roofline calibration: achieved TFLOPS on plain big bf16 matmuls + HBM GB/s on
    a copy - measures what this chip actually delivers through the relay."""
    results = {}
    for n in (4096, 8192):
        a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

        @jax.jit
        def chain(a, b):
            def body(x, _):
                return jax.lax.dot(x, b, preferred_element_type=jnp.bfloat16), ()
            y, _ = jax.lax.scan(body, a, None, length=20)
            return jnp.float32(y[0, 0])

        t0 = time.time()
        float(chain(a, b))
        log(f"matmul {n}: compile {time.time() - t0:.0f}s")
        t0 = time.time()
        float(chain(a, b))
        dt = time.time() - t0
        tflops = 20 * 2 * n**3 / dt / 1e12
        results[f"matmul_{n}_tflops"] = round(tflops, 1)
        log(f"matmul {n}x{n}x{n} x20: {dt * 1e3:.1f} ms = {tflops:.1f} TFLOPS")

    c = jax.random.normal(jax.random.PRNGKey(2), (1 << 28,), jnp.float32)  # 1GB

    @jax.jit
    def copy_chain(x):
        def body(x, _):
            return x * 1.000001, ()
        y, _ = jax.lax.scan(body, x, None, length=20)
        return y[0]

    t0 = time.time()
    float(copy_chain(c))
    t0 = time.time()
    float(copy_chain(c))
    dt = time.time() - t0
    gbs = 20 * 2 * c.nbytes / dt / 1e9
    results["hbm_gbps"] = round(gbs, 0)
    log(f"HBM r+w: {gbs:.0f} GB/s")
    emit({"kind": "matmul_peak", **results})


def dump_hlo(args):
    """Write the OPTIMIZED HLO of the jit'd train step to a file (chipless AOT
    compile) - for tracking profiler top-ops back to source (metadata op_name)."""
    res, mask = STAGES[args.stage]
    model, params, rng = build(args.stage, args.remat, args.mb, args.moe, args.attn, args.xattn)
    sched = cosine_with_warmup(2.4e-4, 2500, 250_000, 0.33)
    tx = build_optimizer(
        params, sched, clip_norm=0.25,
        mu_dtype=jnp.bfloat16 if args.nu == "fp32" else None,
        low_precision_moments=(args.nu == "bf16"),
    )
    state = create_train_state(params, tx)
    del params
    batch = make_batch(args.mb, res)
    step_fn = jax.jit(make_train_step(model, tx, sched, microbatch_size=None),
                      donate_argnums=(0,))
    txt = step_fn.lower(state, batch, rng).compile().as_text()
    path = os.path.join(os.path.dirname(__file__), "..",
                        f"hlo_{args.stage}_{args.remat}_{args.mb}.txt")
    with open(path, "w") as f:
        f.write(txt)
    log(f"wrote {path} ({len(txt) / 1e6:.1f} MB)")


def run(args):
    # validate interleave UP FRONT (not just in the dispatch branch): a scan
    # or accum=1 run with --ema-drain interleave would otherwise silently
    # measure non-interleave semantics and mislabel the tune_results row
    if args.ema_drain == "interleave" and not (
            args.ema and args.ema_mode == "hostcompute"
            and args.accum > 1 and args.accum_mode == "dispatch"):
        raise SystemExit(
            "--ema-drain interleave requires --ema --ema-mode hostcompute "
            "--accum-mode dispatch --accum > 1")
    res, mask = STAGES[args.stage]
    model, params, rng = build(args.stage, args.remat, args.mb, args.moe, args.attn, args.xattn)
    sched = cosine_with_warmup(2.4e-4, 2500, 250_000, 0.33)
    tx = build_optimizer(
        params, sched, clip_norm=0.25,
        mu_dtype=jnp.bfloat16 if args.nu == "fp32" else None,
        low_precision_moments=(args.nu == "bf16"),
    )
    # --ema-mode offload: the EMA tree lives in pinned HOST memory (bf16), not
    # HBM - the stage-4 unlock probe (VERDICT round-3 item 1). The train state
    # carries NO ema_params; one make_host_offload_ema_step dispatch per
    # recipe update (or per --ema-interval steps on K=1 legs) reads params
    # from HBM and round-trips the EMA through the host link (~1.0s for XL,
    # scripts/probe_hostmem.py).
    # --ema-mode hostcompute: fp32 EMA in pinned host RAM, decay executed on
    # the TPU host CPU (compute_on('device_host'), HostComputeEMA) - the only
    # device-link traffic per update is the one-way bf16 params D2H. Shares
    # the offload code path (same interface + drain semantics).
    offload_ema = args.ema and args.ema_mode in ("offload", "hostcompute")
    # --ema-mode async: EMA fp32 in host RAM, decayed in numpy on a worker
    # thread; device cost per update = one flatten + async D2H (AsyncHostEMA).
    async_ema = args.ema and args.ema_mode == "async"
    in_state = args.ema and not offload_ema and not async_ema
    state = create_train_state(params, tx, use_ema=in_state,
                               ema_dtype=jnp.bfloat16 if args.ema else None)
    host_ema_obj = None
    ema_cfg = bench.STAGE_EMA.get(args.stage)
    smoothing = ema_cfg["smoothing"] if ema_cfg else 0.9975
    if offload_ema:
        from micro_diffusion_tpu.train import HostComputeEMA, HostEMA

        cls = HostEMA if args.ema_mode == "offload" else HostComputeEMA
        t0 = time.time()
        host_ema_obj = cls(state.params, smoothing)
        host_ema_obj.block()
        log(f"{cls.__name__} created: {len(host_ema_obj.chunks)} host chunks "
            f"({time.time() - t0:.0f}s)")
    elif async_ema:
        from micro_diffusion_tpu.train import AsyncHostEMA

        t0 = time.time()
        host_ema_obj = AsyncHostEMA(state.params, smoothing)
        log(f"AsyncHostEMA created: {len(host_ema_obj._bounds)} host fp32 "
            f"slices ({time.time() - t0:.0f}s)")
    del params
    flow_dtype = jnp.bfloat16 if args.flow == "bf16" else None

    batch_size = args.mb * args.accum
    cfg = {"stage": args.stage, "remat": args.remat, "mb": args.mb,
           "accum": args.accum, "nu": args.nu, "mode": args.accum_mode,
           "moe": args.moe, "attn": args.attn}
    if args.xattn:
        cfg["xattn"] = args.xattn
    if args.flow == "bf16":
        cfg["flow"] = "bf16"
    if args.accum > 1:
        cfg["accum_dtype"] = args.accum_dtype
    if args.ema:
        cfg["ema"] = True
        if args.ema_interval > 1:
            cfg["ema_interval"] = args.ema_interval
    log(f"config: {cfg}")

    if args.accum > 1 and args.accum_mode == "dispatch":
        # split-dispatch accumulation: k small grad graphs + one apply graph
        # (the scanned whole-step graph crashes the remote compile helper)
        apply_kwargs = {}
        if in_state:
            ema_cfg = bench.STAGE_EMA.get(args.stage)
            apply_kwargs = dict(
                ema_smoothing=ema_cfg["smoothing"] if ema_cfg else 0.9975,
                ema_start=0, ema_update_interval=1,
            )
        acc_dtype = jnp.bfloat16 if args.accum_dtype == "bf16" else jnp.float32
        grad_fn = jax.jit(make_grad_step(model, param_flow_dtype=flow_dtype),
                          donate_argnums=(1,))
        # donate acc too (consumed by apply): its 2.33GB read-only residency
        # caused runtime OOM at stage-3 mb32 K=8 (see bench._time_dispatch_recipe)
        apply_fn = jax.jit(make_apply_step(tx, sched, **apply_kwargs),
                           static_argnums=(2,), donate_argnums=(0, 1))
        mbatch = make_batch(args.mb, res)
        # python-side step counter: folding rng with the traced state.step would be
        # an eager op (slow through the remote-compile relay)
        pystep = [0]

        # one jitted dispatch: eager per-tensor zeros cost ~0.15ms each
        # through the relay (~10^3 tensors erased the amortization win)
        zero_fn = jax.jit(lambda p: zero_grad_accumulator(p, acc_dtype))

        # --ema-drain interleave (hostcompute only): stage the chunk decays
        # with begin_update and dispatch ONE between successive grad
        # dispatches of the NEXT cycle, so each one-way D2H rides the gaps
        # instead of serializing after the apply (the measured
        # 'never'~=drained failure, tune_results.jsonl 03:46/03:55 - the
        # round-5 lever, VERDICT r4 #4)
        # hostcompute only: HostEMA has no begin_update (its decay graphs
        # round-trip on the device stream; nothing to interleave)
        interleave = (args.ema and args.ema_mode == "hostcompute"
                      and args.ema_drain == "interleave")
        if args.ema_drain == "interleave" and not interleave:
            raise SystemExit("--ema-drain interleave requires "
                             "--ema --ema-mode hostcompute")
        staged = [None]  # previous cycle's StagedEMAUpdate

        def step_cycle(state):
            acc = zero_fn(state.params)
            r = jax.random.fold_in(rng, pystep[0])
            pystep[0] += 1
            for idx in range(args.accum):
                acc = grad_fn(state.params, acc, mbatch, r, idx)
                if staged[0] is not None:
                    staged[0].tick()  # one chunk decay rides this gap
            if staged[0] is not None:
                staged[0].drain()  # leftovers before the donating apply
            state, metrics = apply_fn(state, acc, args.accum)
            if interleave:
                staged[0] = host_ema_obj.stage_update(state.params, lazy=True)
                return state, metrics
            if offload_ema:
                if args.ema_drain == "always":
                    # Drain in-flight grad/apply executions BEFORE enqueueing
                    # the EMA update: PJRT allocates the flatten graph's
                    # output buffers (a full bf16 params copy) at enqueue
                    # time, next to the grad graph's live temp arena - that
                    # transient OOMs at the stage-4 mb16 peak (sweep_r4 probe
                    # 7). Cost: the 2.33GB EMA round-trip serializes into the
                    # cycle (~1.2s). With headroom (mb8: ~12.5G peak + 2.33G
                    # fits), "never" lets the transfers overlap the NEXT
                    # cycle's grad compute - device program order still
                    # sequences flatten before the next apply reuses the
                    # donated params buffer.
                    float(metrics["loss"])
                # recipe cadence: one EMA update per optimizer update,
                # against the POST-update params (reference EMA semantics)
                host_ema_obj.update(state.params)
            elif async_ema:
                host_ema_obj.update(state.params)
            return state, metrics

        t0 = time.time()
        state, metrics = step_cycle(state)
        loss0 = float(metrics["loss"])
        if offload_ema or async_ema:
            host_ema_obj.block()
        compile_s = time.time() - t0
        log(f"compile+first cycle: {compile_s:.0f}s (loss {loss0:.4f})")
        state, metrics = step_cycle(state)
        float(metrics["loss"])
        if offload_ema or async_ema:
            host_ema_obj.block()
        t0 = time.time()
        for _ in range(args.steps):
            state, metrics = step_cycle(state)
        final_loss = float(metrics["loss"])
        if offload_ema:
            # the EMA offload chain is sequenced by donation; barrier on it so
            # the timed window includes the host round-trips
            host_ema_obj.block()
            cfg["ema_mode"] = args.ema_mode
            cfg["ema_drain"] = args.ema_drain
        elif async_ema:
            # join the fetch+decay queue: any unoverlapped residual counts
            host_ema_obj.block()
            cfg["ema_mode"] = "async"
        dt = (time.time() - t0) / args.steps
    else:
        step_kwargs = {}
        ema_smoothing = None
        if args.ema:
            # per-stage recipe smoothing, matching bench.py exactly so probe
            # compiles warm the persistent cache for the bench run.
            # --ema-interval k: one EMA update per k steps (the recipe cadence
            # is one update per 256 per-rank images; a K=1 fallback at mb
            # updates the optimizer every mb images, so the cadence-faithful
            # interval is 256/mb). --ema-mode step folds the skip into the
            # step graph as a lax.cond (+~49MB cond buffers - OOMs stage-4
            # mb8); mode host keeps the step graph EMA-free and dispatches
            # make_ema_step every k-th step from python (bench K=1 fallback).
            ema_cfg = bench.STAGE_EMA.get(args.stage)
            ema_smoothing = ema_cfg["smoothing"] if ema_cfg else 0.9975
            if (not (args.ema_interval > 1 and args.ema_mode == "host")
                    and not offload_ema):
                step_kwargs = dict(
                    ema_smoothing=ema_smoothing,
                    ema_start=0, ema_update_interval=args.ema_interval,
                )
        step_fn = jax.jit(
            make_train_step(model, tx, sched,
                            microbatch_size=args.mb if args.accum > 1 else None,
                            accum_dtype=jnp.bfloat16
                            if args.accum_dtype == "bf16" else jnp.float32,
                            param_flow_dtype=flow_dtype,
                            **step_kwargs),
            donate_argnums=(0,),
        )
        batch = make_batch(batch_size, res)
        t0 = time.time()
        state, metrics = step_fn(state, batch, rng)
        loss0 = float(metrics["loss"])
        compile_s = time.time() - t0
        log(f"compile+first step: {compile_s:.0f}s (loss {loss0:.4f})")
        state, metrics = step_fn(state, batch, rng)
        float(metrics["loss"])

        t0 = time.time()
        for _ in range(args.steps):
            state, metrics = step_fn(state, batch, rng)
        final_loss = float(metrics["loss"])
        dt = (time.time() - t0) / args.steps
        if offload_ema:
            # cadence-faithful rate: one offloaded EMA update per
            # --ema-interval steps (256/mb for a K=1 leg)
            host_ema_obj.update(state.params)
            host_ema_obj.block()
            t0 = time.time()
            for _ in range(4):
                host_ema_obj.update(state.params)
            host_ema_obj.block()
            dt_ema = (time.time() - t0) / 4
            log(f"offloaded ema update: {dt_ema * 1e3:.1f} ms per update "
                f"(every {args.ema_interval} steps)")
            cfg["ema_mode"] = args.ema_mode
            dt = dt + dt_ema / max(1, args.ema_interval)
        elif args.ema and args.ema_interval > 1 and args.ema_mode == "host":
            from micro_diffusion_tpu.train import make_ema_step
            ema_fn = jax.jit(make_ema_step(ema_smoothing), donate_argnums=(0,))
            state = ema_fn(state)
            float(jax.tree.leaves(state.ema_params)[0].reshape(-1)[0])
            t0 = time.time()
            for _ in range(4):
                state = ema_fn(state)
            float(jax.tree.leaves(state.ema_params)[0].reshape(-1)[0])
            dt_ema = (time.time() - t0) / 4
            log(f"host ema apply: {dt_ema * 1e3:.1f} ms per update "
                f"(every {args.ema_interval} steps)")
            cfg["ema_mode"] = "host"
            dt = dt + dt_ema / args.ema_interval
    img_s = batch_size / dt

    rec = {"kind": "train_step", **cfg, "ms_per_step": round(dt * 1e3, 1),
           "img_per_sec": round(img_s, 2), "compile_s": round(compile_s, 1),
           "loss": round(final_loss, 4)}
    if args.cost_analysis:
        try:
            ca = step_fn.lower(state, batch, rng).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            rec["step_flops"] = float(ca.get("flops", float("nan")))
        except Exception as e:  # noqa: BLE001
            rec["step_flops_error"] = str(e)[:100]
    emit(rec)
    log(f"{dt * 1e3:.1f} ms/step = {img_s:.1f} img/s")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="res256_mask75", choices=sorted(STAGES))
    p.add_argument("--remat", default="full", choices=["full", "dots", "dots_attn_moe", "dots_lean", "dots_attn_moe_lean", "dots_xlean", "dots_attn_moe_xlean", "dots_attn_moe_alean", "dots_attn_moe_lean_alean", "dots_attn_moe_xlean_alean", "attn_moe", "none"])
    p.add_argument("--mb", type=int, default=64)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--accum-mode", default="scan", choices=["scan", "dispatch"],
                   dest="accum_mode")
    p.add_argument("--nu", default="fp32", choices=["fp32", "bf16"])
    p.add_argument("--flow", default="fp32", choices=["fp32", "bf16"],
                   help="param_flow_dtype: bf16 casts the master params once "
                   "per step outside the remat regions (bf16 grads, fp32 "
                   "update math) - see train_step.make_train_step")
    p.add_argument("--accum-dtype", default="fp32", choices=["fp32", "bf16"],
                   help="grad accumulator storage dtype (scan mode)")
    p.add_argument("--ema", action="store_true",
                   help="enable EMA in the timed step (bf16 storage, stage-3/4 recipe)")
    p.add_argument("--ema-interval", type=int, default=1, dest="ema_interval",
                   help="EMA update every k steps (recipe-faithful cadence "
                   "for K=1 fallback legs is 256/mb)")
    p.add_argument("--ema-drain", default="always",
                   choices=["always", "never", "interleave"],
                   dest="ema_drain",
                   help="offload mode only: drain in-flight executions before "
                   "enqueueing the EMA host round-trip (required at tight-HBM "
                   "configs; 'never' overlaps the transfers with the next "
                   "cycle's compute)")
    p.add_argument("--ema-mode", default="host", choices=["step", "host", "offload", "async", "hostcompute"],
                   dest="ema_mode",
                   help="interval>1 skip mechanism: 'step' = lax.cond inside "
                   "the step graph (+~49MB cond buffers), 'host' = separate "
                   "jitted make_ema_step dispatched every k-th step (bench "
                   "K=1 fallback semantics)")
    p.add_argument("--xattn", default=None,
                   choices=["xla", "flash_lane", "flash_bh", "flash_bthd"],
                   help="cross-attention backend override (default: follow --attn)")
    p.add_argument("--attn", default="auto",
                   choices=["auto", "xla", "flash", "flash_lane", "flash_bh", "flash_bthd"],
                   help="attention backend (static module attr)")
    p.add_argument("--moe", default="onehot",
                   choices=["hybrid", "onehot", "onehot_dots", "gather", "unroll", "batched", "scan"],
                   help="EC-MoE dispatch implementation (static module attr)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--cost-analysis", action="store_true")
    p.add_argument("--fwd-flops", action="store_true")
    p.add_argument("--breakdown", action="store_true")
    p.add_argument("--matmul-peak", action="store_true",
                   help="roofline calibration: plain matmul TFLOPS + HBM GB/s")
    p.add_argument("--profile", action="store_true",
                   help="jax.profiler trace + xplane op summary")
    p.add_argument("--inner", type=int, default=0,
                   help="time K chained steps inside one jit (device-only time)")
    p.add_argument("--dump-hlo", action="store_true",
                   help="write optimized train-step HLO to hlo_<cfg>.txt (chipless)")
    args = p.parse_args()
    if args.fwd_flops:
        measure_fwd_flops(args.stage)
        return
    if args.matmul_peak:
        run_matmul_peak(args)
        return
    try:
        if args.dump_hlo:
            dump_hlo(args)
        elif args.profile:
            run_profile(args)
        elif args.breakdown:
            run_breakdown(args)
        elif args.inner:
            run_inner(args)
        else:
            run(args)
    except Exception as e:  # noqa: BLE001
        emit({"kind": "error", "stage": args.stage, "remat": args.remat,
              "mb": args.mb, "accum": args.accum, "nu": args.nu,
              "error": str(e)[:200]})
        raise


if __name__ == "__main__":
    main()
