"""XL-scale multi-chip capacity proof: per-device memory accounting for the
MicroDiT-XL training step under ZeRO-2 shardings on an 8-device mesh
(VERDICT round-3 item 4).

Backs the claim "multi-chip ZeRO-2 lifts the single-chip stage-3/4 HBM cap"
with numbers: the reference's FSDP SHARD_GRAD_OP recipe
(/root/reference/configs/res_256_pretrain.yaml:117-118 - grads + optimizer
state sharded, params replicated) at the reference 512px microbatches, with
NO single-chip compromises:

  * fp32 Adam moments (single chip needs bf16)
  * fp32 EMA, sharded like optimizer state (single chip: bf16 packed in
    pinned host RAM - HostEMA)
  * fp32 microbatch grad accumulation, reduce-scattered into the ZeRO shard
    layout per microbatch (single chip: bf16, infeasible next to the EMA)
  * full 2048-image global batch per optimizer update

METHODOLOGY. The graphs are the split-dispatch pair the framework actually
runs (trainer/bench dispatch mode): K per-microbatch grad graphs into a
donated sharded accumulator + one optimizer/EMA apply graph. Per-device peak
for the grad phase = RESIDENT state + the grad graph's activation/temp arena:

  resident (exact arithmetic): every leaf's per-device shard bytes under the
      real NamedShardings - replicated fp32 params + sharded fp32 moments,
      EMA, and accumulator;
  temp arena (measured upper bound): the same grad graph at the SAME
      per-device microbatch ran on the real v5e chip on 2026-08-19
      (tune_results.jsonl sweep_r4/r4c entries) next to a measured resident
      set - temps <= 15.75 GiB minus that run's residency. Single-chip grad
      temps upper-bound the multi-chip ones: the per-device graph is
      identical except grads leave through a reduce-scatter instead of
      staying whole, and the reduce-scattered accumulator shard is 8x
      smaller than the single-chip one.

  apply phase: elementwise update math - AOT-compiled here on the fake
      8-device CPU mesh and measured via compiled.memory_analysis(); its
      temp arena is tiny and scheduler-independent.

Why not compile the GRAD graph on CPU: XLA:CPU buffer assignment reported a
58-95 GiB temp arena (any scheduler, any MoE dispatch mode) for a graph that
RUNS inside 15.75 GiB on the real chip - the CPU attention path saves T x T
softmax tensors per block that the TPU lane-flash kernel never materializes,
and CPU scheduling keeps recompute regions concurrently live. Those
estimates say nothing about TPU capacity (measured 2026-08-19, this repo's
bench_runs/multichip_capacity_r4.log history).

Collectives/correctness of the sharded step are proven separately by
__graft_entry__.dryrun_multichip (executes the sharded step on the fake
8-device mesh and asserts loss + grad-norm parity with the single-device
step) and tests/test_parallel.py.

Usage: python scripts/multichip_capacity.py [--json OUT.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from micro_diffusion_tpu.models.diffusion import LatentDiffusion  # noqa: E402
from micro_diffusion_tpu.models.dit import MicroDiT_XL_2  # noqa: E402
from micro_diffusion_tpu.parallel import make_mesh  # noqa: E402
from micro_diffusion_tpu.parallel.sharding import (  # noqa: E402
    opt_state_shardings,
    opt_state_spec,
    param_shardings,
)
from micro_diffusion_tpu.train import (  # noqa: E402
    TrainState,
    build_optimizer,
    create_train_state,
    make_apply_step,
)
from micro_diffusion_tpu.train.optim import constant_with_warmup  # noqa: E402

GIB = 1024**3
# v5e HBM per chip; 15.75 GiB is the usable figure every single-chip
# compile-OOM message in this repo reports (PERF.md).
HBM_LIMIT_GIB = 15.75

# Real-chip grad-graph temp-arena upper bounds, by (mask_ratio, mb_per_dev).
# Provenance (all 2026-08-19, tune_results.jsonl, XL attn_moe onehot bf16):
#   * mask0 mb16: sweep_r4 probe 7 / r4b probe 1 RAN the mb16 grad graphs
#     next to 9.32 GiB resident (fp32 params 4.34 + bf16 moments 2.17 + bf16
#     accumulator 2.17 + batch) -> temps <= 15.75 - 9.32 = 6.43 GiB.
#   * mask75 mb32: the stage-3 pre-EMA mb32 dispatch leg RAN next to the
#     same 9.32 GiB resident -> temps <= 6.43 GiB.
# The multi-chip fp32 grad graph emits each microbatch's grads through a
# reduce-scatter into a 1/8-size shard; its temp arena is the single-chip
# one + one transient fp32 grad leaf at a time (layer-streamed by XLA), for
# which we add the largest-leaf fp32 slack below.
MEASURED_GRAD_TEMP_GIB = {
    (0.75, 32): 6.43,
    (0.0, 16): 6.43,
}
# largest single param leaf (adaLN table 1024x6144 fp32 ~ 24 MiB) x a few in
# flight; generous 0.5 GiB slack for fp32 grad leaves awaiting reduce-scatter
FP32_GRAD_TRANSIENT_SLACK_GIB = 0.5

# (name, mask_ratio, per_device_microbatch, clip_norm) - the reference 512px
# recipes: res_512_pretrain mb32 / res_512_finetune mb16
# (configs/res_512_*.yaml device_train_microbatch_size).
SCENARIOS = [
    ("res512_mask75_mb32", 0.75, 32, 0.5),
    ("res512_mask0_mb16", 0.0, 16, 0.25),
]

GLOBAL_BATCH = 2048
N_DEV = 8

# ---- ICI communication model (VERDICT r4 next-round #7) --------------------
# Published v5e ICI: 1600 Gbit/s aggregate per chip over 4 links of a 2D
# torus = 4 x ~45 GB/s one-way per link (the scaling-book figure). A ring
# reduce-scatter/all-gather on ONE torus axis uses the axis's two links in
# opposite directions: algorithm bandwidth 2 x 45 GB/s per device.
V5E_ICI_LINK_ONEWAY_BYTES_S = 45.0e9
ICI_RING_BYTES_S = 2 * V5E_ICI_LINK_ONEWAY_BYTES_S

# Measured per-microbatch GRAD-graph compute on the real chip (the overlap
# budget each reduce-scatter must hide under). Provenance (PERF.md round 4):
#   mask0: K-differencing the stage-4 legs (K=1 335 ms vs K=32 grad-only
#     302 ms per mb8 step) -> ~37.75 ms/img; the scenario's mb16 graph is
#     2x the mb8 one.
#   mask75: the stage-3 mb32 K=8 recipe leg (69.8 img/s incl. apply):
#     (256/69.8 - ~0.1s apply share) / 8 microbatches = ~0.446 s/microbatch.
MEASURED_GRAD_MS_PER_IMG = {0.0: 37.75, 0.75: 0.446 * 1e3 / 32}


def comm_model(mask_ratio, mb_per_dev, k, n_params):
    """Per-optimizer-update ICI bytes and times for ZeRO-2 (SHARD_GRAD_OP):
    each microbatch's fp32 grads reduce-scatter into the sharded accumulator
    (K per update), and the updated params all-gather back to the replicated
    layout after the apply. Ring collective cost on N devices: each device
    moves (N-1)/N of the tensor bytes at the ring's algorithm bandwidth.
    fp32 wire is the conservative choice (a bf16 grad wire would halve RS)."""
    s_fp32 = 4 * n_params
    frac = (N_DEV - 1) / N_DEV
    rs_bytes_dev = frac * s_fp32          # per microbatch, per device
    t_rs = rs_bytes_dev / ICI_RING_BYTES_S
    t_ag = frac * s_fp32 / ICI_RING_BYTES_S  # once per update
    t_grad_mb = MEASURED_GRAD_MS_PER_IMG[mask_ratio] * mb_per_dev / 1e3
    # standard dispatch overlap: microbatch i's reduce-scatter rides behind
    # microbatch i+1's grad compute, so RS is exposed only if it outruns the
    # compute; the LAST microbatch's RS and the all-gather are the exposed
    # tail either way.
    rs_hidden = t_rs <= t_grad_mb
    exposed = (t_rs + t_ag) if rs_hidden else (k * t_rs - (k - 1) * t_grad_mb
                                               + t_ag)
    serial = k * t_rs + t_ag
    return {
        "ici_model": "ring on one torus axis, 2 x 45 GB/s/device (v5e "
                     "1600Gbps/chip over 4 links)",
        "grad_wire_dtype": "float32 (conservative; bf16 wire would halve RS)",
        "rs_bytes_per_microbatch_per_device_gib": round(rs_bytes_dev / GIB, 3),
        "t_reduce_scatter_ms": round(t_rs * 1e3, 1),
        "t_all_gather_ms": round(t_ag * 1e3, 1),
        "t_grad_compute_per_microbatch_ms_measured": round(t_grad_mb * 1e3, 1),
        "rs_hides_under_compute": bool(rs_hidden),
        "exposed_comm_per_update_ms_overlapped": round(exposed * 1e3, 1),
        "comm_per_update_ms_serial_worst_case": round(serial * 1e3, 1),
        "compute_per_update_ms": round(t_grad_mb * k * 1e3, 1),
        "overlapped_comm_overhead_pct": round(
            100 * exposed / (t_grad_mb * k), 2),
    }


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _graph_bytes(compiled):
    ma = compiled.memory_analysis()
    return (ma.argument_size_in_bytes + ma.output_size_in_bytes
            - ma.alias_size_in_bytes + ma.temp_size_in_bytes), ma


def _tree_device_bytes(shapes, shardings):
    """Per-device bytes of a pytree under its shardings."""
    total = 0
    for l, s in zip(jax.tree.leaves(shapes), jax.tree.leaves(shardings)):
        m = l.dtype.itemsize
        for d in s.shard_shape(l.shape):
            m *= d
        total += m
    return total


def lower_scenario(name, mask_ratio, mb_per_dev, clip_norm):
    mesh = make_mesh(data=1, fsdp=N_DEV, tensor=1)
    dit = MicroDiT_XL_2(input_size=64, remat=True, remat_policy="attn_moe",
                        moe_dispatch="onehot")
    model = LatentDiffusion(dit=dit, latent_res=64,
                            train_mask_ratio=mask_ratio, latent_scale=1.0)
    rng = jax.random.PRNGKey(0)
    params_shapes = jax.eval_shape(
        lambda: model.dit.init(
            {"params": rng, "mask": rng},
            jnp.zeros((2, 4, 64, 64)), jnp.zeros((2,)),
            jnp.zeros((2, 1, 77, 1024)),
        )
    )
    n_params = sum(int(jnp.size(l)) for l in jax.tree.leaves(params_shapes))

    sched = constant_with_warmup(2.4e-5, 1000)
    tx = build_optimizer(params_shapes, sched, clip_norm=clip_norm,
                         low_precision_moments=False)  # fp32 moments
    state_shapes = jax.eval_shape(
        lambda p: create_train_state(p, tx, use_ema=True,
                                     ema_dtype=jnp.float32),
        params_shapes,
    )
    p_sh = param_shardings(params_shapes, mesh, shard_experts=False)
    o_sh = opt_state_shardings(state_shapes.opt_state, mesh)
    e_sh = jax.tree.map(
        lambda l: NamedSharding(mesh, opt_state_spec(l, mesh)),
        state_shapes.ema_params,
    )
    state_sh = TrainState(
        step=NamedSharding(mesh, P()),
        params=p_sh,
        opt_state=o_sh,
        ema_params=e_sh,
    )
    mb_global = mb_per_dev * N_DEV
    k = GLOBAL_BATCH // mb_global

    # ZeRO-2: the fp32 accumulator lives in the opt-state shard layout; each
    # microbatch's grads reduce-scatter into it.
    acc_sh_tree = jax.tree.map(
        lambda l: NamedSharding(mesh, opt_state_spec(l, mesh)), params_shapes
    )
    acc_shapes = (
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.tree.map(
            lambda l: jax.ShapeDtypeStruct(l.shape, jnp.float32),
            params_shapes,
        ),
    )
    acc_sh = (NamedSharding(mesh, P()), acc_sh_tree)

    log(f"[{name}] XL ({n_params/1e9:.3f}B params), mesh (1,{N_DEV},1), "
        f"per-device mb{mb_per_dev}, K={k} dispatch, fp32 moments+EMA+accum, "
        f"ZeRO-2 reduce-scatter")

    # --- grad phase: exact resident arithmetic + measured temp bound -------
    resident_params = _tree_device_bytes(params_shapes, p_sh)
    resident_opt = _tree_device_bytes(state_shapes.opt_state, o_sh)
    resident_ema = _tree_device_bytes(state_shapes.ema_params, e_sh)
    resident_acc = _tree_device_bytes(acc_shapes[1], acc_sh_tree)
    resident = (resident_params + resident_opt + resident_ema + resident_acc)
    grad_temp = MEASURED_GRAD_TEMP_GIB[(mask_ratio, mb_per_dev)]
    grad_peak_gib = (resident / GIB + grad_temp
                     + FP32_GRAD_TRANSIENT_SLACK_GIB)
    log(f"[{name}] resident/device: params {resident_params/GIB:.2f} "
        f"(replicated) + moments {resident_opt/GIB:.2f} + EMA "
        f"{resident_ema/GIB:.2f} + accum {resident_acc/GIB:.2f} = "
        f"{resident/GIB:.2f} GiB; + measured grad temps <= {grad_temp} "
        f"+ {FP32_GRAD_TRANSIENT_SLACK_GIB} slack")

    # --- apply phase: AOT-compile the real sharded update graph ------------
    apply_fn = jax.jit(
        make_apply_step(tx, sched, ema_smoothing=0.99975, ema_start=0,
                        ema_update_interval=1),
        in_shardings=(state_sh, acc_sh),
        out_shardings=(state_sh, None),
        static_argnums=(2,),
        donate_argnums=(0, 1),
    )
    t0 = time.time()
    apply_compiled = apply_fn.lower(state_shapes, acc_shapes, k).compile()
    t_apply = time.time() - t0
    apply_peak, apply_ma = _graph_bytes(apply_compiled)
    log(f"[{name}] apply graph compiled in {t_apply:.0f}s: "
        f"args {apply_ma.argument_size_in_bytes/GIB:.2f} + temps "
        f"{apply_ma.temp_size_in_bytes/GIB:.2f} GiB")

    peak = max(grad_peak_gib, apply_peak / GIB)
    comm = comm_model(mask_ratio, mb_per_dev, k, n_params)
    log(f"[{name}] comm: RS {comm['t_reduce_scatter_ms']}ms/microbatch "
        f"(compute {comm['t_grad_compute_per_microbatch_ms_measured']}ms, "
        f"hides={comm['rs_hides_under_compute']}), AG "
        f"{comm['t_all_gather_ms']}ms/update -> overlapped overhead "
        f"{comm['overlapped_comm_overhead_pct']}%")
    rec = {
        "scenario": name,
        "mesh": f"(data=1, fsdp={N_DEV}, tensor=1)",
        "per_device_microbatch": mb_per_dev,
        "dispatch_microbatches": k,
        "global_batch": GLOBAL_BATCH,
        "params_B": round(n_params / 1e9, 4),
        "resident_per_device_gib": round(resident / GIB, 3),
        "resident_detail_gib": {
            "params_replicated": round(resident_params / GIB, 3),
            "adam_moments_fp32_sharded": round(resident_opt / GIB, 3),
            "ema_fp32_sharded": round(resident_ema / GIB, 3),
            "accum_fp32_sharded": round(resident_acc / GIB, 3),
        },
        "grad_temp_gib_measured_bound": grad_temp,
        "grad_transient_slack_gib": FP32_GRAD_TRANSIENT_SLACK_GIB,
        "grad_phase_peak_gib": round(grad_peak_gib, 3),
        "apply_graph_gib": round(apply_peak / GIB, 3),
        "peak_per_device_gib": round(peak, 3),
        "hbm_limit_gib": HBM_LIMIT_GIB,
        "fits": bool(peak < HBM_LIMIT_GIB),
        "headroom_gib": round(HBM_LIMIT_GIB - peak, 3),
        "apply_compile_s": round(t_apply, 1),
        "comm_model": comm,
    }
    log(f"[{name}] grad phase {rec['grad_phase_peak_gib']} | apply "
        f"{rec['apply_graph_gib']} -> peak {rec['peak_per_device_gib']} "
        f"GiB/device (limit {HBM_LIMIT_GIB}) fits={rec['fits']} "
        f"headroom={rec['headroom_gib']}")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--scenario", default=None,
                    help="run only the named scenario")
    args = ap.parse_args()
    recs = []
    for name, mask, mb, clip in SCENARIOS:
        if args.scenario and name != args.scenario:
            continue
        recs.append(lower_scenario(name, mask, mb, clip))
    out = {"scenarios": recs, "all_fit": all(r["fits"] for r in recs)}
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        log(f"wrote {args.json}")


if __name__ == "__main__":
    main()
