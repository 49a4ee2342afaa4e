"""XL-scale multi-chip capacity proof: AOT-compile the MicroDiT-XL training
graphs under ZeRO-2 shardings on an 8-device mesh and record XLA's per-device
memory estimates (VERDICT round-3 item 4).

Backs the claim "multi-chip ZeRO-2 lifts the single-chip stage-3/4 HBM cap"
with compile-time numbers instead of assertion: the reference's FSDP
SHARD_GRAD_OP recipe (configs/res_256_pretrain.yaml:117-118 - grads +
optimizer state sharded, params replicated) at the reference 512px
microbatches, with NO single-chip compromises:

  * fp32 Adam moments (single chip needs bf16)
  * fp32 EMA, sharded like optimizer state (single chip: bf16 packed in
    pinned host RAM - HostEMA)
  * fp32 microbatch grad accumulation, reduce-scattered into the ZeRO shard
    layout per microbatch (single chip: bf16, infeasible next to the EMA)
  * full 2048-image global batch per optimizer update

The compiled graphs are the SPLIT-DISPATCH pair the framework actually runs
(bench.py/_time_dispatch_recipe, trainer dispatch mode): K per-microbatch
grad graphs into a donated accumulator + one optimizer/EMA apply graph. The
whole-2048-batch scanned step is the same math in one graph but its XL CPU
compile exceeds an hour; the dispatch pair compiles in minutes and is the
production execution strategy. Peak per-device memory accounting:

  grad phase : grad graph (args: params, acc, microbatch shard, rng;
               temps: activations) + the RESIDENT state it does not
               reference (sharded moments + EMA)
  apply phase: apply graph (args: full TrainState + acc; temps: update math)

Runs on the CPU backend with 8 fake devices - XLA buffer assignment is
topology-independent for the per-device estimate (SPMD: the compiled
executable is per-device). Pallas kernels lower in interpret mode off-TPU;
attention takes the XLA path off-TPU, whose softmax saves are BIGGER than
the lane-flash kernel's - conservative.

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
# Memory-minimizing sequential schedule: the default CPU scheduler is
# "optimized for extracting concurrency ... by trading memory" - it keeps
# many transformer-block recompute regions live at once and reported a 75-95
# GiB grad-graph temp arena for a step that runs in <16GB on the real chip
# (measured 2026-08-19). TPU scheduling minimizes liveness; this flag makes
# the CPU estimate comparable.
os.environ["XLA_FLAGS"] += \
    " --xla_cpu_enable_concurrency_optimized_scheduler=false"
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
    make_grad_step,
)
from micro_diffusion_tpu.train.optim import constant_with_warmup  # noqa: E402

GIB = 1024**3
# v5e HBM per chip; 15.75 GiB is the usable figure every single-chip
# compile-OOM message in this repo reports (PERF.md).
HBM_LIMIT_GIB = 15.75

# (name, mask_ratio, per_device_microbatch, clip_norm) - the reference 512px
# recipes: res_512_pretrain mb32 / res_512_finetune mb16
# (configs/res_512_*.yaml device_train_microbatch_size).
SCENARIOS = [
    ("res512_mask75_mb32", 0.75, 32, 0.5),
    ("res512_mask0_mb16", 0.0, 16, 0.25),
]

GLOBAL_BATCH = 2048
N_DEV = 8


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
    # moe_dispatch onehot_dots (pure-XLA expert dots), NOT the production
    # 'onehot' fused Pallas kernel: in CPU interpret mode the kernel's
    # VMEM-only expert hiddens become ordinary HLO temps that defeat the
    # remat policy (measured 75 GiB/device grad-graph estimate at mb32 -
    # meaningless). With onehot_dots the hiddens are plain HLO values the
    # attn_moe checkpoint policy drops and rematerializes, which is exactly
    # their lifetime under the TPU kernel (hiddens never reach HBM) - the
    # estimate stays conservative for the real device.
    dit = MicroDiT_XL_2(input_size=64, remat=True, remat_policy="attn_moe",
                        moe_dispatch="onehot_dots")
    model = LatentDiffusion(dit=dit, latent_res=64,
                            train_mask_ratio=mask_ratio, latent_scale=1.0)
    rng = jax.random.PRNGKey(0)
    params_shapes = jax.eval_shape(
        lambda: model.dit.init(
            {"params": rng, "mask": rng},
            jnp.zeros((1, 4, 64, 64)),
            jnp.zeros((1,)),
            jnp.zeros((1, 1, 77, 1024)),
        )
    )
    n_params = sum(
        int(jnp.prod(jnp.array(l.shape)))
        for l in jax.tree.leaves(params_shapes)
    )
    sched = constant_with_warmup(8e-5, 500)
    # Multi-chip recipe: fp32 moments (no low_precision_moments compromise).
    tx = build_optimizer(params_shapes, sched, clip_norm=clip_norm)
    state_shapes = jax.eval_shape(
        lambda p: create_train_state(p, tx, use_ema=True,
                                     ema_dtype=jnp.float32),
        params_shapes,
    )

    p_sh = param_shardings(params_shapes, mesh)
    o_sh = opt_state_shardings(state_shapes.opt_state, mesh)
    # EMA sharded like optimizer state: it is only read/written at the
    # optimizer apply, exactly the ZeRO-2 shard-what-the-update-touches rule.
    e_sh = jax.tree.map(
        lambda l: NamedSharding(mesh, opt_state_spec(l, mesh)),
        state_shapes.ema_params,
    )
    state_sh = TrainState(
        step=NamedSharding(mesh, P()), params=p_sh, opt_state=o_sh,
        ema_params=e_sh,
    )
    b_sh = NamedSharding(mesh, P(("data", "fsdp")))
    mb_global = mb_per_dev * N_DEV
    batch_shapes = {
        "image_latents": jax.ShapeDtypeStruct(
            (mb_global, 4, 64, 64), jnp.float32),
        "caption_latents": jax.ShapeDtypeStruct(
            (mb_global, 1, 77, 1024), jnp.float32),
        "drop_caption_mask": jax.ShapeDtypeStruct(
            (mb_global,), jnp.float32),
    }
    batch_sh = jax.tree.map(lambda _: b_sh, batch_shapes)
    rng_shape = jax.eval_shape(jax.random.PRNGKey, 0)

    # ZeRO-2: the fp32 accumulator lives in the opt-state shard layout; each
    # microbatch's grads reduce-scatter into it (out_shardings constraint).
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

    k = GLOBAL_BATCH // mb_global
    log(f"[{name}] XL ({n_params/1e9:.3f}B params), mesh (1,{N_DEV},1), "
        f"per-device mb{mb_per_dev}, K={k} dispatch, fp32 moments+EMA+accum, "
        f"ZeRO-2 reduce-scatter")

    grad_fn = jax.jit(
        make_grad_step(model),
        in_shardings=(p_sh, acc_sh, batch_sh, None, None),
        out_shardings=acc_sh,
        donate_argnums=(1,),
    )
    t0 = time.time()
    grad_compiled = grad_fn.lower(
        params_shapes, acc_shapes, batch_shapes, rng_shape,
        jax.ShapeDtypeStruct((), jnp.int32),
    ).compile()
    t_grad = time.time() - t0
    grad_peak, grad_ma = _graph_bytes(grad_compiled)
    log(f"[{name}] grad graph compiled in {t_grad:.0f}s: "
        f"args {grad_ma.argument_size_in_bytes/GIB:.2f} + temps "
        f"{grad_ma.temp_size_in_bytes/GIB:.2f} GiB")

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

    # Resident-but-unreferenced during the grad phase: sharded moments + EMA.
    resident_grad = (_tree_device_bytes(state_shapes.opt_state, o_sh)
                     + _tree_device_bytes(state_shapes.ema_params, e_sh))
    peak = max(grad_peak + resident_grad, apply_peak)
    rec = {
        "scenario": name,
        "mesh": f"(data=1, fsdp={N_DEV}, tensor=1)",
        "per_device_microbatch": mb_per_dev,
        "dispatch_microbatches": k,
        "global_batch": GLOBAL_BATCH,
        "params_B": round(n_params / 1e9, 4),
        "grad_graph_gib": round(grad_peak / GIB, 3),
        "resident_opt_ema_gib": round(resident_grad / GIB, 3),
        "apply_graph_gib": round(apply_peak / GIB, 3),
        "peak_per_device_gib": round(peak / GIB, 3),
        "hbm_limit_gib": HBM_LIMIT_GIB,
        "fits": bool(peak / GIB < HBM_LIMIT_GIB),
        "grad_compile_s": round(t_grad, 1),
        "apply_compile_s": round(t_apply, 1),
    }
    log(f"[{name}] grad {rec['grad_graph_gib']} + resident "
        f"{rec['resident_opt_ema_gib']} | apply {rec['apply_graph_gib']} "
        f"-> peak {rec['peak_per_device_gib']} GiB/device "
        f"(limit {HBM_LIMIT_GIB}) fits={rec['fits']}")
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
    out = {"device_mesh": f"1x{N_DEV}x1 (fsdp={N_DEV})", "results": recs,
           "all_fit": all(r["fits"] for r in recs)}
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    if not out["all_fit"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
