"""XL-scale multi-chip capacity proof: AOT-lower the FULL MicroDiT-XL train
step under ZeRO-2 shardings on an 8-device mesh and record XLA's per-device
memory estimates (VERDICT round-3 item 4).

Backs the claim "multi-chip ZeRO-2 lifts the single-chip stage-3/4 HBM cap"
with compile-time numbers instead of assertion: the reference's FSDP
SHARD_GRAD_OP recipe (configs/res_256_pretrain.yaml:117-118 - grads +
optimizer state sharded, params replicated) at the reference 512px
microbatches, with NO single-chip compromises:

  * fp32 Adam moments (single chip needs bf16)
  * fp32 EMA, sharded like optimizer state (single chip: bf16, and the
    resident buffer blocks the grad accumulator - PERF.md round 3)
  * fp32 microbatch grad accumulation, reduce-scattered into the ZeRO shard
    layout via make_train_step(grad_shardings=...) (single chip: bf16, and
    infeasible at all next to the EMA buffer)
  * full 2048-image global batch scanned in ONE jit step

Runs on the CPU backend with 8 fake devices - XLA buffer assignment is
topology-independent for the per-device memory estimate (SPMD: the compiled
executable is per-device). Pallas kernels lower in interpret mode off-TPU
(their VMEM scratch shows up as regular temps - a conservative overcount);
attention takes the XLA path off-TPU, whose softmax saves are BIGGER than the
lane-flash kernel's (flash saves only (T,HD) outputs) - also conservative.

Usage: python scripts/multichip_capacity.py [--json OUT.json]
"""

import argparse
import json
import os
import sys
import time

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
    make_train_step,
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
    batch_shapes = {
        "image_latents": jax.ShapeDtypeStruct(
            (GLOBAL_BATCH, 4, 64, 64), jnp.float32),
        "caption_latents": jax.ShapeDtypeStruct(
            (GLOBAL_BATCH, 1, 77, 1024), jnp.float32),
        "drop_caption_mask": jax.ShapeDtypeStruct(
            (GLOBAL_BATCH,), jnp.float32),
    }
    batch_sh = jax.tree.map(lambda _: b_sh, batch_shapes)
    rng_shape = jax.eval_shape(jax.random.PRNGKey, 0)

    # ZeRO-2 grads: reduce-scatter each microbatch's grads into the opt-state
    # shard layout (grad_shardings) instead of all-reducing replicated copies.
    grad_sh = jax.tree.map(
        lambda l: NamedSharding(mesh, opt_state_spec(l, mesh)), params_shapes
    )
    step = jax.jit(
        make_train_step(
            model, tx, sched, microbatch_size=mb_per_dev * N_DEV,
            ema_smoothing=0.99975, ema_start=0,
            accum_dtype=jnp.float32, grad_shardings=grad_sh,
        ),
        in_shardings=(state_sh, batch_sh, None),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )
    k = GLOBAL_BATCH // (mb_per_dev * N_DEV)
    log(f"[{name}] lowering XL ({n_params/1e9:.3f}B params) train step: "
        f"mesh (1,{N_DEV},1), per-device mb{mb_per_dev}, K={k} scan, "
        f"fp32 moments+EMA+accum, ZeRO-2 grad reduce-scatter ...")
    t0 = time.time()
    lowered = step.lower(state_shapes, batch_shapes, rng_shape)
    t_lower = time.time() - t0
    log(f"[{name}] lowered in {t_lower:.0f}s; compiling ...")
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    ma = compiled.memory_analysis()
    # Per-device peak: live arguments + non-aliased outputs + XLA temp arena.
    # Donated state aliases the output state (alias_size), so it counts once.
    peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
            - ma.alias_size_in_bytes + ma.temp_size_in_bytes)
    rec = {
        "scenario": name,
        "mesh": f"(data=1, fsdp={N_DEV}, tensor=1)",
        "per_device_microbatch": mb_per_dev,
        "scan_microbatches": k,
        "global_batch": GLOBAL_BATCH,
        "params_B": round(n_params / 1e9, 4),
        "argument_gib": round(ma.argument_size_in_bytes / GIB, 3),
        "output_gib": round(ma.output_size_in_bytes / GIB, 3),
        "alias_gib": round(ma.alias_size_in_bytes / GIB, 3),
        "temp_gib": round(ma.temp_size_in_bytes / GIB, 3),
        "peak_per_device_gib": round(peak / GIB, 3),
        "hbm_limit_gib": HBM_LIMIT_GIB,
        "fits": bool(peak / GIB < HBM_LIMIT_GIB),
        "compile_s": round(t_compile, 1),
    }
    log(f"[{name}] args {rec['argument_gib']} GiB + temps {rec['temp_gib']} "
        f"GiB -> peak {rec['peak_per_device_gib']} GiB/device "
        f"(limit {HBM_LIMIT_GIB}) fits={rec['fits']} "
        f"[compile {t_compile:.0f}s]")
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
