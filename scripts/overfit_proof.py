"""Learning-dynamics proof over a real horizon (VERDICT r4 next-round #6).

The strongest in-env proxy for the unprovable FID north star (zero egress: no
released checkpoints/VAE/CLIP weights in the image): train MicroDiT-Micro for
hundreds of steps on a small fixture latent set through the PRODUCT path (the
Trainer: optimizer, EMA, checkpoint save + RESUME mid-run) and demonstrate

  1. the loss descends over the horizon (windowed means, not single draws -
     the EDM loss draws fresh sigma/noise per step);
  2. fixed-seed generate() output organizes: the final EMA params produce
     latents far from the init params' output (and the change is not noise -
     the sampler rng is identical in both).

The reference's de-facto integration test is exactly this kind of small-data
run (/root/reference/README.md:26, the ~1% subset path). Results are recorded
to bench_runs/overfit_r5.json.

Usage: python scripts/overfit_proof.py [--steps 400] [--out bench_runs/overfit_r5.json]
CPU-runnable (fp32 model - XLA:CPU cannot execute bf16 dots in this image).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from micro_diffusion_tpu.models.diffusion import LatentDiffusion
from micro_diffusion_tpu.models.dit import MicroDiT_Micro_2


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_fixture_batches(n_batches=2, batch=8, latent_res=32, cap_dim=64):
    """Fixed-seed fixture 'dataset': n_batches x batch latent samples with
    matching caption embeddings (distinct per sample, cycled every epoch)."""
    batches = []
    for i in range(n_batches):
        k = jax.random.PRNGKey(1000 + i)
        k1, k2 = jax.random.split(k)
        batches.append({
            "image_latents": 0.9 * jax.random.normal(
                k1, (batch, 4, latent_res, latent_res)),
            "caption_latents": jax.random.normal(k2, (batch, 1, 8, cap_dim)),
            "drop_caption_mask": jnp.ones((batch,)),
        })
    return batches


def build_trainer(batches, max_steps, save_folder, metrics_path,
                  autoresume=False, dtype=jnp.float32):
    from micro_diffusion_tpu.train.callbacks import JSONLLogger
    from micro_diffusion_tpu.train.trainer import Trainer

    dit = MicroDiT_Micro_2(caption_channels=64, dtype=dtype)
    model = LatentDiffusion(dit=dit, latent_res=32, train_mask_ratio=0.0,
                            latent_scale=1.0)
    return Trainer(
        model=model,
        optimizer={"lr": 1e-3, "weight_decay": 0.01},
        schedulers={"_target_": "composer.optim.ConstantWithWarmupScheduler",
                    "t_warmup": "20ba"},
        train_dataloader=batches,
        max_duration=f"{max_steps}ba",
        device_train_microbatch_size=None,
        seed=7,
        ema={"smoothing": 0.99, "ema_start": 50, "update_interval": 1},
        algorithms={"gradient_clipping": {"clipping_type": "norm",
                                          "clip_norm": 1.0}},
        save_folder=save_folder,
        save_interval=f"{max_steps}ba",
        loggers=[JSONLLogger(metrics_path)],
        metric_window=5,
        autoresume=autoresume,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_runs", "overfit_r5.json"))
    ap.add_argument("--workdir", default="/tmp/mdt_overfit_proof")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="module compute dtype: float32 for CPU (XLA:CPU "
                    "cannot execute bf16 dots in this image); bfloat16 on "
                    "the real chip = the PRODUCTION compute path")
    args = ap.parse_args(argv)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    os.makedirs(args.workdir, exist_ok=True)
    metrics_path = os.path.join(args.workdir, "metrics.jsonl")
    if os.path.exists(metrics_path):
        os.remove(metrics_path)
    save_folder = os.path.join(args.workdir, "ckpts")
    batches = make_fixture_batches()
    half = args.steps // 2

    t0 = time.time()
    # phase 1: train to steps/2, checkpoint at the end
    tr = build_trainer(batches, half, save_folder, metrics_path,
                       dtype=dtype)
    emb = jax.random.normal(jax.random.PRNGKey(42), (4, 1, 8, 64))
    gen_init = np.asarray(tr.model.generate(
        tr.eval_params(), text_embeddings=emb, guidance_scale=2.0,
        num_inference_steps=12, seed=11, return_only_latents=True))
    tr.fit()
    # phase 2: a FRESH trainer autoresumes from the checkpoint - the product
    # recovery path over a real horizon, not a 1-step unit test
    tr = build_trainer(batches, args.steps, save_folder, metrics_path,
                       autoresume=True, dtype=dtype)
    assert tr.global_step == half, (tr.global_step, half)
    tr.fit()
    wall = time.time() - t0

    rows = [json.loads(l) for l in open(metrics_path)]
    losses = [(r["step"], r["loss/train/total"]) for r in rows
              if "loss/train/total" in r]
    steps_l, vals = zip(*losses)
    n = len(vals)
    first = float(np.mean(vals[: max(2, n // 5)]))
    last = float(np.mean(vals[-max(2, n // 5):]))
    # monotone-ish: windowed means over thirds must be non-increasing-ish
    thirds = [float(np.mean(vals[i * n // 3:(i + 1) * n // 3]))
              for i in range(3)]

    gen_final = np.asarray(tr.model.generate(
        tr.eval_params(), text_embeddings=emb, guidance_scale=2.0,
        num_inference_steps=12, seed=11, return_only_latents=True))
    rel = float(np.linalg.norm(gen_final - gen_init)
                / np.linalg.norm(gen_init))

    rec = {
        "model": f"MicroDiT_Micro_2 (debug-scale, {args.dtype})",
        "path": "Trainer (optimizer+EMA+checkpoint, autoresume mid-run)",
        "steps": args.steps,
        "resume_at": half,
        "wall_s": round(wall, 1),
        "loss_first_window": round(first, 4),
        "loss_last_window": round(last, 4),
        "loss_thirds": [round(t, 4) for t in thirds],
        "loss_curve": [[int(s), round(float(v), 4)]
                       for s, v in zip(steps_l, vals)],
        "generate_rel_change_vs_init": round(rel, 4),
        "device": str(jax.devices()[0]),
    }
    ok_loss = last < 0.75 * first and thirds[2] < thirds[0]
    ok_gen = rel > 0.15
    rec["pass"] = bool(ok_loss and ok_gen)
    log(f"loss {first:.4f} -> {last:.4f} (thirds {thirds}); "
        f"generate rel-change {rel:.3f}; pass={rec['pass']}")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    log(f"wrote {args.out} ({wall:.0f}s)")
    return 0 if rec["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
