"""Training entry point: assemble model, data, optimizer, trainer from a yaml recipe.

Equivalent of the reference's hydra-driven train.py (train.py:14-127), CLI-compatible:

    python train.py --config-path configs --config-name res_256_pretrain \
        trainer.max_duration=100ba dataset.train_batch_size=64

Accepts both our layered configs (configs/*.yaml) and the reference's single-file
Composer recipes (same keys; `_target_` strings are re-pointed via the registry in
micro_diffusion_tpu/train/config.py).
"""

import argparse
import sys

import jax

from micro_diffusion_tpu.models.diffusion import text_encoder_embedding_format
from micro_diffusion_tpu.train.callbacks import TensorboardLogger  # noqa: F401
from micro_diffusion_tpu.train.config import instantiate, load_config, resolve_target
from micro_diffusion_tpu.train.trainer import Trainer


def build_from_config(cfg: dict) -> Trainer:
    assert cfg["model"].get("precomputed_latents", True), (
        "For microbudget training, we assume that latents are already precomputed "
        "for all datasets"
    )
    model = instantiate(cfg["model"])

    # data loaders: per-host batch = global // process_count (reference train.py:50,60)
    cap_seq, cap_dim = text_encoder_embedding_format(
        cfg["model"]["text_encoder_name"]
    )
    ds = cfg["dataset"]
    n_proc = jax.process_count()
    train_loader = instantiate(
        ds["train"],
        image_size=ds["image_size"],
        batch_size=int(ds["train_batch_size"]) // n_proc,
        cap_seq_size=cap_seq,
        cap_emb_dim=cap_dim,
        cap_drop_prob=ds.get("cap_drop_prob", 0.0),
        seed=cfg.get("seed", 18),
        process_index=jax.process_index(),
        process_count=n_proc,
    )
    print(
        f"Found {len(train_loader.dataset)} images in the training dataset",
        flush=True,
    )
    eval_loader = None
    if "eval" in ds:
        try:
            eval_loader = instantiate(
                ds["eval"],
                image_size=ds["image_size"],
                batch_size=int(ds["eval_batch_size"]) // n_proc,
                cap_seq_size=cap_seq,
                cap_emb_dim=cap_dim,
                seed=cfg.get("seed", 18),
                process_index=jax.process_index(),
                process_count=n_proc,
            )
            print(f"Found {len(eval_loader.dataset)} images in the eval dataset")
        except FileNotFoundError:
            print("eval dataset not found; online eval disabled")

    loggers = []
    for _name, log_conf in (cfg.get("logger") or {}).items():
        if isinstance(log_conf, dict) and "_target_" in log_conf:
            loggers.append(instantiate(log_conf))

    callbacks = []
    for _name, call_conf in (cfg.get("callbacks") or {}).items():
        if isinstance(call_conf, dict) and "_target_" in call_conf:
            callbacks.append(instantiate(call_conf))

    algorithms = cfg.get("algorithms") or {}
    ema_cfg = None
    if "ema" in algorithms:
        ema_cfg = {k: v for k, v in algorithms["ema"].items() if k != "_target_"}

    trainer_cfg = dict(cfg["trainer"])
    target = trainer_cfg.pop("_target_", "micro_diffusion_tpu.train.trainer.Trainer")
    trainer_cls = resolve_target(
        "micro_diffusion_tpu.train.trainer.Trainer"
        if target == "composer.Trainer"
        else target
    )
    return trainer_cls(
        model=model,
        optimizer={k: v for k, v in cfg["optimizer"].items() if k != "_target_"},
        schedulers=cfg["scheduler"],
        train_dataloader=train_loader,
        eval_dataloader=eval_loader,
        loggers=loggers,
        callbacks=callbacks,
        algorithms=algorithms,
        ema=ema_cfg,
        mesh_shape=(cfg.get("misc") or {}).get("mesh_shape"),
        **trainer_cfg,
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-path", default="configs")
    parser.add_argument("--config-name", required=True)
    parser.add_argument(
        "--multihost", action="store_true",
        help="call jax.distributed.initialize() (multi-host TPU pod slice); "
        "coordinator/process env comes from the TPU runtime",
    )
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)

    import os

    if args.multihost or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # Multi-host: one process per host over ICI/DCN; all collectives are emitted
        # by XLA from the NamedShardings (no NCCL/MPI equivalent needed).
        jax.distributed.initialize()

    cfg = load_config(args.config_path, args.config_name, args.overrides)
    trainer = build_from_config(cfg)
    trainer.fit()


if __name__ == "__main__":
    main(sys.argv[1:])
