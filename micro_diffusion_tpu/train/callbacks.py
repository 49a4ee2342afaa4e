"""Observability: loggers and callbacks.

First-party equivalents of the reference's Composer callbacks (SURVEY.md #5):
SpeedMonitor / LRMonitor / OptimizerMonitor / RuntimeEstimator
(configs/res_256_pretrain.yaml:70-79), NaNCatcher and LogDiffusionImages
(micro_diffusion/models/callbacks.py), TensorboardLogger (yaml logger block).
"""

import json
import os
import time
from collections import deque
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


class Logger:
    def log_scalars(self, scalars: Dict[str, float], step: int) -> None:
        raise NotImplementedError

    def log_images(self, name: str, images: np.ndarray, step: int) -> None:
        pass

    def close(self) -> None:
        pass


class TensorboardLogger(Logger):
    """Tensorboard logger (falls back to JSONL when tensorboard is unavailable)."""

    def __init__(self, log_dir: Optional[str] = None, **_: Any):
        self.log_dir = log_dir or "./runs"
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=self.log_dir)
        except Exception:
            os.makedirs(self.log_dir, exist_ok=True)
            self._writer = None
            self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")

    def log_scalars(self, scalars: Dict[str, float], step: int) -> None:
        if self._writer is not None:
            for k, v in scalars.items():
                self._writer.add_scalar(k, v, step)
        else:
            self._jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
            self._jsonl.flush()

    def log_images(self, name: str, images: np.ndarray, step: int) -> None:
        if self._writer is not None:
            import torch

            arr = torch.from_numpy(np.asarray(images))
            if arr.ndim == 3:  # (C, H, W)
                self._writer.add_image(name, arr, step)
            else:  # (N, C, H, W)
                self._writer.add_images(name, arr, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
        else:
            self._jsonl.close()


class JSONLLogger(Logger):
    def __init__(self, path: str = "./metrics.jsonl", **_: Any):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def log_scalars(self, scalars, step):
        self._f.write(json.dumps({"step": step, **scalars}) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


# ----------------------------------------------------------------------- callbacks


class Callback:
    def fit_start(self, trainer) -> None:
        pass

    def step_end(self, trainer, metrics: Dict[str, float]) -> None:
        """Called with host-side metric values every metric window (not every step -
        fetching device values each step would stall the pipeline)."""

    def eval_end(self, trainer, eval_loss: float) -> None:
        pass

    def fit_end(self, trainer) -> None:
        pass


class SpeedMonitor(Callback):
    """images/sec (per chip and global), windowed (Composer SpeedMonitor parity)."""

    def __init__(self, window_size: int = 3, **_: Any):
        self.window_size = window_size
        self._times: deque = deque(maxlen=window_size + 1)
        self._steps: deque = deque(maxlen=window_size + 1)

    def step_end(self, trainer, metrics) -> None:
        self._times.append(time.time())
        self._steps.append(int(trainer.global_step))
        if len(self._times) >= 2:
            dt = self._times[-1] - self._times[0]
            dsteps = self._steps[-1] - self._steps[0]
            if dt > 0 and dsteps > 0:
                sps = dsteps / dt
                ips = sps * trainer.global_batch_size
                trainer.log(
                    {
                        "throughput/steps_per_sec": sps,
                        "throughput/images_per_sec": ips,
                        "throughput/images_per_sec_per_chip": ips
                        / max(trainer.num_chips, 1),
                    }
                )


class LRMonitor(Callback):
    def __init__(self, **_: Any):
        pass

    def step_end(self, trainer, metrics) -> None:
        if "lr" in metrics:
            trainer.log({"lr-AdamW/group0": float(metrics["lr"])})


class OptimizerMonitor(Callback):
    """Gradient-norm logging (Composer OptimizerMonitor parity)."""

    def __init__(self, **_: Any):
        pass

    def step_end(self, trainer, metrics) -> None:
        if "grad_norm" in metrics:
            trainer.log(
                {"l2_norm/grad/global": float(metrics["grad_norm"])}
            )


class RuntimeEstimator(Callback):
    def __init__(self, **_: Any):
        self._start: Optional[float] = None
        self._start_step = 0

    def fit_start(self, trainer) -> None:
        self._start = time.time()
        self._start_step = int(trainer.global_step)

    def step_end(self, trainer, metrics) -> None:
        done = int(trainer.global_step) - self._start_step
        if done <= 0 or self._start is None:
            return
        rate = (time.time() - self._start) / done
        remaining = (trainer.max_steps - int(trainer.global_step)) * rate
        trainer.log({"time/remaining_estimate_hours": remaining / 3600.0})


class NaNCatcher(Callback):
    """Raise on NaN loss (reference callbacks.py:47-64). Checked at the metric window
    cadence - a NaN persists in subsequent losses, so windowed checking still halts."""

    def __init__(self, **_: Any):
        pass

    def step_end(self, trainer, metrics) -> None:
        loss = metrics.get("loss")
        if loss is not None and not np.isfinite(loss):
            raise RuntimeError(f"Train loss contains a NaN (step {trainer.global_step}).")


class LogDiffusionImages(Callback):
    """Generate images for fixed prompts at each eval (reference callbacks.py:9-44).

    Requires the model to have a text encoder + VAE attached (generate() path); when
    encoders are absent (latent-only training), precomputed prompt embeddings can be
    passed via ``prompt_latents_path`` (an .npy of shape (P, 1, L, D)); otherwise the
    callback logs nothing and warns once.
    """

    def __init__(
        self,
        prompts: Optional[Sequence[str]] = None,
        prompts_file: Optional[str] = None,
        sampling_steps: int = 30,
        guidance_scale: float = 5.0,
        seed: Optional[int] = 1138,
        prompt_latents_path: Optional[str] = None,
        **_: Any,
    ):
        if prompts is None and prompts_file:
            import yaml

            with open(prompts_file) as f:
                prompts = yaml.safe_load(f)["prompts"]
        self.prompts = list(prompts or [])
        self.sampling_steps = sampling_steps
        self.guidance_scale = guidance_scale
        self.seed = seed
        self.prompt_latents_path = prompt_latents_path
        self._warned = False

    def eval_end(self, trainer, eval_loss) -> None:
        model = trainer.model
        params = trainer.eval_params()
        kwargs: Dict[str, Any] = {}
        if model.tokenizer is not None and model.text_encoder is not None:
            kwargs["prompt"] = self.prompts
        elif self.prompt_latents_path:
            emb = np.load(self.prompt_latents_path)
            kwargs["text_embeddings"] = emb
        else:
            if not self._warned:
                trainer.print(
                    "LogDiffusionImages: no text encoder/tokenizer and no "
                    "prompt_latents_path; skipping image logging"
                )
                self._warned = True
            return
        out = model.generate(
            params,
            guidance_scale=self.guidance_scale,
            num_inference_steps=self.sampling_steps,
            seed=self.seed,
            return_only_latents=model.vae is None,
            **kwargs,
        )
        images = np.asarray(out)
        if model.vae is None:
            # log latent statistics instead of images
            trainer.log({"images/latent_std": float(images.std())})
            return
        # fall back to index names when driven by precomputed prompt embeddings
        names = self.prompts or [
            f"prompt_{i}" for i in range(images.shape[0])
        ]
        for i, prompt in enumerate(names[: images.shape[0]]):
            for logger in trainer.loggers:
                logger.log_images(prompt[:100], images[i], int(trainer.global_step))
