"""micro_diffusion_tpu: a TPU-native (JAX / XLA / Pallas / pjit) text-to-image latent
diffusion framework with the capabilities of SonyResearch/micro_diffusion ("MicroDiT").

Layout:
    models/    - DiT backbone, EDM diffusion wrapper, frozen encoders (VAE / CLIP / T5),
                 torch-checkpoint interop
    ops/       - TPU compute ops: attention (XLA + Pallas flash), token masking, fused adaLN
    parallel/  - device mesh construction and sharding rules (dp / fsdp / expert axes)
    train/     - jit'd train step, optimizer/schedules/EMA, trainer loop, callbacks, config
    datasets/  - MDS shard format reader/writer, streaming latents loader, prepare pipelines
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (keeps bare `import micro_diffusion_tpu` light)."""
    if name in ("create_latent_diffusion", "LatentDiffusion"):
        from .models import diffusion

        return getattr(diffusion, name)
    if name in ("DiT", "MicroDiT_Tiny_2", "MicroDiT_XL_2", "MicroDiT_Micro_2"):
        from .models import dit

        return getattr(dit, name)
    if name == "build_streaming_latents_dataloader":
        from .datasets import latents_loader

        return latents_loader.build_streaming_latents_dataloader
    if name == "Trainer":
        from .train import trainer

        return trainer.Trainer
    raise AttributeError(name)
