"""EDM latent-diffusion wrapper: loss, Heun sampler, CFG, generate() API.

Reproduces the reference LatentDiffusion (micro_diffusion/models/model.py:22-405) as a
functional JAX layer: the class holds static config + frozen encoder handles; all compute
paths are pure functions of (params, rng, data), jit-compiled by callers.

TPU deviations from the reference (deliberate, documented):
  * the EDM sigma schedule is computed host-side in float64 numpy (bit-identical to
    model.py:246-254) but the device sampling loop carries x in float32 - TPU has no fast
    f64 (reference accumulates in f64, model.py:257,281). The DiT itself evaluates in
    bf16/f32 in both implementations, which dominates the numerical error.
  * the sampler is a lax.scan over steps with a lax.cond Heun correction, so the DiT is
    traced twice rather than 59 times (reference model.py:258-296 is a Python loop).
"""

import dataclasses
import math
import os
from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import dit as model_zoo


@dataclasses.dataclass(frozen=True)
class EDMConfig:
    """EDM (Karras et al.) parameters (reference model.py:74-86)."""

    sigma_min: float = 0.002
    sigma_max: float = 80.0
    P_mean: float = -0.6
    P_std: float = 1.2
    sigma_data: float = 0.9
    num_steps: int = 18
    rho: float = 7.0
    S_churn: float = 0.0
    S_min: float = 0.0
    S_max: float = float("inf")
    S_noise: float = 1.0


def text_encoder_embedding_format(enc: str) -> tuple[int, int]:
    """(sequence length, embedding dim) per text encoder (reference utils.py:501-513)."""
    if enc in (
        "stabilityai/stable-diffusion-2-base",
        "runwayml/stable-diffusion-v1-5",
        "CompVis/stable-diffusion-v1-4",
        "openclip:hf-hub:apple/DFN5B-CLIP-ViT-H-14-378",
    ):
        return 77, 1024
    if enc == "DeepFloyd/t5-v1_1-xxl":
        return 120, 4096
    # Local HF CLIPTextModel snapshot (reference utils.py:465-469 accepts any HF
    # name via CLIPTextModel.from_pretrained; offline, that means a local dir).
    cfg_path = os.path.join(enc, "config.json")
    if os.path.isdir(enc) and os.path.exists(cfg_path):
        import json

        with open(cfg_path) as f:
            cfg = json.load(f)
        return int(cfg.get("max_position_embeddings", 77)), int(cfg["hidden_size"])
    raise ValueError(
        f"Please specify the sequence and embedding size of {enc} encoder"
    )


# Latent scaling factors for the supported VAEs (diffusers AutoencoderKL
# config.scaling_factor; reference model.py:92). Used when the VAE weights are not on
# disk; overridden by the actual config when a VAE is loaded.
VAE_SCALING_FACTORS = {
    "stabilityai/stable-diffusion-xl-base-1.0": 0.13025,
    "ostris/vae-kl-f8-d16": 1.0,
}


class LatentDiffusion:
    """Latent diffusion model: DiT denoiser + frozen VAE + frozen text encoder.

    Unlike the reference ComposerModel, this class is a thin static-config holder; all
    numerical entry points are pure functions suitable for jit/pjit:

        loss, aux = model.forward(params, rng, batch)        # training loss
        latents   = model.sample(params, rng, shape, y, ...) # EDM Heun sampling
        images    = model.generate(params, prompt=...)       # text -> image

    ``vae`` / ``text_encoder`` / ``tokenizer`` are optional duck-typed handles:
        vae.encode(params?, images) / vae.decode(latents), text_encoder.encode(ids),
        tokenizer.tokenize(texts) - see models/vae.py and models/text_encoders.py.
    """

    def __init__(
        self,
        dit: model_zoo.DiT,
        vae: Any = None,
        text_encoder: Any = None,
        tokenizer: Any = None,
        image_key: str = "image",
        text_key: str = "captions",
        image_latents_key: str = "image_latents",
        text_latents_key: str = "caption_latents",
        precomputed_latents: bool = True,
        dtype: str = "bfloat16",
        latent_res: int = 32,
        p_mean: float = -0.6,
        p_std: float = 1.2,
        train_mask_ratio: float = 0.0,
        latent_scale: Optional[float] = None,
    ):
        self.dit = dit
        self.vae = vae
        self.text_encoder = text_encoder
        self.tokenizer = tokenizer
        self.image_key = image_key
        self.text_key = text_key
        self.image_latents_key = image_latents_key
        self.text_latents_key = text_latents_key
        self.precomputed_latents = precomputed_latents
        self.dtype = dtype
        self.latent_res = latent_res
        self.edm_config = EDMConfig(P_mean=p_mean, P_std=p_std)
        self.train_mask_ratio = train_mask_ratio
        self.eval_mask_ratio = 0.0  # no masking during sampling/eval (model.py:88)
        assert self.train_mask_ratio >= 0, "Masking ratio must be non-negative!"
        if latent_scale is not None:
            self.latent_scale = latent_scale
        elif vae is not None and hasattr(vae, "scaling_factor"):
            self.latent_scale = float(vae.scaling_factor)
        else:
            self.latent_scale = 1.0
        self._sampler_cache: dict = {}

    # ----------------------------------------------------------------- params

    def init(self, rng: jax.Array) -> Any:
        """Initialize DiT parameters (frozen encoders hold their own params)."""
        b = 1
        s, d = (77, self.dit.caption_channels)
        x = jnp.zeros((b, self.dit.in_channels, self.latent_res, self.latent_res))
        t = jnp.zeros((b,))
        y = jnp.zeros((b, 1, s, d))
        rngs = {"params": rng, "mask": rng}
        return jax.jit(lambda: self.dit.init(rngs, x, t, y))()

    # ------------------------------------------------------------ EDM pieces

    def model_forward_wrapper(
        self,
        params: Any,
        x: jax.Array,
        sigma: jax.Array,
        y: jax.Array,
        model_forward_fxn: Callable,
        mask_ratio: float,
        **kwargs,
    ) -> dict:
        """EDM preconditioning around the raw DiT call (reference model.py:144-179)."""
        cfg_ = self.edm_config
        sigma = sigma.astype(jnp.float32).reshape(-1, 1, 1, 1)
        c_skip = cfg_.sigma_data**2 / (sigma**2 + cfg_.sigma_data**2)
        c_out = sigma * cfg_.sigma_data / jnp.sqrt(sigma**2 + cfg_.sigma_data**2)
        c_in = 1.0 / jnp.sqrt(cfg_.sigma_data**2 + sigma**2)
        c_noise = jnp.log(sigma) / 4.0

        out = model_forward_fxn(
            params,
            (c_in * x).astype(x.dtype),
            c_noise.reshape(-1),
            y,
            mask_ratio=mask_ratio,
            **kwargs,
        )
        d_x = c_skip * x + c_out * out["sample"].astype(jnp.float32)
        out = dict(out)
        out["sample"] = d_x
        return out

    def _dit_forward(self, params, x, t, y, cfg: float = 1.0, mask_ratio: float = 0.0,
                     rngs=None):
        return self.dit.apply(
            params, x, t, y, cfg=cfg, mask_ratio=mask_ratio, rngs=rngs
        )

    def edm_loss(
        self,
        params: Any,
        rng: jax.Array,
        x: jax.Array,
        y: jax.Array,
        mask_ratio: float = 0.0,
    ) -> jax.Array:
        """Log-normal-sigma EDM loss with mask-aware patch pooling (model.py:181-210)."""
        cfg_ = self.edm_config
        rng_sigma, rng_noise, rng_mask = jax.random.split(rng, 3)

        x = x.astype(jnp.float32)
        y = y.astype(jnp.float32)
        rnd_normal = jax.random.normal(rng_sigma, (x.shape[0], 1, 1, 1))
        sigma = jnp.exp(rnd_normal * cfg_.P_std + cfg_.P_mean)
        weight = (sigma**2 + cfg_.sigma_data**2) / (sigma * cfg_.sigma_data) ** 2
        n = jax.random.normal(rng_noise, x.shape) * sigma

        fwd = partial(self._dit_forward, rngs={"mask": rng_mask})
        model_out = self.model_forward_wrapper(
            params, x + n, sigma, y, fwd, mask_ratio=mask_ratio
        )
        d_xn = model_out["sample"]
        loss = weight * (d_xn - x) ** 2  # (N, C, H, W)

        if mask_ratio > 0:
            assert model_out.get("mask") is not None, (
                "Masking is only recommended during training"
            )
            # Per-patch pooled loss over unmasked patches only (model.py:201-209).
            p = self.dit.patch_size
            loss = jnp.mean(loss, axis=1)  # (N, H, W)
            n_, h, w = loss.shape
            loss = loss.reshape(n_, h // p, p, w // p, p).mean(axis=(2, 4))
            loss = loss.reshape(n_, -1)  # (N, T)
            unmask = 1.0 - model_out["mask"]
            loss = jnp.sum(loss * unmask, axis=1) / jnp.sum(unmask, axis=1)
        return jnp.mean(loss)

    # ------------------------------------------------------------- training

    def forward(
        self, params: Any, rng: jax.Array, batch: dict, train: bool = True
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Training/eval forward: precomputed latents -> EDM loss (model.py:104-142).

        Returns (loss, latents, conditioning) like the reference.
        """
        if self.precomputed_latents and self.image_latents_key in batch:
            latents = batch[self.image_latents_key]
        else:
            assert self.vae is not None, "need a VAE to encode raw images"
            latents = self.vae.encode(batch[self.image_key], rng=rng)
            latents = latents * self.latent_scale

        if self.precomputed_latents and self.text_latents_key in batch:
            conditioning = batch[self.text_latents_key]
        else:
            assert self.text_encoder is not None
            conditioning = self.text_encoder.encode(batch[self.text_key])[0]

        # Zero out dropped captions for CFG training (model.py:131-135).
        if "drop_caption_mask" in batch:
            mask = batch["drop_caption_mask"].reshape(
                (-1,) + (1,) * (conditioning.ndim - 1)
            )
            conditioning = conditioning * mask

        loss = self.edm_loss(
            params,
            rng,
            latents.astype(jnp.float32),
            conditioning.astype(jnp.float32),
            mask_ratio=self.train_mask_ratio if train else self.eval_mask_ratio,
        )
        return loss, latents, conditioning

    # ------------------------------------------------------------- sampling

    def _sigma_schedule(self, num_steps: int) -> np.ndarray:
        """rho-spaced sigma schedule, float64 on host (bit-identical to model.py:246-254)."""
        cfg_ = self.edm_config
        i = np.arange(num_steps, dtype=np.float64)
        t = (
            cfg_.sigma_max ** (1 / cfg_.rho)
            + i / (num_steps - 1)
            * (cfg_.sigma_min ** (1 / cfg_.rho) - cfg_.sigma_max ** (1 / cfg_.rho))
        ) ** cfg_.rho
        return np.concatenate([t, np.zeros(1)])

    def edm_sampler_loop(
        self,
        params: Any,
        x: jax.Array,
        y: jax.Array,
        steps: Optional[int] = None,
        cfg: float = 1.0,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """EDM Heun (2nd-order) sampling loop (reference model.py:231-297).

        Implemented as lax.scan over steps; the Heun correction is a lax.cond so the DiT
        traces once per branch instead of once per step.
        """
        cfg_ = self.edm_config
        num_steps = cfg_.num_steps if steps is None else steps
        t_np = self._sigma_schedule(num_steps)

        # Per-step churn gamma is static host math (S_churn=0 in all recipes).
        gammas = np.array(
            [
                min(cfg_.S_churn / num_steps, math.sqrt(2) - 1)
                if cfg_.S_min <= tc <= cfg_.S_max
                else 0.0
                for tc in t_np[:-1]
            ]
        )

        fwd = (
            partial(self._dit_forward, cfg=cfg) if cfg > 1.0 else self._dit_forward
        )
        wrapper = partial(
            self.model_forward_wrapper, params, model_forward_fxn=fwd, mask_ratio=0.0
        )
        if rng is None:
            rng = jax.random.PRNGKey(0)

        x_next = x.astype(jnp.float32) * t_np[0]
        ts = jnp.stack(
            [
                jnp.asarray(t_np[:-1], jnp.float32),
                jnp.asarray(t_np[1:], jnp.float32),
                jnp.asarray(gammas, jnp.float32),
                jnp.arange(num_steps, dtype=jnp.float32),
            ],
            axis=1,
        )

        def body(x_cur, inp):
            t_cur, t_next, gamma, idx = inp[0], inp[1], inp[2], inp[3]
            t_hat = t_cur + gamma * t_cur
            noise = jax.random.normal(
                jax.random.fold_in(rng, idx.astype(jnp.int32)), x_cur.shape
            )
            x_hat = x_cur + jnp.sqrt(
                jnp.maximum(t_hat**2 - t_cur**2, 0.0)
            ) * cfg_.S_noise * noise

            denoised = wrapper(x=x_hat, sigma=t_hat[None], y=y)["sample"]
            d_cur = (x_hat - denoised) / t_hat
            x_euler = x_hat + (t_next - t_hat) * d_cur

            def heun(x_n):
                denoised2 = wrapper(x=x_n, sigma=t_next[None], y=y)["sample"]
                d_prime = (x_n - denoised2) / t_next
                return x_hat + (t_next - t_hat) * (0.5 * d_cur + 0.5 * d_prime)

            x_out = jax.lax.cond(idx < num_steps - 1, heun, lambda v: v, x_euler)
            return x_out, None

        x_final, _ = jax.lax.scan(body, x_next, ts)
        return x_final

    def generate(
        self,
        params: Any,
        prompt: Optional[Sequence[str]] = None,
        tokenized_prompts: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        text_embeddings: Optional[jax.Array] = None,
        guidance_scale: float = 5.0,
        num_inference_steps: int = 30,
        seed: Optional[int] = None,
        return_only_latents: bool = False,
    ) -> jax.Array:
        """Text -> image generation (reference model.py:299-353).

        Accepts raw prompts (requires tokenizer+text_encoder), pre-tokenized prompts
        (requires text_encoder), or precomputed ``text_embeddings``.
        """
        assert (
            prompt is not None or tokenized_prompts is not None
            or text_embeddings is not None
        ), "Must provide either prompt or tokenized prompts"

        if text_embeddings is None:
            if tokenized_prompts is None:
                out = self.tokenizer.tokenize(list(prompt))
                tokenized_prompts = out["input_ids"]
                attention_mask = out.get("attention_mask")
            text_embeddings = self.text_encoder.encode(
                tokenized_prompts, attention_mask=attention_mask
            )[0]

        rng = jax.random.PRNGKey(seed if seed else 0)
        rng_latents, rng_sample = jax.random.split(rng)
        latents = jax.random.normal(
            rng_latents,
            (
                text_embeddings.shape[0],
                self.dit.in_channels,
                self.latent_res,
                self.latent_res,
            ),
            dtype=jnp.float32,
        )

        key = (num_inference_steps, guidance_scale)
        if key not in self._sampler_cache:
            self._sampler_cache[key] = jax.jit(
                partial(
                    self.edm_sampler_loop,
                    steps=num_inference_steps,
                    cfg=guidance_scale,
                )
            )
        sample = self._sampler_cache[key]
        latents = sample(params, latents, jnp.asarray(text_embeddings), rng=rng_sample)

        if return_only_latents:
            return latents

        assert self.vae is not None, "need a VAE to decode latents into images"
        latents = latents / self.latent_scale
        image = self.vae.decode(latents)
        image = jnp.clip(image / 2.0 + 0.5, 0.0, 1.0)
        return image.astype(jnp.float32)


def create_latent_diffusion(
    vae_name: str = "stabilityai/stable-diffusion-xl-base-1.0",
    text_encoder_name: str = "openclip:hf-hub:apple/DFN5B-CLIP-ViT-H-14-378",
    dit_arch: str = "MicroDiT_XL_2",
    latent_res: int = 32,
    in_channels: int = 4,
    pos_interp_scale: float = 1.0,
    dtype: str = "bfloat16",
    precomputed_latents: bool = True,
    p_mean: float = -0.6,
    p_std: float = 1.2,
    train_mask_ratio: float = 0.0,
    load_encoders: bool = False,
    weights_dir: Optional[str] = None,
    text_encoder_weights_dir: Optional[str] = None,
    tokenizer_dir: Optional[str] = None,
    remat: bool = False,
    remat_policy: str = "full",
    moe_dispatch: str = "onehot",
    attention_impl: str = "auto",
    fused_adaln: bool = False,
) -> LatentDiffusion:
    """Model factory with the reference signature (model.py:356-405).

    ``load_encoders=False`` (default) builds the DiT-only model for latent-space training
    (precomputed latents, the micro-budget regime); pass True with ``weights_dir``
    pointing at local HF snapshots to attach the frozen VAE / text encoder for
    ``generate()`` and precompute. The VAE and text encoder are different HF repos, so
    their snapshot dirs are separate: ``weights_dir`` holds the VAE,
    ``text_encoder_weights_dir`` / ``tokenizer_dir`` hold the encoder/tokenizer
    (each defaulting to ``weights_dir`` for single-snapshot layouts).
    """
    s, d = text_encoder_embedding_format(text_encoder_name)

    dit = getattr(model_zoo, dit_arch)(
        input_size=latent_res,
        caption_channels=d,
        pos_interp_scale=pos_interp_scale,
        in_channels=in_channels,
        dtype={"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
            dtype
        ],
        # TPU memory/throughput knobs (no reference equivalent - H100s have 80GB):
        # per-block rematerialization and its policy ('full' | 'dots'), reachable
        # from the yaml recipes' model block.
        remat=remat,
        remat_policy=remat_policy,
        # EC-MoE dispatch implementation (static module attribute; see
        # models/layers.py FeedForwardECMoe.dispatch for the variants)
        moe_dispatch=moe_dispatch,
        # attention backend ('auto'|'xla'|'flash'|'flash_bthd'; ops/attention.py)
        attention_impl=attention_impl,
        # fused adaLN LayerNorm+modulate Pallas pass (ops/adaln.py); a static
        # config field, not an env var
        fused_adaln=fused_adaln,
    )

    vae = text_encoder = tokenizer = None
    if load_encoders:
        from .vae import AutoencoderKL

        # VAE compute follows the factory dtype like the reference's
        # torch_dtype (model.py:379-382, bfloat16 default); params/statistics
        # /outputs stay fp32 (vae.py)
        vae = AutoencoderKL.from_pretrained(
            vae_name, weights_dir=weights_dir,
            compute_dtype={"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                           "float16": jnp.bfloat16}[dtype],
        )
        from .text_encoders import UniversalTextEncoder, UniversalTokenizer

        text_encoder = UniversalTextEncoder(
            text_encoder_name, dtype=dtype,
            weights_dir=text_encoder_weights_dir or weights_dir,
        )
        tokenizer = UniversalTokenizer(
            text_encoder_name, tokenizer_dir=tokenizer_dir
        )

    return LatentDiffusion(
        dit=dit,
        vae=vae,
        text_encoder=text_encoder,
        tokenizer=tokenizer,
        precomputed_latents=precomputed_latents,
        dtype=dtype,
        latent_res=latent_res,
        p_mean=p_mean,
        p_std=p_std,
        train_mask_ratio=train_mask_ratio,
        latent_scale=VAE_SCALING_FACTORS.get(vae_name),
    )
