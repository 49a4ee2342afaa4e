"""EDM diffusion layer tests: preconditioning coefficients, sigma schedule, masked loss
pooling, Heun sampler against a float64 numpy replica of the reference loop, and the
generate() API (latents-only path)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from micro_diffusion_tpu.models.diffusion import (
    EDMConfig,
    LatentDiffusion,
    create_latent_diffusion,
    text_encoder_embedding_format,
)
from micro_diffusion_tpu.models.dit import DiT


def micro_model(train_mask_ratio=0.0, **dit_kw):
    defaults = dict(
        input_size=16, patch_size=2, in_channels=4, dim=64, depth=2, head_dim=16,
        multiple_of=32, caption_channels=32, qkv_multipliers=(1.0,),
        ffn_multipliers=(2.0,), use_patch_mixer=True, patch_mixer_depth=1,
        patch_mixer_dim=48, use_bias=False, num_experts=4, expert_capacity=2.0,
        dtype=jnp.float32,
    )
    defaults.update(dit_kw)
    dit = DiT(**defaults)
    return LatentDiffusion(
        dit=dit, latent_res=16, train_mask_ratio=train_mask_ratio, latent_scale=1.0
    )


class StubDiffusion(LatentDiffusion):
    """LatentDiffusion with the DiT replaced by a deterministic stub F(x) = alpha * x."""

    def __init__(self, alpha=0.0, **kw):
        super().__init__(**kw)
        self.alpha = alpha

    def _dit_forward(self, params, x, t, y, cfg=1.0, mask_ratio=0.0, rngs=None):
        return {"sample": self.alpha * x, "mask": None}


def test_text_encoder_embedding_format():
    assert text_encoder_embedding_format(
        "openclip:hf-hub:apple/DFN5B-CLIP-ViT-H-14-378"
    ) == (77, 1024)
    assert text_encoder_embedding_format("DeepFloyd/t5-v1_1-xxl") == (120, 4096)


def test_sigma_schedule_reference_values():
    model = micro_model()
    t = model._sigma_schedule(18)
    assert t.shape == (19,)
    assert t[0] == 80.0
    np.testing.assert_allclose(t[17], 0.002, rtol=1e-12)
    assert t[18] == 0.0
    assert np.all(np.diff(t) < 0)
    # spot value from the closed form (rho=7): i=9 of 18
    rho = 7.0
    expect = (
        80 ** (1 / rho) + 9 / 17 * (0.002 ** (1 / rho) - 80 ** (1 / rho))
    ) ** rho
    np.testing.assert_allclose(t[9], expect, rtol=1e-12)


def test_preconditioning_coefficients():
    """c_skip/c_out/c_in/c_noise per Karras EDM, sigma_data=0.9 (model.py:154-164)."""
    model = StubDiffusion(alpha=1.0, dit=micro_model().dit, latent_scale=1.0)
    sd = 0.9
    x = jnp.ones((1, 4, 16, 16), jnp.float32) * 2.0
    for sigma in (0.002, 0.5, 80.0):
        out = model.model_forward_wrapper(
            None, x, jnp.asarray([sigma]), None,
            model_forward_fxn=lambda p, xx, tt, yy, mask_ratio: {
                "sample": xx, "t_seen": tt,
            },
            mask_ratio=0.0,
        )
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / math.sqrt(sigma**2 + sd**2)
        c_in = 1.0 / math.sqrt(sd**2 + sigma**2)
        expected = c_skip * 2.0 + c_out * (c_in * 2.0)
        np.testing.assert_allclose(
            np.asarray(out["sample"]), expected, rtol=1e-5
        )
        np.testing.assert_allclose(
            float(out["t_seen"][0]), math.log(sigma) / 4, rtol=1e-5
        )


def test_edm_loss_zero_model_closed_form():
    """With a stub F(x)=0, loss = mean(weight * (c_skip-1)^2 * (x+n)^2-ish closed form.

    D(x+n) = c_skip*(x+n); loss = weight * (c_skip*(x+n) - x)^2. We verify against a
    numpy recomputation using the same rng draws.
    """
    model = StubDiffusion(alpha=0.0, dit=micro_model().dit, latent_scale=1.0)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 16, 16))
    y = jnp.zeros((2, 1, 8, 32))
    loss = jax.jit(lambda p, r, xx, yy: model.edm_loss(p, r, xx, yy))(None, rng, x, y)

    # numpy replication with identical rng stream
    rng_sigma, rng_noise, _ = jax.random.split(rng, 3)
    rnd = np.asarray(jax.random.normal(rng_sigma, (2, 1, 1, 1)))
    sigma = np.exp(rnd * 1.2 + (-0.6))
    weight = (sigma**2 + 0.9**2) / (sigma * 0.9) ** 2
    n = np.asarray(jax.random.normal(rng_noise, x.shape)) * sigma
    xn = np.asarray(x) + n
    c_skip = 0.9**2 / (sigma**2 + 0.9**2)
    d = c_skip * xn  # F=0 -> D = c_skip * x_noised
    expected = np.mean(weight * (d - np.asarray(x)) ** 2)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_masked_loss_pooling():
    """Mask-aware loss: per-patch avg pooling then mean over unmasked (model.py:201-209)."""

    class MaskStub(StubDiffusion):
        def _dit_forward(self, params, x, t, y, cfg=1.0, mask_ratio=0.0, rngs=None):
            b = x.shape[0]
            t_tokens = (x.shape[-1] // 2) ** 2
            # mask out the first half of patches
            mask = jnp.concatenate(
                [jnp.ones((b, t_tokens // 2)), jnp.zeros((b, t_tokens // 2))], axis=1
            )
            return {"sample": jnp.zeros_like(x), "mask": mask}

    model = MaskStub(alpha=0.0, dit=micro_model().dit, latent_scale=1.0)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 16, 16))
    y = jnp.zeros((2, 1, 8, 32))
    loss = jax.jit(
        lambda p, r, xx, yy: model.edm_loss(p, r, xx, yy, mask_ratio=0.5)
    )(None, rng, x, y)

    rng_sigma, rng_noise, _ = jax.random.split(rng, 3)
    rnd = np.asarray(jax.random.normal(rng_sigma, (2, 1, 1, 1)))
    sigma = np.exp(rnd * 1.2 - 0.6)
    weight = (sigma**2 + 0.81) / (sigma * 0.9) ** 2
    n = np.asarray(jax.random.normal(rng_noise, x.shape)) * sigma
    xn = np.asarray(x) + n
    c_skip = 0.81 / (sigma**2 + 0.81)
    per_el = weight * (c_skip * xn - np.asarray(x)) ** 2  # (N,C,H,W)
    per_patch = per_el.mean(1).reshape(2, 8, 2, 8, 2).mean(axis=(2, 4)).reshape(2, -1)
    unmask = np.concatenate([np.zeros((2, 32)), np.ones((2, 32))], axis=1)
    expected = ((per_patch * unmask).sum(1) / unmask.sum(1)).mean()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_sampler_matches_numpy_reference_loop():
    """Our lax.scan Heun sampler vs a float64 numpy port of the reference loop
    (model.py:256-297) with the same stub denoiser F(x) = 0.1 * x."""
    alpha = 0.1
    model = StubDiffusion(alpha=alpha, dit=micro_model().dit, latent_scale=1.0)
    x0 = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16)))
    steps = 8

    ours = jax.jit(
        lambda xx: model.edm_sampler_loop(None, xx, None, steps=steps)
    )(jnp.asarray(x0))

    # numpy float64 reference
    sd = 0.9
    t_steps = model._sigma_schedule(steps)

    def denoise(x, sigma):
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / np.sqrt(sigma**2 + sd**2)
        c_in = 1.0 / np.sqrt(sd**2 + sigma**2)
        f = alpha * (c_in * x)
        return c_skip * x + c_out * f

    x_next = x0.astype(np.float64) * t_steps[0]
    for i, (t_cur, t_next) in enumerate(zip(t_steps[:-1], t_steps[1:])):
        x_cur = x_next
        t_hat = t_cur  # S_churn = 0
        x_hat = x_cur
        d_cur = (x_hat - denoise(x_hat, t_hat)) / t_hat
        x_next = x_hat + (t_next - t_hat) * d_cur
        if i < steps - 1:
            d_prime = (x_next - denoise(x_next, t_next)) / t_next
            x_next = x_hat + (t_next - t_hat) * (0.5 * d_cur + 0.5 * d_prime)

    # fp32 device loop vs fp64 reference accumulation: the sampler starts at x*80, so
    # absolute drift of ~1e-3 over the Heun steps is the documented deliberate deviation
    # (see diffusion.py module docstring).
    np.testing.assert_allclose(
        np.asarray(ours), x_next.astype(np.float32), rtol=1e-3, atol=2e-3
    )


def test_generate_latents_only():
    model = micro_model()
    params = model.init(jax.random.PRNGKey(0))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8, 32))
    lat = model.generate(
        params, text_embeddings=emb, guidance_scale=5.0, num_inference_steps=4,
        seed=2024, return_only_latents=True,
    )
    assert lat.shape == (2, 4, 16, 16)
    assert np.all(np.isfinite(np.asarray(lat)))
    # seeded determinism
    lat2 = model.generate(
        params, text_embeddings=emb, guidance_scale=5.0, num_inference_steps=4,
        seed=2024, return_only_latents=True,
    )
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(lat2))
    # different seed differs
    lat3 = model.generate(
        params, text_embeddings=emb, guidance_scale=5.0, num_inference_steps=4,
        seed=7, return_only_latents=True,
    )
    assert not np.array_equal(np.asarray(lat), np.asarray(lat3))


def test_forward_training_path():
    model = micro_model(train_mask_ratio=0.75)
    params = model.init(jax.random.PRNGKey(0))
    batch = {
        "image_latents": jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16)),
        "caption_latents": jax.random.normal(jax.random.PRNGKey(2), (2, 1, 8, 32)),
        "drop_caption_mask": jnp.asarray([1.0, 0.0]),
    }
    loss, latents, cond = jax.jit(
        lambda p, r, b: model.forward(p, r, b)
    )(params, jax.random.PRNGKey(3), batch)
    assert np.isfinite(float(loss))
    # dropped caption (sample 1) must be zeroed
    np.testing.assert_array_equal(np.asarray(cond[1]), 0.0)
    assert not np.allclose(np.asarray(cond[0]), 0.0)


def test_create_latent_diffusion_signature():
    model = create_latent_diffusion(
        dit_arch="MicroDiT_Tiny_2", latent_res=32, in_channels=4,
        pos_interp_scale=1.0, train_mask_ratio=0.75,
    )
    assert model.dit.input_size == 32
    assert model.dit.caption_channels == 1024
    assert model.train_mask_ratio == 0.75
    assert model.latent_scale == 0.13025  # SDXL VAE scaling factor
    assert model.edm_config.P_mean == -0.6 and model.edm_config.P_std == 1.2


def test_create_latent_diffusion_ostris_16ch():
    """16-channel Ostris VAE variant (reference model.py:381, README.md:60)."""
    model = create_latent_diffusion(
        vae_name="ostris/vae-kl-f8-d16", dit_arch="MicroDiT_Tiny_2",
        latent_res=32, in_channels=16,
    )
    assert model.dit.in_channels == 16
    assert model.latent_scale == 1.0
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))
    # x_embedder consumes 16 channels
    k = params["params"]["x_embedder"]["proj"]["kernel"]
    assert k.shape == (2, 2, 16, 512)


def test_sampler_churn_branch():
    """S_churn > 0 path (gamma noise injection, model.py:260-271): verify against a
    numpy replica using the same per-step fold_in noise draws."""
    import dataclasses

    alpha = 0.1
    model = StubDiffusion(alpha=alpha, dit=micro_model().dit, latent_scale=1.0)
    model.edm_config = dataclasses.replace(
        model.edm_config, S_churn=4.0, S_min=0.01, S_max=60.0, S_noise=1.003
    )
    steps = 6
    x0 = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16)))
    rng = jax.random.PRNGKey(5)
    ours = jax.jit(
        lambda xx: model.edm_sampler_loop(None, xx, None, steps=steps, rng=rng)
    )(jnp.asarray(x0))

    cfg = model.edm_config
    sd = 0.9
    t_steps = model._sigma_schedule(steps)

    def denoise(x, sigma):
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / np.sqrt(sigma**2 + sd**2)
        c_in = 1.0 / np.sqrt(sd**2 + sigma**2)
        return c_skip * x + c_out * (alpha * (c_in * x))

    x_next = x0.astype(np.float64) * t_steps[0]
    for i, (t_cur, t_next) in enumerate(zip(t_steps[:-1], t_steps[1:])):
        x_cur = x_next
        gamma = (
            min(cfg.S_churn / steps, math.sqrt(2) - 1)
            if cfg.S_min <= t_cur <= cfg.S_max else 0.0
        )
        t_hat = t_cur + gamma * t_cur
        noise = np.asarray(
            jax.random.normal(jax.random.fold_in(rng, i), x_cur.shape)
        )
        x_hat = x_cur + np.sqrt(max(t_hat**2 - t_cur**2, 0.0)) * cfg.S_noise * noise
        d_cur = (x_hat - denoise(x_hat, t_hat)) / t_hat
        x_next = x_hat + (t_next - t_hat) * d_cur
        if i < steps - 1:
            d_prime = (x_next - denoise(x_next, t_next)) / t_next
            x_next = x_hat + (t_next - t_hat) * (0.5 * d_cur + 0.5 * d_prime)

    np.testing.assert_allclose(
        np.asarray(ours), x_next.astype(np.float32), rtol=2e-3, atol=2e-3
    )
