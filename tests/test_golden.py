"""Golden-value regression tests: fixed-seed micro-DiT forward and EDM loss outputs
pinned to stored fixtures, so refactors (e.g. swapping the attention backend or fusing
kernels) are caught if they change numerics.

Regenerate with: python tests/test_golden.py --regen  (review the diff before
committing a new fixture!)
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from micro_diffusion_tpu.models.diffusion import LatentDiffusion
from micro_diffusion_tpu.models.dit import DiT

FIXTURE = os.path.join(os.path.dirname(__file__), "golden", "micro_dit.npz")


def build():
    dit = DiT(
        input_size=16, patch_size=2, in_channels=4, dim=64, depth=4, head_dim=16,
        multiple_of=32, caption_channels=32, qkv_multipliers=(0.5, 1.0),
        ffn_multipliers=(0.5, 4.0), use_patch_mixer=True, patch_mixer_depth=2,
        patch_mixer_dim=48, use_bias=False, num_experts=4, expert_capacity=2.0,
        dtype=jnp.float32,
    )
    model = LatentDiffusion(dit=dit, latent_res=16, train_mask_ratio=0.75,
                            latent_scale=1.0)
    rng = jax.random.PRNGKey(42)
    params = model.init(rng)
    # randomize the zero-init outputs so the golden values are informative
    params = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (
            leaf
            + 0.02
            * jax.random.normal(
                jax.random.PRNGKey(
                    __import__("zlib").crc32(str(path).encode()) % (2**31)
                ),
                leaf.shape,
            )
        ),
        params,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16))
    t = jnp.asarray([0.1, 0.7])
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 8, 32))
    return model, params, (x, t, y)


def compute():
    model, params, (x, t, y) = build()
    fwd = jax.jit(
        lambda p, x, t, y, r: model.dit.apply(
            p, x, t, y, mask_ratio=0.75, rngs={"mask": r}
        )["sample"]
    )
    sample = fwd(params, x, t, y, jax.random.PRNGKey(3))
    loss = jax.jit(lambda p, r, xx, yy: model.edm_loss(p, r, xx, yy, mask_ratio=0.75))(
        params, jax.random.PRNGKey(4), x, y
    )
    lat = jax.jit(
        lambda p, xx, yy: model.edm_sampler_loop(p, xx, yy, steps=4, cfg=3.0)
    )(params, x, y)
    return {
        "sample": np.asarray(sample),
        "loss": np.asarray(loss),
        "sampler": np.asarray(lat),
    }


def test_golden_forward_loss_sampler():
    got = compute()
    ref = np.load(FIXTURE)
    np.testing.assert_allclose(got["sample"], ref["sample"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["loss"], ref["loss"], rtol=1e-4)
    np.testing.assert_allclose(got["sampler"], ref["sampler"], rtol=1e-4, atol=1e-4)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez(FIXTURE, **compute())
        print(f"wrote {FIXTURE}")
