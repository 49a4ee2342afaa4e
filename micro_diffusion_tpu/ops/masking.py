"""Deferred patch masking - the reference's core FLOP-saving trick.

Semantics match micro_diffusion/models/utils.py:382-426 (get_mask / mask_out_token /
unmask_tokens): per-sample random keep-set via argsort of uniform noise; kept tokens are
gathered out so the backbone sees only ``T * (1 - mask_ratio)`` tokens; after the final
layer the kept tokens are scattered back with a zero mask token.

TPU notes: the keep-count is a static Python int per config, so all shapes are static
under jit; the gather/scatter are `take_along_axis` ops that stay on device.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TokenMask(NamedTuple):
    mask: jax.Array  # (B, T) float, 0 = keep, 1 = removed
    ids_keep: jax.Array  # (B, len_keep) int32
    ids_restore: jax.Array  # (B, T) int32


def make_token_mask(rng: jax.Array, batch: int, length: int, mask_ratio: float) -> TokenMask:
    """Per-sample random token keep-set (reference utils.py:382-403).

    ``len_keep = int(length * (1 - mask_ratio))`` - a static int, so downstream shapes are
    jit-static.
    """
    len_keep = int(length * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (batch, length))
    ids_shuffle = jnp.argsort(noise, axis=1).astype(jnp.int32)
    ids_restore = jnp.argsort(ids_shuffle, axis=1).astype(jnp.int32)
    ids_keep = ids_shuffle[:, :len_keep]

    mask = jnp.ones((batch, length), dtype=jnp.float32)
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return TokenMask(mask=mask, ids_keep=ids_keep, ids_restore=ids_restore)


def gather_tokens(x: jax.Array, ids_keep: jax.Array) -> jax.Array:
    """Gather kept tokens: (B, T, D) -> (B, len_keep, D) (reference utils.py:406-414)."""
    return jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)


def scatter_tokens(x: jax.Array, ids_restore: jax.Array, mask_token: jax.Array) -> jax.Array:
    """Scatter kept tokens back into the full sequence (reference utils.py:417-426).

    Missing positions are filled with ``mask_token`` (shape (1, 1, D) or broadcastable).
    """
    b, len_keep, d = x.shape
    t = ids_restore.shape[1]
    fill = jnp.broadcast_to(mask_token.astype(x.dtype), (b, t - len_keep, d))
    x_full = jnp.concatenate([x, fill], axis=1)
    return jnp.take_along_axis(x_full, ids_restore[:, :, None], axis=1)
