"""Attention ops for TPU.

The reference (micro_diffusion/models/utils.py:127-132,188-193) relies on torch
``scaled_dot_product_attention`` (FlashAttention CUDA kernels). On TPU the equivalents are
(a) the XLA-fused softmax(QK^T)V path, which XLA tiles onto the MXU, and (b) Pallas
flash-attention kernels (flash_attention_lane.py / flash_attention_bh.py /
flash_attention.py). The default ('auto') dispatches the lane-packed Pallas kernel at
EVERY MicroDiT shape - with zero relayout copies around the custom call it beat the XLA
path in-step at all sequence lengths, 64 through 1024 (round 3, commit cedfe94). The XLA
path remains the short-sequence fallback only where the lane kernel does not apply
(head_dim != 64 or odd head count).

Layout convention is (batch, seq, heads, head_dim) ("BTHD") everywhere - no transposes to
(B, H, T, D) are materialized; XLA fuses the layout into the matmuls.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


# Attention implementation is a STATIC config choice plumbed from the model
# (DiT.attention_impl / SelfAttention.attn_impl) - not an env var, so two
# models traced in one process cannot diverge silently:
#   'auto'       - on TPU: the lane-packed kernel at EVERY length when it
#                  applies (head_dim 64, even H) - in-step it beat the XLA
#                  path at all MicroDiT shapes once the relayout copies were
#                  gone (stage 1: 231.4 vs 193.4 img/s). Otherwise flash-bh
#                  for Tq >= 512 and XLA below: the bh kernel pays T<->H host
#                  transposes, which in-step erased its isolated-kernel win
#                  below the crossover (round 2: -16% at stage 2).
#   'xla'        - fused softmax(QK^T)V einsums
#   'flash'      - Pallas flash: the lane-packed (B, T, H*D) kernel when
#                  head_dim==64 and H is even (no relayout copies around the
#                  custom call), else the bh ((B*H, T, D) whole-K) kernel
#   'flash_lane' - force the lane-packed kernel (flash_attention_lane.py)
#   'flash_bh'   - force the (B*H, T, D) whole-K kernel (host transposes)
#   'flash_bthd' - canonical tiled flash (v5: lse + 2-kernel bwd), scales past
#                  the whole-K VMEM roof


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """softmax(q k^T * scale) v with fp32 softmax accumulation.

    Args:
        q: (B, Tq, H, D)
        k, v: (B, Tk, H, D)
    Returns:
        (B, Tq, H, D) in q.dtype
    """
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    impl: str | None = None,
    ckpt_name: str = "attn_out",
) -> jax.Array:
    """Non-causal multi-head attention, layout (B, T, H, D).

    Matches torch ``F.scaled_dot_product_attention(is_causal=False)`` semantics with the
    default ``1/sqrt(head_dim)`` scale (reference utils.py:127-132).

    ``ckpt_name`` tags the output for name-based remat policies; cross-attention
    passes "xattn_out" so the '*_alean' policies can recompute it in the
    backward (its kv side is 77 caption tokens - the recompute is cheap, and
    NOT saving it frees 16MB x ~2/block at 512px).
    """
    impl = impl or "auto"
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return checkpoint_name(
        _dispatch(q, k, v, scale=scale, impl=impl), ckpt_name
    )


def _dispatch(q, k, v, *, scale, impl):
    on_tpu = jax.default_backend() == "tpu"
    from .flash_attention_lane import supported as lane_supported

    lane_ok = lane_supported(q.shape[2], q.shape[3])
    if impl == "auto":
        # lane-packed flash wins at EVERY MicroDiT shape (no relayout copies
        # around the custom call): forcing it at stage 1 (T=64 backbone +
        # T=256 mixer) measured 231.4 img/s vs 193.4 on the XLA path. The bh
        # kernel still pays host transposes, so below T=512 it loses to XLA
        # (round-2 in-step measurement) and only takes over at long T.
        if on_tpu and lane_ok:
            impl = "flash_lane"
        else:
            impl = "flash" if (on_tpu and q.shape[1] >= 512) else "xla"
    elif impl == "pallas":  # legacy alias
        impl = "flash"
    if impl == "flash":
        # lane-packed variant when it applies: identical MXU work, zero
        # relayout copies around the custom call (see flash_attention_lane.py)
        impl = "flash_lane" if lane_ok else "flash_bh"
    if impl in ("flash_bh", "flash_bthd", "flash_lane"):
        # interpret mode off-TPU so the flash paths stay testable on CPU
        # (MDT_ATTENTION_INTERPRET=1 forces it for kernel-logic tests on TPU).
        interpret = (not on_tpu) or os.environ.get(
            "MDT_ATTENTION_INTERPRET"
        ) == "1"
        if impl == "flash_lane":
            from .flash_attention_lane import flash_attention_lane

            return flash_attention_lane(q, k, v, scale, interpret)
        if impl == "flash_bh":
            from .flash_attention_bh import flash_attention_bh

            return flash_attention_bh(q, k, v, scale, interpret)
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale, interpret)
    assert impl == "xla", impl
    return _xla_attention(q, k, v, scale)
