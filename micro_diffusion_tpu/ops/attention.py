"""Attention ops for TPU.

The reference (micro_diffusion/models/utils.py:127-132,188-193) relies on torch
``scaled_dot_product_attention`` (FlashAttention CUDA kernels). On TPU the equivalents are
(a) the XLA-fused softmax(QK^T)V path, which XLA tiles onto the MXU, and (b) a Pallas
flash-attention kernel (ops/flash_attention.py) for long sequences. Sequences in MicroDiT
are short (<=1024 image tokens, 77/120 text tokens), so the XLA path is the default;
the Pallas kernel is opt-in via ``use_flash``.

Layout convention is (batch, seq, heads, head_dim) ("BTHD") everywhere - no transposes to
(B, H, T, D) are materialized; XLA fuses the layout into the matmuls.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def _default_impl() -> str:
    """'auto' | 'xla' | 'pallas', read per-call so tests/benchmarks can flip the
    backend. MDT_ATTENTION_INTERPRET=1 runs the Pallas kernel in interpreter mode.

    'auto' (default): the Pallas flash kernel on TPU for sequences >= 512, XLA
    below. Isolated fwd+bwd micro-benches say flash-bh wins from T=256 up
    (2.3-2.6x XLA at T=1024, 1.5x at T=256/b16h16) - but inside the full train
    step T=256 flash REGRESSES the step (-16% stage 2, -8% stage 3, measured
    round 2): below the crossover XLA fuses the attention einsums with
    neighboring ops, which the custom-call boundary forfeits. Trust the
    in-step numbers; the crossover sits between 256 and 512."""
    return os.environ.get("MDT_ATTENTION_IMPL", "auto")


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
) -> jax.Array:
    """Non-causal multi-head attention, layout (B, T, H, D).

    Matches torch ``F.scaled_dot_product_attention(is_causal=False)`` semantics with the
    default ``1/sqrt(head_dim)`` scale (reference utils.py:127-132).
    """
    impl = impl or _default_impl()
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return checkpoint_name(
        _dispatch(q, k, v, scale=scale, impl=impl), "attn_out"
    )


def _dispatch(q, k, v, *, scale, impl):
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        impl = "pallas" if (on_tpu and q.shape[1] >= 512) else "xla"
    if impl == "pallas":
        interpret = os.environ.get("MDT_ATTENTION_INTERPRET") == "1"
        # 'bh' (default): (B*H,T,D) whole-K kernel - fastest measured variant at
        # every MicroDiT shape (its host transposes cost less than the in-place
        # variant's tiled accumulators). 'bthd': canonical flash (v5) - consumes
        # (B,T,H,D) in place, saves lse, tiles both sequence dims; scales past
        # T=1024 and stays under the 16MB VMEM roof where whole-K backwards OOM.
        if os.environ.get("MDT_FLASH_VARIANT", "bh") == "bh":
            from .flash_attention_bh import flash_attention_bh

            return flash_attention_bh(q, k, v, scale, interpret)
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale, interpret)
    return _xla_attention(q, k, v, scale)
