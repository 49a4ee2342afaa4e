"""Pallas TPU attention kernels for MicroDiT.

Non-causal multi-head attention with a custom VJP, replacing the reference's
FlashAttention CUDA path (utils.py:127-132,188-193). MicroDiT sequences are short
(<=1024 image tokens, 77/120 text tokens), so each (batch, head)'s full K/V stays
resident in VMEM and the whole softmax(QK^T)V chain fuses into one program - no HBM
materialization of the T^2 logits in either pass (the backward recomputes the
probabilities; at T=1024, D=64 the fp32 score tile is 4MB, inside the ~16MB VMEM
budget).

Layout: the kernel consumes (B, T, H, D) DIRECTLY via BlockSpec index maps over a
(batch, head) grid - no (B*H, T, D) reshape/transpose on the host side. The earlier
wrapper's transposes showed up as multi-ms relayout `copy` ops in device traces
(PERF.md round 2); with per-(b,h) index maps XLA feeds the custom call in place.
"""

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0, :, 0, :]  # (Tq, D)
    k = k_ref[0, :, 0, :]  # (Tk, D)
    v = v_ref[0, :, 0, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Tq, Tk)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / l).astype(v.dtype)
    o_ref[0, :, 0, :] = jnp.dot(
        p, v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float):
    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    do = do_ref[0, :, 0, :].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l  # (Tq, Tk) fp32

    # dv = p^T do
    dv_ref[0, :, 0, :] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    # dp = do v^T ; ds = p * (dp - rowsum(p * dp)) * scale
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale  # (Tq, Tk) fp32
    dq_ref[0, :, 0, :] = jnp.dot(
        ds.astype(q.dtype), k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0, :, 0, :] = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _spec(t, d):
    """One (b, h) slice of a (B, T, H, D) array, picked by the (b, h) grid."""
    return pl.BlockSpec((1, t, 1, d), lambda b, h: (b, 0, h, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    scale: float | None = None, interpret: bool = False,
) -> jax.Array:
    """Non-causal MHA, layout (B, T, H, D); semantics match ops.attention xla path."""
    return _forward(q, k, v, scale, interpret)


def _forward(q, k, v, scale, interpret):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[_spec(tq, d), _spec(tk, d), _spec(tk, d)],
        out_specs=_spec(tq, d),
        out_shape=jax.ShapeDtypeStruct((b, tq, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)


def _fwd_rule(q, k, v, scale, interpret):
    return _forward(q, k, v, scale, interpret), (q, k, v)


def _bwd_rule(scale, interpret, res, g):
    q, k, v = res
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[_spec(tq, d), _spec(tk, d), _spec(tk, d), _spec(tq, d)],
        out_specs=[_spec(tq, d), _spec(tk, d), _spec(tk, d)],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq, h, d), q.dtype),
            jax.ShapeDtypeStruct((b, tk, h, d), k.dtype),
            jax.ShapeDtypeStruct((b, tk, h, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, g)
    return dq, dk, dv


flash_attention.defvjp(_fwd_rule, _bwd_rule)
