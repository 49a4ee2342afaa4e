"""Pallas TPU attention kernels for MicroDiT.

Non-causal multi-head attention with a custom VJP, replacing the reference's
FlashAttention CUDA path (utils.py:127-132,188-193).

Design (round 2, driven by device traces - PERF.md):
  * The kernel consumes (B, T, H, D) IN PLACE: blocks are (1, T, H_BLOCK, D) slices
    over a (batch, head-block) grid, so there is no (B*H, T, D) reshape/transpose on
    the host side (those relayouts showed up as multi-ms `copy` ops in traces).
    Mosaic's block rule (last two dims divisible by (8, 128) or equal to the full
    dimension) is satisfied by H_BLOCK in {full H, multiples of 8} and D = full dim.
  * Heads iterate in a STATIC in-kernel loop; Q iterates in static chunks sized so
    the fp32 score tile stays ~<=1MB - everything fits the ~16MB VMEM budget even
    for the backward at T=1024 (dk/dv accumulate in fp32 VMEM across Q chunks
    inside one program, no cross-program accumulation needed).
  * MicroDiT sequences are short (<=1024 image tokens, 77/120 text tokens), so each
    (batch, head-block)'s full K/V stays resident; softmax rows are complete (no
    online-softmax state).
"""

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_block(tq: int, tk: int, h: int) -> int:
    """Heads per program: all of them for short sequences, else the largest
    multiple of 8 that divides H (falling back to full H)."""
    if tq * tk <= 512 * 512:
        return h
    for cand in (8, 16):
        if h % cand == 0:
            return cand
    return h


def _q_chunk(tq: int, tk: int) -> int:
    """Static Q-chunk size keeping the fp32 score tile <= ~1MB."""
    if tq * tk * 4 <= (1 << 20):
        return tq
    chunk = max(1, (1 << 20) // (tk * 4))
    while tq % chunk:
        chunk -= 1
    return chunk


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, h_block, q_chunk):
    tq = q_ref.shape[1]
    for h in range(h_block):
        k = k_ref[0, :, h, :]  # (Tk, D)
        v = v_ref[0, :, h, :]
        for c in range(tq // q_chunk):
            lo = c * q_chunk
            q = q_ref[0, lo:lo + q_chunk, h, :]  # (q_chunk, D)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = _softmax_rows(s).astype(v.dtype)
            o_ref[0, lo:lo + q_chunk, h, :] = jnp.dot(
                p, v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale, h_block, q_chunk):
    tq = q_ref.shape[1]
    tk = k_ref.shape[1]
    d = q_ref.shape[3]
    for h in range(h_block):
        k = k_ref[0, :, h, :]
        v = v_ref[0, :, h, :]
        dk_acc = jnp.zeros((tk, d), jnp.float32)
        dv_acc = jnp.zeros((tk, d), jnp.float32)
        for c in range(tq // q_chunk):
            lo = c * q_chunk
            q = q_ref[0, lo:lo + q_chunk, h, :]
            do = do_ref[0, lo:lo + q_chunk, h, :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = _softmax_rows(s)  # (q_chunk, Tk) fp32
            # dv += p^T do
            dv_acc = dv_acc + jax.lax.dot_general(
                p.astype(do_ref.dtype), do.astype(do_ref.dtype),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            # dp = do v^T ; ds = p * (dp - rowsum(p * dp)) * scale
            dp = jax.lax.dot_general(
                do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = (p * (dp - delta) * scale).astype(q.dtype)  # (q_chunk, Tk)
            dq_ref[0, lo:lo + q_chunk, h, :] = jnp.dot(
                ds, k, preferred_element_type=jnp.float32
            ).astype(dq_ref.dtype)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dk_ref[0, :, h, :] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, h, :] = dv_acc.astype(dv_ref.dtype)


def _specs(tq, tk, h_block, d):
    blk = lambda t: pl.BlockSpec(
        (1, t, h_block, d), lambda b, hb: (b, 0, hb, 0),
        memory_space=pltpu.VMEM,
    )
    return blk(tq), blk(tk)


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
    hb = _head_block(tq, tk, h)
    qc = _q_chunk(tq, tk)
    q_spec, kv_spec = _specs(tq, tk, hb, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, h_block=hb, q_chunk=qc),
        grid=(b, h // hb),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
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
    hb = _head_block(tq, tk, h)
    qc = _q_chunk(tq, tk)
    q_spec, kv_spec = _specs(tq, tk, hb, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, h_block=hb, q_chunk=qc),
        grid=(b, h // hb),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
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
