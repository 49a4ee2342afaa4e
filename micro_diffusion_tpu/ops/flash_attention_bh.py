"""Pallas flash attention, (B*H, T, D) internal layout ('flash_bh').

One program per (batch*head), host-side transposes around the call. Selected
via the static attention_impl config (ops/attention.py): it is the 'flash'
fallback for shapes the lane-packed kernel (flash_attention_lane.py) does not
support (head_dim != 64 or odd head count). Reference semantics: torch
scaled_dot_product_attention (micro_diffusion/models/utils.py:127-132).
"""

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = math.log2(math.e)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """At D=64 the (Tq, Tk) softmax's VPU passes rival the half-filled MXU dots
    (arithmetic intensity of softmax vs dots ~ D), so every full-tile
    elementwise op removed counts. Three reassociations:
      - the `* scale` pass is folded into the exp2 multiplier c = scale*log2(e)
        (max commutes with the positive scale, so m is taken unscaled);
      - exp2 replaces exp (exp lowers to exp2 + a per-element multiply);
      - normalization divides the (Tq, D) dot OUTPUT by l, never the big tile.
    (A per-row lse residual for the backward was tried and REVERTED: every
    legal Mosaic layout for the (Tq,)-shaped stat either violates the
    minormost-two tile rule or costs a sublane->lane relayout per program;
    recomputing m/l in the backward measured cheaper than the relayout.)"""
    q = q_ref[0]  # (Tq, D)
    k = k_ref[0]  # (Tk, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Tq, Tk) unscaled
    c = scale * _LOG2E
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * c)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    """Normalization-deferred backward: every 1/l and the ds scale factor ride
    the SMALL (T, D) tiles, never the (Tq, Tk) score tile. Derivation (p = e/l
    rowwise, delta = rowsum(p*dp)):
        dv = p^T do            = e^T (do / l)
        ds = p*(dp - delta)*sc = e*(dp - delta_u/l) * (sc/l)
        dq = ds k              = [e*(dp - delta)] k * (sc/l)      (rowwise)
        dk = ds^T q            = [e*(dp - delta)]^T (q * sc/l)    (rowwise in q)
    Big-tile elementwise work: exp2 chain + 3 passes."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    c = scale * _LOG2E
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * c)
    l = jnp.sum(e, axis=-1, keepdims=True)
    inv_l = 1.0 / l  # (Tq, 1)
    eb = e.astype(do_ref.dtype)

    # dv = e^T (do / l)
    dv_ref[0] = jax.lax.dot_general(
        eb, (do * inv_l).astype(do_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    # dp = do v^T ; delta = rowsum(p * dp) = rowsum(e * dp) / l
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(e * dp, axis=-1, keepdims=True) * inv_l
    ds_u = (e * (dp - delta)).astype(q.dtype)  # unnormalized ds * l / scale
    cb = (scale * inv_l).astype(jnp.float32)   # (Tq, 1)
    dq_ref[0] = (
        jnp.dot(ds_u, k, preferred_element_type=jnp.float32) * cb
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds_u, (q.astype(jnp.float32) * cb).astype(q.dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _bhtd_to_bh(q):  # (B, T, H, D) -> (B*H, T, D)
    b, t, h, d = q.shape
    return jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, t, d)


def _bh_to_bhtd(x, b, h):  # (B*H, T, D) -> (B, T, H, D)
    _, t, d = x.shape
    return jnp.transpose(x.reshape(b, h, t, d), (0, 2, 1, 3))


def _specs(tq, tk, d):
    block = lambda t: pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    return [block(tq), block(tk), block(tk)], block(tq)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_bh(
    q: jax.Array, k: jax.Array, v: jax.Array,
    scale: float | None = None, interpret: bool = False,
) -> jax.Array:
    """Non-causal MHA, layout (B, T, H, D); semantics match ops.attention xla path."""
    return _forward(q, k, v, scale, interpret)


def _forward(q, k, v, scale, interpret):
    out, _ = _forward_res(q, k, v, scale, interpret)
    return out


def _forward_res(q, k, v, scale, interpret):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    qh, kh, vh = _bhtd_to_bh(q), _bhtd_to_bh(k), _bhtd_to_bh(v)
    in_specs, out_spec = _specs(tq, tk, d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b * h,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        interpret=interpret,
    )(qh, kh, vh)
    return _bh_to_bhtd(out, b, h), (qh, kh, vh)


def _fwd_rule(q, k, v, scale, interpret):
    # Save the ALREADY-TRANSPOSED (B*H, T, D) tensors as residuals: the
    # backward then skips 3 of its 4 input transposes (same residual bytes).
    out, (qh, kh, vh) = _forward_res(q, k, v, scale, interpret)
    return out, (qh, kh, vh, q.shape)


def _bwd_rule(scale, interpret, res, g):
    qh, kh, vh, q_shape = res
    b, tq, h, d = q_shape
    tk = kh.shape[1]
    if scale is None:
        scale = d**-0.5
    gh = _bhtd_to_bh(g)
    in_specs, _ = _specs(tq, tk, d)
    do_spec = pl.BlockSpec((1, tq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, tq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b * h,),
        in_specs=in_specs + [do_spec],
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tq, d), qh.dtype),
            jax.ShapeDtypeStruct((b * h, tk, d), kh.dtype),
            jax.ShapeDtypeStruct((b * h, tk, d), vh.dtype),
        ],
        interpret=interpret,
    )(qh, kh, vh, gh)
    return _bh_to_bhtd(dq, b, h), _bh_to_bhtd(dk, b, h), _bh_to_bhtd(dv, b, h)


flash_attention_bh.defvjp(_fwd_rule, _bwd_rule)
