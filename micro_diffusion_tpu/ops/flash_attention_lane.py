"""Lane-packed Pallas flash attention: consumes the NATURAL (B, T, H*D) layout.

The bh kernel (flash_attention_bh.py) wants (B*H, T, D) operands, and the Pallas
custom call pins default row-major layouts - so XLA materializes a T<->H relayout
copy around every call (profiled at ~6 ms per (8, 1024, 768) operand at 512px,
the largest non-matmul ops of the stage-4 step). This kernel removes ALL of them:

  - operands stay (B, T, H*D) - exactly the layout the qkv projection and the
    out projection produce/consume, so entry/exit reshapes are free bitcasts;
  - each program owns a (1, T, 128) block = TWO d=64 heads side by side in lanes
    (grid (B, H/2));
  - per-head dots become full-K=128 dots against lane-MASKED operands:
        S1 = Qp (Kp * m1)^T      m1 = lanes 0:64,  m2 = lanes 64:128
        S2 = Qp (Kp * m2)^T
        Op = P1 (Vp * m1) + P2 (Vp * m2)
    A K=64 contraction half-fills the 128x128 MXU, so a K=128 dot that is half
    zeros takes the SAME time as the bh kernel's K=64 dot - the masking trick
    costs no MXU time, and the relayout copies are gone.

Softmax reassociations match flash_attention_bh (exp2 base, scale folded into
the exp2 multiplier, normalization deferred onto (T, D)-sized outputs).

Semantics match ops.attention._xla_attention; reference semantics are torch
scaled_dot_product_attention (micro_diffusion/models/utils.py:127-132).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = math.log2(math.e)


def _lane_masks(t: int, d: int, dtype):
    """Full-tile (t, 2d) masks. Two Mosaic relayout pitfalls dodged here:
    (1, 2d) broadcast masks and i1-select straight into a 16-bit (16, 128)
    tiling both die in "non-singleton dim replicated" relayouts; selecting
    into f32 (native (8, 128) tiling, matching the iota comparison's layout)
    and converting afterwards lowers cleanly."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * d), 1)
    m1 = jnp.where(lane < d, 1.0, 0.0).astype(dtype)
    m2 = jnp.where(lane >= d, 1.0, 0.0).astype(dtype)
    return m1, m2


def _head_softmax(s, c):
    """exp2-based unnormalized softmax pieces: returns (e, l) with p = e / l."""
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * c)
    l = jnp.sum(e, axis=-1, keepdims=True)
    return e, l


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, d: int):
    q = q_ref[0]  # (Tq, 2d) - two heads in lanes
    k = k_ref[0]  # (Tk, 2d)
    v = v_ref[0]
    m1, m2 = _lane_masks(k.shape[0], d, k.dtype)
    c = scale * _LOG2E

    o = None
    for mask in (m1, m2):
        s = jax.lax.dot_general(
            q, k * mask, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tq, Tk) = this head's scores (other head's lanes are zeroed)
        e, l = _head_softmax(s, c)
        ov = jnp.dot(
            e.astype(v.dtype), v * mask, preferred_element_type=jnp.float32
        )  # (Tq, 2d), only this head's lanes nonzero
        ov = ov / l
        o = ov if o is None else o + ov
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, d: int):
    """Per head (p = e/l, delta = rowsum(p*dp)); every 1/l and the scale ride
    (T, 2d)-sized tiles, matching the bh backward's reassociation."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    mk1, mk2 = _lane_masks(k.shape[0], d, k.dtype)      # (Tk, 2d)
    mq1, mq2 = _lane_masks(q.shape[0], d, jnp.float32)  # (Tq, 2d)
    c = scale * _LOG2E

    dq = dk = dv = None
    for mask, maskq in ((mk1, mq1), (mk2, mq2)):
        s = jax.lax.dot_general(
            q, k * mask, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e, l = _head_softmax(s, c)
        inv_l = 1.0 / l  # (Tq, 1)
        eb = e.astype(do_ref.dtype)
        dom = do * maskq  # this head's lanes of do
        # dv = p^T do = e^T (do / l)
        dvh = jax.lax.dot_general(
            eb, (dom * inv_l).astype(do_ref.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dp = do v^T (lanes of the other head contribute zero via masked v)
        dp = jax.lax.dot_general(
            dom, (v * mask).astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(e * dp, axis=-1, keepdims=True) * inv_l
        ds_u = (e * (dp - delta)).astype(q.dtype)  # unnormalized ds * l / scale
        cb = (scale * inv_l).astype(jnp.float32)   # (Tq, 1)
        dqh = jnp.dot(ds_u, (k * mask), preferred_element_type=jnp.float32) * cb
        qm = (q.astype(jnp.float32) * cb * maskq).astype(q.dtype)
        dkh = jax.lax.dot_general(
            ds_u, qm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq = dqh if dq is None else dq + dqh
        dk = dkh if dk is None else dk + dkh
        dv = dvh if dv is None else dv + dvh
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def supported(h: int, d: int) -> bool:
    """Two d=64 heads fill the 128 lanes exactly; h must pair up."""
    return d == 64 and h % 2 == 0


def _pair_view(x):  # (B, T, H, D) -> (B, T, H*D), contiguous => free bitcast
    b, t, h, d = x.shape
    return x.reshape(b, t, h * d)


def _specs(b, tq, tk, d):
    blk = lambda t: pl.BlockSpec((1, t, 2 * d), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
    return [blk(tq), blk(tk), blk(tk)], blk(tq)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_lane(
    q: jax.Array, k: jax.Array, v: jax.Array,
    scale: float | None = None, interpret: bool = False,
) -> jax.Array:
    """Non-causal MHA, layout (B, T, H, D), D=64, H even; no relayout copies."""
    return _forward(q, k, v, scale, interpret)


def _call(kernel, outs, b, h, tq, tk, d, interpret, *args):
    in_specs, out_spec = _specs(b, tq, tk, d)
    grid = (b, h // 2)
    do_spec = pl.BlockSpec((1, tq, 2 * d), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    all_in = in_specs + [do_spec] * (len(args) - 3)
    out_specs = out_spec if len(outs) == 1 else [
        pl.BlockSpec((1, t, 2 * d), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM)
        for t in (tq, tk, tk)
    ]
    out_shape = outs[0] if len(outs) == 1 else outs
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=all_in,
        out_specs=out_specs,
        out_shape=out_shape,
        # the two-head backward keeps ~2x the bh kernel's live score tiles per
        # program (fp32 e/dp/ds for both heads at T=1024 is ~22MB) - the 16MB
        # scoped default OOMs; v5e has 128MB VMEM/core
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _forward(q, k, v, scale, interpret):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    qp, kp, vp = _pair_view(q), _pair_view(k), _pair_view(v)
    out = _call(
        functools.partial(_fwd_kernel, scale=scale, d=d),
        [jax.ShapeDtypeStruct((b, tq, h * d), q.dtype)],
        b, h, tq, tk, d, interpret, qp, kp, vp,
    )
    return out.reshape(b, tq, h, d)


def _fwd_rule(q, k, v, scale, interpret):
    return _forward(q, k, v, scale, interpret), (q, k, v)


def _bwd_rule(scale, interpret, res, g):
    q, k, v = res
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    qp, kp, vp, gp = _pair_view(q), _pair_view(k), _pair_view(v), _pair_view(g)
    dq, dk, dv = _call(
        functools.partial(_bwd_kernel, scale=scale, d=d),
        [
            jax.ShapeDtypeStruct((b, tq, h * d), q.dtype),
            jax.ShapeDtypeStruct((b, tk, h * d), k.dtype),
            jax.ShapeDtypeStruct((b, tk, h * d), v.dtype),
        ],
        b, h, tq, tk, d, interpret, qp, kp, vp, gp,
    )
    return (dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape))


flash_attention_lane.defvjp(_fwd_rule, _bwd_rule)
