"""Fused LayerNorm + adaLN modulate Pallas kernel.

Every DiT block applies ``modulate(LN(x), shift, scale) = LN(x) * (1 + scale) + shift``
twice (dit.py:236-238); unfused, that chain is 3-4 HBM round trips of the (B, T, D)
activation. This kernel computes the fp32 LN statistics and the affine+modulation in
one VMEM pass. Forward-only with a custom VJP that falls back to the XLA composition
for the backward (the backward is matmul-adjacent and XLA fuses it well).

Usage: ops.adaln.layernorm_modulate(x, weight, shift, scale) - behind the static
config field ``DiT.fused_adaln`` (yaml ``model.fused_adaln``, default off) with the
unfused path as reference (tests/test_adaln.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, shift_ref, scale_ref, o_ref, *, eps: float,
            use_weight: bool):
    x = x_ref[0].astype(jnp.float32)  # (T, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if use_weight:
        y = y * w_ref[...].astype(jnp.float32)
    shift = shift_ref[0].astype(jnp.float32)  # (1, D) -> broadcast over T
    scale = scale_ref[0].astype(jnp.float32)
    y = y * (1.0 + scale) + shift
    o_ref[0] = y.astype(o_ref.dtype)


def _forward(x, weight, shift, scale, eps, interpret):
    b, t, d = x.shape
    use_weight = weight is not None
    w = weight if use_weight else jnp.ones((d,), x.dtype)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, use_weight=use_weight),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(x, w, shift[:, None, :], scale[:, None, :])
    return out


def _reference(x, weight, shift, scale, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight
    y = y * (1.0 + scale[:, None, :].astype(jnp.float32)) + shift[
        :, None, :
    ].astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def layernorm_modulate(x, weight, shift, scale, eps: float = 1e-6,
                       interpret: bool = False):
    """Fused modulate(LN(x), shift, scale); weight may be None (non-affine LN).

    x: (B, T, D); shift/scale: (B, D); weight: (D,) or None.
    """
    return _forward(x, weight, shift, scale, eps, interpret)


def _fwd(x, weight, shift, scale, eps, interpret):
    return _forward(x, weight, shift, scale, eps, interpret), (x, weight, shift, scale)


def _bwd(eps, interpret, res, g):
    x, weight, shift, scale = res
    # XLA backward of the reference composition (fused well by XLA; the fwd fusion is
    # where the HBM savings are).
    def f(x, weight, shift, scale):
        return _reference(x, weight, shift, scale, eps)

    if weight is None:
        _, vjp = jax.vjp(lambda a, s1, s2: f(a, None, s1, s2), x, shift, scale)
        dx, dshift, dscale = vjp(g)
        return dx, None, dshift, dscale
    _, vjp = jax.vjp(f, x, weight, shift, scale)
    return vjp(g)


layernorm_modulate.defvjp(_fwd, _bwd)
