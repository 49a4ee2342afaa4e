"""MXU-friendly EC-MoE dispatch/combine with explicit adjoints.

Expert-choice routing picks tokens WITHIN each sample (reference
micro_diffusion/models/dit.py:126-143: top-k over t per (sample, expert)), so
dispatch and combine are block-diagonal per sample - expressible either as a
row gather or as a one-hot matmul. Each expression has a bad side on TPU:

  * plain autodiff of the one-hot matmul form costs FIVE (2t, t)x(t, d)
    batched matmuls per MoE layer - dispatch fwd, combine fwd, dx, dh, and a
    full dweights matmul whose only use is the tiny gate cotangent
    (~26% of the whole 512px-mask0 train-step FLOPs);
  * plain autodiff of the gather form re-emits XLA scatter-adds, which
    serialize on TPU (the round-2 profiled bottleneck, PERF.md).

These primitives take the cheap direction of each and DEFINE the adjoint of
the other direction explicitly (exact, not approximate):

  dispatch_rows: fwd = row gather (DMA only)   bwd = one-hot matmul (MXU)
  combine_rows:  fwd = one-hot matmul (MXU)    bwd = row gather (DMA only)

Two one-hot matmuls total instead of five, and no scatter anywhere. The gate
weighting is applied elementwise OUTSIDE combine_rows (models/layers.py
_hybrid_path), so its cotangent is a rowwise dot instead of another matmul.

Adjoint correctness (both used by tests/test_moe.py hybrid cases):
  dispatch: xg[n,r,:] = x[n, idx[n,r], :]
            => dx[n,tok,:] = sum_r [idx[n,r]==tok] * dxg[n,r,:] = (D^T @ dxg)[n,tok,:]
  combine:  out[n,tok,:] = sum_r D[n,r,tok] * hg[n,r,:]
            => dhg[n,r,:] = dout[n, idx[n,r], :]  (a gather)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _onehot(idx: jax.Array, t: int, dtype) -> jax.Array:
    """(n, r) int indices -> (n, r, t) one-hot selection matrix."""
    iota = jnp.arange(t, dtype=idx.dtype)
    return (idx[..., None] == iota).astype(dtype)


def _float0_zeros(idx):
    return np.zeros(idx.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dispatch_rows(x: jax.Array, idx: jax.Array, t: int) -> jax.Array:
    """Gather rows idx (n, r) out of x (n, t, d) -> (n, r, d)."""
    del t
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _dispatch_fwd(x, idx, t):
    return dispatch_rows(x, idx, t), idx


def _dispatch_bwd(t, idx, dxg):
    d_sel = _onehot(idx, t, dxg.dtype)  # (n, r, t)
    dx = jax.lax.dot_general(
        d_sel, dxg, (((1,), (1,)), ((0,), (0,)))
    )  # (n, t, d): scatter-add expressed as a matmul
    return dx, _float0_zeros(idx)


dispatch_rows.defvjp(_dispatch_fwd, _dispatch_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def combine_rows(hg: jax.Array, idx: jax.Array, t: int) -> jax.Array:
    """Scatter-add rows hg (n, r, d) to positions idx (n, r) of a (n, t, d) zero
    canvas - computed as a one-hot matmul so duplicate indices accumulate on the
    MXU instead of through XLA's serialized scatter."""
    d_sel = _onehot(idx, t, hg.dtype)  # (n, r, t)
    return jax.lax.dot_general(d_sel, hg, (((1,), (1,)), ((0,), (0,))))


def _combine_fwd(hg, idx, t):
    return combine_rows(hg, idx, t), idx


def _combine_bwd(t, idx, dout):
    del t
    dhg = jnp.take_along_axis(dout, idx[..., None], axis=1)  # (n, r, d)
    return dhg, _float0_zeros(idx)


combine_rows.defvjp(_combine_fwd, _combine_bwd)
