"""Fused Pallas expert-FFN kernel for EC-MoE: gelu(x @ w1[e]) @ w2[e] per expert,
with the (rows, ffn_hidden) activations living ONLY in VMEM.

Reference semantics: micro_diffusion/models/dit.py:126-143 (exact-GELU expert MLPs
applied to each expert's chosen tokens). This kernel is the TPU-native replacement
for the round-2 unrolled XLA dots, whose (e, m, f) hidden tensors were the largest
HBM movers of the profiled stages (PERF.md round 2: ~117MB per MoE block saved under
dots-remat at 512px mask-0, multi-ms transpose/convert fusions at stage 1).

Layout contract: the caller dispatches tokens with per-sample one-hot matmuls
(models/layers.py FeedForwardECMoe._onehot_path), producing xg in (n, e, k, d) order
- sample-major so the combine is a batched matmul, expert-sliceable so this kernel
can tile per expert WITHOUT any transpose: the (S, 1, k, d) input blocks slice whole
samples of one expert straight out of HBM.

Grids (fb/mb = hidden/row tiles; TPU grids run sequentially, so revisited output
blocks accumulate in VMEM between consecutive steps):
  forward: (e, mb, fb)  - out rows stay resident, w1/w2 stream per fb
  dx:      (e, mb, fb)  - recomputes gelu'(a), accumulates dx over fb
  dw:      (e, fb, mb)  - accumulates dw1/dw2 over row blocks

All dots are bf16 x bf16 -> fp32 on the MXU; the pre-GELU activations are rounded
to bf16 before GELU so the kernel matches the XLA unrolled path bit-for-bit-close
(the reference's torch einsum is bf16-out too).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = math.sqrt(0.5)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(x):
    """erf via the Abramowitz-Stegun 7.1.26 rational polynomial (max abs error
    1.5e-7 - far below bf16 resolution). Mosaic has no erf lowering, so the
    kernel carries its own; exp IS lowerable."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(a):
    """Exact (erf) GELU in fp32 (reference uses approximate=False for MoE experts)."""
    return a * 0.5 * (1.0 + _erf(a * _SQRT_HALF))


def _gelu_grad(a):
    """d/da of exact GELU: Phi(a) + a * phi(a)."""
    phi = jnp.exp(a * a * -0.5) * _INV_SQRT_2PI
    cdf = 0.5 * (1.0 + _erf(a * _SQRT_HALF))
    return cdf + a * phi


def _round_bf16(a):
    # Match the XLA path: the w1-dot output is materialized in bf16 there, so the
    # GELU sees a bf16-rounded activation. Keeps kernel/XLA equivalence tight.
    return a.astype(jnp.bfloat16).astype(jnp.float32)


# ------------------------------------------------------------------ forward kernel


def _fwd_kernel(x_ref, w1_ref, w2_ref, o_ref, acc_ref):
    fb = pl.program_id(2)

    @pl.when(fb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = x_ref.shape[-1]
    x = x_ref[...].reshape(-1, d)
    a = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32)
    h = _gelu_exact(_round_bf16(a)).astype(jnp.bfloat16)
    acc_ref[...] += jnp.dot(h, w2_ref[0], preferred_element_type=jnp.float32)

    @pl.when(fb == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype).reshape(o_ref.shape)


# ----------------------------------------------------------------------- dx kernel


def _dx_kernel(x_ref, do_ref, w1_ref, w2_ref, dx_ref, acc_ref):
    fb = pl.program_id(2)

    @pl.when(fb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = x_ref.shape[-1]
    x = x_ref[...].reshape(-1, d)
    do = do_ref[...].reshape(-1, d)
    a = _round_bf16(jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32))
    # dh = do @ w2^T  (contract over d)
    dh = jax.lax.dot_general(
        do, w2_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    da = (_gelu_grad(a) * dh).astype(jnp.bfloat16)
    # dx += da @ w1^T  (contract over f)
    acc_ref[...] += jax.lax.dot_general(
        da, w1_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(fb == pl.num_programs(2) - 1)
    def _():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype).reshape(dx_ref.shape)


# ---------------------------------------------------------------- fused dx+dw kernel


def _dxdw_kernel(x_ref, do_ref, w1_ref, w2_ref, dx_ref, dw1_ref, dw2_ref, acc_ref):
    """Whole-row-set backward: grid (e, fb) with ALL of the expert's rows resident.

    The split dx/dw kernels each recompute a = x@w1 and dh = do@w2^T, putting the
    fwd+bwd at 9 dot-units of MXU work vs the ideal 6 (fwd 2 + dx 3 + dw 4). When
    the full (m, d) row block fits VMEM there is exactly one row block per expert,
    so dw needs no cross-block accumulation and dx/dw can share one kernel: a and
    dh are computed ONCE per f-tile and feed the dx accumulation AND both weight
    grads - 7 dot-units total, and x/do stream from HBM once instead of twice."""
    fb = pl.program_id(1)

    @pl.when(fb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = x_ref.shape[-1]
    x = x_ref[...].reshape(-1, d)
    do = do_ref[...].reshape(-1, d)
    a = _round_bf16(jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32))
    dh = jax.lax.dot_general(
        do, w2_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    da = (_gelu_grad(a) * dh).astype(jnp.bfloat16)
    h = _gelu_exact(a).astype(jnp.bfloat16)
    # dx += da @ w1^T  (contract over f; accumulates across fb)
    acc_ref[...] += jax.lax.dot_general(
        da, w1_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dw1 = x^T @ da ; dw2 = h^T @ do  (contract over rows; each (e, fb) block is
    # the complete sum - the whole row set is in this program)
    dw1_ref[...] = jax.lax.dot_general(
        x, da, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dw1_ref.dtype)[None]
    dw2_ref[...] = jax.lax.dot_general(
        h, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dw2_ref.dtype)[None]

    @pl.when(fb == pl.num_programs(1) - 1)
    def _():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype).reshape(dx_ref.shape)


def _fused_ft(m: int, d: int, f: int) -> int | None:
    """f-tile for the fused dx+dw kernel, or None if the whole row set cannot
    sit in VMEM. Estimate: x/do/dx blocks bf16 + fp32 dx scratch + double-
    buffered weight/dw blocks + the (m, ft) fp32/bf16 temporaries (a, dh, da, h
    and gelu-grad intermediates)."""
    for ft in (512 if f % 512 == 0 else 256, 256):
        if f % ft:
            continue
        need = 6 * m * d + 4 * m * d + 16 * d * ft + 16 * m * ft
        if need <= _BUDGET:
            return ft
    return None


# ----------------------------------------------------------------------- dw kernel


def _dw_kernel(x_ref, do_ref, w1_ref, w2_ref, dw1_ref, dw2_ref, a1_ref, a2_ref):
    mb = pl.program_id(2)

    @pl.when(mb == 0)
    def _():
        a1_ref[...] = jnp.zeros_like(a1_ref)
        a2_ref[...] = jnp.zeros_like(a2_ref)

    d = x_ref.shape[-1]
    x = x_ref[...].reshape(-1, d)
    do = do_ref[...].reshape(-1, d)
    a = _round_bf16(jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32))
    dh = jax.lax.dot_general(
        do, w2_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    da = (_gelu_grad(a) * dh).astype(jnp.bfloat16)
    h = _gelu_exact(a).astype(jnp.bfloat16)
    # dw1 += x^T @ da ; dw2 += h^T @ do   (contract over rows)
    a1_ref[...] += jax.lax.dot_general(
        x, da, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    a2_ref[...] += jax.lax.dot_general(
        h, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(mb == pl.num_programs(2) - 1)
    def _():
        dw1_ref[...] = a1_ref[...].astype(dw1_ref.dtype)[None]
        dw2_ref[...] = a2_ref[...].astype(dw2_ref.dtype)[None]


# ----------------------------------------------------------------------- dispatch


# v5e has 128MB VMEM/core; the scoped-allocation default (16MB) is far too small
# for row blocks big enough to stream the expert weights only once. Leave slack
# for Mosaic's own scratch + double-buffer bookkeeping.
_VMEM_LIMIT = 100 * 1024 * 1024
_BUDGET = 76 * 1024 * 1024


def _tiles(n: int, k: int, d: int, f: int):
    """Row/hidden tile sizes: S samples per block and the F tile, chosen as the
    largest row block fitting the VMEM budget. Bigger row blocks amortize the
    w1/w2 streaming - the full expert weights are re-read (n/S) times per expert
    in the fwd/dx grids - so S = n (one pass) whenever it fits."""
    ft = 512 if f % 512 == 0 else 256

    def vmem_bytes(m):
        # Worst case across the three kernels (the dw pass): x + do row blocks
        # double-buffered bf16, w1/w2 in blocks + dw1/dw2 out blocks double-
        # buffered, two (d, ft) fp32 accumulator scratches, and the fp32/bf16
        # (m, ft) temporaries (a, dh, da, h). The dx pass trades the dw weight
        # blocks for an (m, d) output block + fp32 accumulator - comparable.
        row_blocks = 16 * m * d          # x, do, out-ish blocks x2 buffers
        weight_blocks = 24 * d * ft      # in + out + scratch
        temps = 12 * m * ft
        return row_blocks + weight_blocks + temps

    s = n
    while s > 1 and vmem_bytes(s * k) > _BUDGET:
        s = max(1, s // 2)
    while n % s:
        s -= 1
    return s, ft


def supported(n: int, e: int, k: int, d: int, f: int) -> bool:
    """Shapes the kernel tiles cleanly; anything else takes the XLA fallback.

    k % 16: bf16 sublane tile, lets (S, 1, k, d) blocks collapse to (S*k, d).
    All production MicroDiT shapes (k in {16, 64, 256}; d in {768, 1024};
    f multiples of 256) pass.
    """
    return k % 16 == 0 and d % 128 == 0 and f % 256 == 0


def _block4(s, k, d, e_axis_pos=1):
    """(S, 1, k, d) sample-major block of the (n, e, k, d) array for (e, mb)."""
    return pl.BlockSpec(
        (s, 1, k, d), lambda e, mb, xb: (mb, e, 0, 0), memory_space=pltpu.VMEM
    )


def _w1_spec(d, ft):
    return pl.BlockSpec(
        (1, d, ft), lambda e, b1, b2: (e, 0, b2), memory_space=pltpu.VMEM
    )


def _w2_spec(d, ft):
    return pl.BlockSpec(
        (1, ft, d), lambda e, b1, b2: (e, b2, 0), memory_space=pltpu.VMEM
    )


def _fwd(xg, w1, w2, interpret):
    n, e, k, d = xg.shape
    f = w1.shape[-1]
    s, ft = _tiles(n, k, d, f)
    grid = (e, n // s, f // ft)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[_block4(s, k, d), _w1_spec(d, ft), _w2_spec(d, ft)],
        out_specs=_block4(s, k, d),
        out_shape=jax.ShapeDtypeStruct((n, e, k, d), xg.dtype),
        scratch_shapes=[pltpu.VMEM((s * k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xg, w1, w2)


def _bwd(xg, w1, w2, dout, interpret):
    n, e, k, d = xg.shape
    f = w1.shape[-1]
    fused_ft = _fused_ft(n * k, d, f)
    if fused_ft is not None:
        row = pl.BlockSpec((n, 1, k, d), lambda e, fb: (0, e, 0, 0),
                           memory_space=pltpu.VMEM)
        w1s = pl.BlockSpec((1, d, fused_ft), lambda e, fb: (e, 0, fb),
                           memory_space=pltpu.VMEM)
        w2s = pl.BlockSpec((1, fused_ft, d), lambda e, fb: (e, fb, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _dxdw_kernel,
            grid=(e, f // fused_ft),
            in_specs=[row, row, w1s, w2s],
            out_specs=[row, w1s, w2s],
            out_shape=[
                jax.ShapeDtypeStruct((n, e, k, d), xg.dtype),
                jax.ShapeDtypeStruct(w1.shape, w1.dtype),
                jax.ShapeDtypeStruct(w2.shape, w2.dtype),
            ],
            scratch_shapes=[pltpu.VMEM((n * k, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(xg, dout, w1, w2)
    s, ft = _tiles(n, k, d, f)

    dx = pl.pallas_call(
        _dx_kernel,
        grid=(e, n // s, f // ft),
        in_specs=[_block4(s, k, d), _block4(s, k, d), _w1_spec(d, ft),
                  _w2_spec(d, ft)],
        out_specs=_block4(s, k, d),
        out_shape=jax.ShapeDtypeStruct((n, e, k, d), xg.dtype),
        scratch_shapes=[pltpu.VMEM((s * k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xg, dout, w1, w2)

    # dw grid: fb is the slow dim, rows accumulate innermost.
    row_block = pl.BlockSpec(
        (s, 1, k, d), lambda e, fb, mb: (mb, e, 0, 0), memory_space=pltpu.VMEM
    )
    dw1, dw2 = pl.pallas_call(
        _dw_kernel,
        grid=(e, f // ft, n // s),
        in_specs=[
            row_block,
            row_block,
            pl.BlockSpec((1, d, ft), lambda e, fb, mb: (e, 0, fb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ft, d), lambda e, fb, mb: (e, fb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, ft), lambda e, fb, mb: (e, 0, fb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ft, d), lambda e, fb, mb: (e, fb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(w1.shape, w1.dtype),
            jax.ShapeDtypeStruct(w2.shape, w2.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, ft), jnp.float32),
            pltpu.VMEM((ft, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xg, dout, w1, w2)
    return dx, dw1, dw2


# ------------------------------------------------------------------- public entry


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _moe_ffn_pallas(xg, w1, w2, interpret):
    return _fwd(xg, w1, w2, interpret)


def _pallas_fwd_rule(xg, w1, w2, interpret):
    return _fwd(xg, w1, w2, interpret), (xg, w1, w2)


def _pallas_bwd_rule(interpret, res, dout):
    xg, w1, w2 = res
    return _bwd(xg, w1, w2, dout, interpret)


_moe_ffn_pallas.defvjp(_pallas_fwd_rule, _pallas_bwd_rule)


def _moe_ffn_ref(xg, w1, w2):
    """XLA fallback (same math, hiddens in HBM) for shapes the kernel can't tile."""
    n, e, k, d = xg.shape
    outs = []
    for i in range(e):
        a = jnp.dot(xg[:, i].reshape(n * k, d), w1[i])
        h = jax.nn.gelu(a.astype(jnp.float32), approximate=False).astype(a.dtype)
        outs.append(jnp.dot(h, w2[i]).reshape(n, 1, k, d))
    return jnp.concatenate(outs, axis=1)


def moe_ffn(xg: jax.Array, w1: jax.Array, w2: jax.Array,
            interpret: bool | None = None) -> jax.Array:
    """Per-expert gelu(x @ w1) @ w2 on (n, e, k, d) dispatched tokens.

    w1: (e, d, f), w2: (e, f, d), both bf16 (cast by the caller). Returns
    (n, e, k, d) in xg.dtype. Falls back to plain XLA dots off-grid shapes.
    """
    n, e, k, d = xg.shape
    f = w1.shape[-1]
    if not supported(n, e, k, d, f):
        return _moe_ffn_ref(xg, w1, w2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _moe_ffn_pallas(xg, w1, w2, interpret)


# ------------------------------------------------- expert-major (gather) layout


def _em_block(s, d):
    """(1, S, d) block of the (e, m, d) expert-major array for grid (e, mb, fb)."""
    return pl.BlockSpec(
        (1, s, d), lambda e, mb, xb: (e, mb, 0), memory_space=pltpu.VMEM
    )


def _em_fwd(xg, w1, w2, interpret):
    e, m, d = xg.shape
    f = w1.shape[-1]
    s, ft = _tiles(m, 1, d, f)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(e, m // s, f // ft),
        in_specs=[_em_block(s, d), _w1_spec(d, ft), _w2_spec(d, ft)],
        out_specs=_em_block(s, d),
        out_shape=jax.ShapeDtypeStruct((e, m, d), xg.dtype),
        scratch_shapes=[pltpu.VMEM((s, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xg, w1, w2)


def _em_bwd(xg, w1, w2, dout, interpret):
    e, m, d = xg.shape
    f = w1.shape[-1]
    fused_ft = _fused_ft(m, d, f)
    if fused_ft is not None:
        row = pl.BlockSpec((1, m, d), lambda e, fb: (e, 0, 0),
                           memory_space=pltpu.VMEM)
        w1s = pl.BlockSpec((1, d, fused_ft), lambda e, fb: (e, 0, fb),
                           memory_space=pltpu.VMEM)
        w2s = pl.BlockSpec((1, fused_ft, d), lambda e, fb: (e, fb, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _dxdw_kernel,
            grid=(e, f // fused_ft),
            in_specs=[row, row, w1s, w2s],
            out_specs=[row, w1s, w2s],
            out_shape=[
                jax.ShapeDtypeStruct((e, m, d), xg.dtype),
                jax.ShapeDtypeStruct(w1.shape, w1.dtype),
                jax.ShapeDtypeStruct(w2.shape, w2.dtype),
            ],
            scratch_shapes=[pltpu.VMEM((m, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(xg, dout, w1, w2)
    s, ft = _tiles(m, 1, d, f)

    dx = pl.pallas_call(
        _dx_kernel,
        grid=(e, m // s, f // ft),
        in_specs=[_em_block(s, d), _em_block(s, d), _w1_spec(d, ft),
                  _w2_spec(d, ft)],
        out_specs=_em_block(s, d),
        out_shape=jax.ShapeDtypeStruct((e, m, d), xg.dtype),
        scratch_shapes=[pltpu.VMEM((s, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xg, dout, w1, w2)

    row_block = pl.BlockSpec(
        (1, s, d), lambda e, fb, mb: (e, mb, 0), memory_space=pltpu.VMEM
    )
    dw1, dw2 = pl.pallas_call(
        _dw_kernel,
        grid=(e, f // ft, m // s),
        in_specs=[
            row_block,
            row_block,
            pl.BlockSpec((1, d, ft), lambda e, fb, mb: (e, 0, fb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ft, d), lambda e, fb, mb: (e, fb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, ft), lambda e, fb, mb: (e, 0, fb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ft, d), lambda e, fb, mb: (e, fb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(w1.shape, w1.dtype),
            jax.ShapeDtypeStruct(w2.shape, w2.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, ft), jnp.float32),
            pltpu.VMEM((ft, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xg, dout, w1, w2)
    return dx, dw1, dw2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _moe_ffn_em_pallas(xg, w1, w2, interpret):
    return _em_fwd(xg, w1, w2, interpret)


def _em_fwd_rule(xg, w1, w2, interpret):
    return _em_fwd(xg, w1, w2, interpret), (xg, w1, w2)


def _em_bwd_rule(interpret, res, dout):
    xg, w1, w2 = res
    return _em_bwd(xg, w1, w2, dout, interpret)


_moe_ffn_em_pallas.defvjp(_em_fwd_rule, _em_bwd_rule)


def _moe_ffn_em_ref(xg, w1, w2):
    outs = []
    for i in range(xg.shape[0]):
        a = jnp.dot(xg[i], w1[i])
        h = jax.nn.gelu(a.astype(jnp.float32), approximate=False).astype(a.dtype)
        outs.append(jnp.dot(h, w2[i]))
    return jnp.stack(outs)


def moe_ffn_expert_major(xg: jax.Array, w1: jax.Array, w2: jax.Array,
                         interpret: bool | None = None) -> jax.Array:
    """Per-expert gelu(x @ w1) @ w2 on (e, m, d) gathered token rows (the flat
    expert-major dispatch layout, models/layers.py 'gather' mode). Same kernels
    as :func:`moe_ffn` with expert-major blocks; the (m, f) hiddens never touch
    HBM, which is what lets 512px mask-0 escape the batched conv-emitted dots
    (PERF.md round-2 lever #1b)."""
    e, m, d = xg.shape
    f = w1.shape[-1]
    if not (m % 16 == 0 and d % 128 == 0 and f % 256 == 0):
        return _moe_ffn_em_ref(xg, w1, w2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _moe_ffn_em_pallas(xg, w1, w2, interpret)
