"""Core layer library for the TPU-native MicroDiT rebuild.

Each layer documents the reference behavior it reproduces (citations are file:line into
/root/reference). Numerics policy: parameters are fp32, compute is bf16 by default
(matching the reference's amp_bf16 + low-precision-layernorm setup, train.py:81-84,113),
with fp32 softmax/normalization statistics.

Initialization matches dit.py:577-627 / utils.py:138-141,199-201. Note on "trunc_normal":
torch ``nn.init.trunc_normal_`` defaults truncate at absolute [-2, 2], which for std=0.02
is ~100 sigma - i.e. effectively an untruncated normal - so we use plain normal
initializers of the same std.
"""

import math
import os
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
import numpy as np

from ..ops.attention import dot_product_attention

Initializer = Callable[..., Any]

# --------------------------------------------------------------------------------------
# Initializers
# --------------------------------------------------------------------------------------

xavier_uniform = jax.nn.initializers.xavier_uniform()
zeros_init = jax.nn.initializers.zeros


def normal_init(std: float) -> Initializer:
    return jax.nn.initializers.normal(stddev=std)


def patch_embed_kernel_init(key, shape, dtype=jnp.float32):
    """Xavier-uniform over the flattened (out, in*p*p) conv kernel (dit.py:599-600).

    The conv kernel shape in flax is (p, p, C, D); torch flattens it to (D, C*p*p) before
    xavier, giving fan_in = C*p*p, fan_out = D (jax's conv xavier would use fan_out = D*p*p).
    """
    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[3]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def torch_linear_bias_init(fan_in: int) -> Initializer:
    """torch nn.Linear/Conv default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# --------------------------------------------------------------------------------------
# Normalization / modulation
# --------------------------------------------------------------------------------------


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """x * (1 + scale[:, None]) + shift[:, None] (reference utils.py:28-30)."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class LayerNorm(nn.Module):
    """LayerNorm matching reference create_norm (utils.py:71-78).

    'layernorm'    -> affine scale, no bias (use_scale=True)
    'np_layernorm' -> no affine at all      (use_scale=False)
    Statistics are computed in fp32; output is cast back to the compute dtype.

    When called with (shift, scale), computes modulate(LN(x), shift, scale)
    (dit.py:236-238); with ``fused_adaln=True`` (a static config field plumbed
    from DiT.fused_adaln) that path runs as one fused Pallas VMEM pass
    (ops/adaln.py) instead of the unfused chain. Off by default: XLA already
    fuses the unfused chain into neighboring ops, and the kernel never won a
    bench rung - it stays as an opt-in config choice with an equivalence test
    (tests/test_adaln.py).
    """

    dim: int
    eps: float = 1e-6
    use_scale: bool = True
    fused_adaln: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        shift: Optional[jax.Array] = None,
        scale: Optional[jax.Array] = None,
    ) -> jax.Array:
        w = (
            self.param("weight", jax.nn.initializers.ones, (self.dim,), jnp.float32)
            if self.use_scale
            else None
        )
        if shift is not None and self.fused_adaln:
            import os

            from ..ops.adaln import layernorm_modulate

            # MDT_ATTENTION_INTERPRET is a debug-only toggle (Pallas interpret
            # mode for kernel-logic tests off-TPU), not a behavior knob.
            interpret = os.environ.get("MDT_ATTENTION_INTERPRET") == "1"
            return layernorm_modulate(x, w, shift, scale, self.eps, interpret)

        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if w is not None:
            y = y * w
        y = y.astype(orig_dtype)
        if shift is not None:
            y = modulate(y, shift, scale)
        return y


# --------------------------------------------------------------------------------------
# MLPs
# --------------------------------------------------------------------------------------


class Mlp(nn.Module):
    """timm-style MLP: fc1 -> act -> (norm) -> fc2 (reference utils.py:34-68)."""

    in_features: int
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    use_norm: bool = False
    use_bias: bool = True
    norm_eps: float = 1e-6
    fc1_init: Initializer = xavier_uniform
    fc2_init: Initializer = xavier_uniform
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = self.hidden_features or self.in_features
        out = self.out_features or self.in_features
        x = nn.Dense(
            hidden, use_bias=self.use_bias, kernel_init=self.fc1_init,
            bias_init=zeros_init, dtype=self.dtype, param_dtype=jnp.float32, name="fc1",
        )(x)
        x = nn.gelu(x, approximate=True)
        if self.use_norm:
            x = LayerNorm(hidden, eps=self.norm_eps, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(
            out, use_bias=self.use_bias, kernel_init=self.fc2_init,
            bias_init=zeros_init, dtype=self.dtype, param_dtype=jnp.float32, name="fc2",
        )(x)
        return x


class FeedForward(nn.Module):
    """SwiGLU feed-forward: w3(silu(w1 x) * w2 x), hidden = 2/3 rounding (dit.py:63-94)."""

    dim: int
    hidden_dim: int
    multiple_of: int
    use_bias: bool
    w1_init: Initializer = normal_init(0.02)
    w2_init: Initializer = xavier_uniform
    w3_init: Initializer = xavier_uniform
    dtype: Any = jnp.bfloat16
    # Recompute the two hidden-width activations (w1/w2 dot outputs) in the
    # backward pass even under a dots-saveable outer remat policy: ~88MB per
    # dense block at 512px mask-0 mb8. Enabled by the '*_xlean' remat policies.
    remat_hidden: bool = False

    @staticmethod
    def rounded_hidden(hidden_dim: int, multiple_of: int) -> int:
        hidden_dim = int(2 * hidden_dim / 3)
        return multiple_of * ((hidden_dim + multiple_of - 1) // multiple_of)

    def _linear(self, x: jax.Array, name: str, features: int, init, lean: bool):
        """Single compute helper for every projection: nn.Dense semantics (bf16
        compute on fp32 params, zero-init bias), with ``lean=True`` emitting the
        dot with a size-1 batch dimension at the jaxpr level so
        dots_with_no_batch_dims_saveable remat policies skip its output; XLA's
        algebraic simplifier collapses the dummy batch before codegen.
        (An inner jax.checkpoint(nothing_saveable) does NOT work here:
        nested-remat residuals are re-exported as remat2 outputs, which the
        outer block remat saves - measured no peak-HBM change; and the
        hidden-width silu(gate)*up would be its boundary output anyway.)"""
        mod = nn.Dense(
            features, use_bias=self.use_bias, kernel_init=init,
            bias_init=zeros_init, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        if self.is_initializing() or not lean:
            return mod(x)
        # Params exist by now (created during init through the same nn.Dense), so
        # the lean form reads them directly; dtype promotion mirrors nn.Dense
        # (fp32 params cast to the bf16 compute dtype).
        w = self.variables["params"][name]["kernel"].astype(self.dtype)
        xb = x.astype(self.dtype)[None]
        y = jax.lax.dot_general(
            xb, w[None], (((xb.ndim - 1,), (1,)), ((0,), (0,)))
        )[0]
        if self.use_bias:
            y = y + self.variables["params"][name]["bias"].astype(self.dtype)
        return y

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = self.rounded_hidden(self.hidden_dim, self.multiple_of)
        gate = self._linear(x, "w1", hidden, self.w1_init, self.remat_hidden)
        up = self._linear(x, "w2", hidden, self.w2_init, self.remat_hidden)
        return self._linear(nn.silu(gate) * up, "w3", self.dim, self.w3_init, False)


class FeedForwardECMoe(nn.Module):
    """Expert-choice MoE feed-forward with exact-GELU experts (dit.py:97-148).

    Routing (each expert picks its top-k tokens, k = capacity * T / E) follows
    dit.py:126-143, but the dense one-hot einsum dispatch is replaced by a
    take-along-axis gather + scatter-add combine - numerically identical (see
    tests/test_moe.py) and far lighter on HBM: the reference materializes a
    [n, e, k, t] one-hot (O(capacity * T^2)); the gather form is O(capacity * T * d).
    The gate-prob weighting g * h keeps the gradient path through the router.
    """

    num_experts: int
    expert_capacity: float
    dim: int
    hidden_dim: int
    multiple_of: int
    w2_init: Initializer = xavier_uniform
    dtype: Any = jnp.bfloat16
    # Recompute the per-expert hidden activations in the backward pass instead of
    # letting a dots-saveable outer remat policy store them. The unrolled 2-D
    # expert dots ARE dot_with_no_batch_dims-saveable, which costs
    # ~e * 2T * ffn_hidden bf16 per MoE block (~117MB/block at 512px mask-0 mb8 —
    # 2GB over one v5e chip's HBM). Enabled by the '*_lean' remat policies.
    remat_experts: bool = False
    # Dispatch/combine implementation (a static module attribute — plumbed from the
    # DiT config / yaml recipes, NOT an env var, so two models traced in one process
    # can't diverge silently):
    #   'hybrid'  - dispatch/combine with explicit adjoints (ops/moe_dispatch.py):
    #               row gathers where a gather is exact (dispatch fwd, combine
    #               bwd) and one-hot matmuls where duplicate indices must
    #               accumulate (combine fwd, dispatch bwd), gate applied
    #               elementwise so its cotangent is a rowwise dot. TWO one-hot
    #               matmuls per layer instead of autodiff-onehot's five
    #               (~26% of the 512px-mask0 step FLOPs), no scatter anywhere.
    #               Fused Pallas expert FFN.
    #   'onehot'  - THE DEFAULT (measured fastest at every benched stage): per-
    #               sample one-hot dispatch AND gate-weighted combine as
    #               batched-n matmuls + fused Pallas expert FFN (ops/moe_ffn.py):
    #               the (e, m, f) hiddens never touch HBM and there is no
    #               gather/scatter at all - but plain autodiff pays 5 one-hot
    #               matmuls per layer.
    #   'onehot_dots' - same one-hot dispatch/combine, expert FFN as unrolled
    #               XLA 2-D dots (hiddens in HBM; no Pallas).
    #   'gather'  - flat expert-major gather + fused Pallas expert FFN +
    #               scatter-add combine: no onehot dispatch-matmul FLOPs
    #               (those cost ~t/f of the expert FLOPs - 50% at T=1024),
    #               hiddens stay in VMEM. The long-sequence-stage choice.
    #   'unroll'  - flat expert-major gather + unrolled 2-D expert dots +
    #               scatter-add combine (round-2 default).
    #   'batched' - gather + single 3-D batched dots (conv-emitted; lowest peak
    #               HBM update graph) + scatter-add combine.
    #   'scan'    - gather + lax.map over experts (small HLO) + scatter-add.
    dispatch: str = "onehot"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 3
        n, t, d = x.shape
        e = self.num_experts
        hidden = self.multiple_of * (
            (self.hidden_dim + self.multiple_of - 1) // self.multiple_of
        )
        k = int(self.expert_capacity * t / e)

        gate = nn.Dense(
            e, use_bias=False, kernel_init=normal_init(0.02), dtype=self.dtype,
            param_dtype=jnp.float32, name="gate",
        )
        w1 = self.param("w1", normal_init(0.02), (e, d, hidden), jnp.float32)
        w2 = self.param("w2", self.w2_init, (e, hidden, d), jnp.float32)
        w1 = w1.astype(self.dtype)
        w2 = w2.astype(self.dtype)

        scores = gate(x)  # (n, t, e)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)  # (n, t, e)
        # Expert-choice: each expert selects its top-k tokens.
        g, m = jax.lax.top_k(jnp.swapaxes(probs, 1, 2), k)  # (n, e, k) values/indices
        g = g.astype(self.dtype)

        if self.dispatch == "hybrid":
            return checkpoint_name(
                self._hybrid_path(x, g, m, w1, w2), "moe_out"
            )
        if self.dispatch in ("onehot", "onehot_dots"):
            return checkpoint_name(
                self._onehot_path(x, g, m, w1, w2, hidden), "moe_out"
            )

        # Flat expert-major dispatch: gather the chosen tokens into (e, n*k, d) so
        # the expert matmuls are clean 3-D batched dots with natural layouts. The
        # earlier (n, e, k, d) einsum form made XLA shuttle 4-D tensors between
        # {3,2,1,0} and {3,0,2,1} layouts - profiled as the dominant stage-1 cost
        # (multi-ms transpose/convert fusions per MoE block; see PERF.md round 2).
        # Only the TINY index/gate arrays are transposed.
        x_flat = x.reshape(n * t, d)
        gidx = m + (jnp.arange(n, dtype=m.dtype) * t)[:, None, None]  # (n, e, k)
        gidx = jnp.swapaxes(gidx, 0, 1).reshape(e, n * k)  # (e, n*k)
        xin = jnp.take(x_flat, gidx, axis=0)  # (e, n*k, d)

        # bf16 matmul outputs: the MXU accumulates fp32 internally either way, and
        # bf16 outputs keep the dots-remat-saved tensors half the size with no
        # fp32->bf16 convert chains (the reference's torch einsum is bf16-out too).
        #
        # The expert dim is UNROLLED into 2-D dots: XLA:TPU emits the batched
        # "emd,edf->emf" einsum through its convolution batch-in-sublanes emitter
        # (~2.1M estimated cycles per dot in the stage-4 HLO - ~29x off MXU-ideal
        # for the same FLOPs); e static 2-D dots of (n*k, d) @ (d, f) tile cleanly.
        def _dot2(a, b):
            if self.remat_experts:
                # Size-1 batch dim at the jaxpr level: dot-saveable remat
                # policies (dots_with_no_batch_dims) skip the expert dots, so
                # the (e, n*k, f) hiddens stay remat-only (~117MB per MoE block
                # at 512px mask-0 mb8); XLA's simplifier collapses the dummy
                # batch before codegen. An inner jax.checkpoint does NOT work:
                # nested-remat residuals are re-exported and saved by the outer
                # block remat (see FeedForward.remat_hidden).
                return jax.lax.dot_general(
                    a[None], b[None], (((a.ndim,), (1,)), ((0,), (0,)))
                )[0]
            return jnp.dot(a, b)

        def expert_ffn(xe, w1e, w2e):
            he = _dot2(xe, w1e)  # (n*k, f) bf16
            he = nn.gelu(he.astype(jnp.float32), approximate=False).astype(he.dtype)
            return _dot2(he, w2e)  # (n*k, d)

        dispatch = self.dispatch
        if dispatch == "gather":
            # Fused Pallas expert FFN on the gathered rows: hiddens stay in
            # VMEM (no (e, m, f) HBM tensors, no conv-emitted batched dots) and
            # there are NO onehot dispatch-matmul FLOPs - the T=1024 stages'
            # combination (the onehot dispatch matmuls cost ~t/f of the expert
            # FLOPs, 50% at 512px mask-0).
            from ..ops.moe_ffn import moe_ffn_expert_major

            h = moe_ffn_expert_major(xin, w1, w2)
        elif dispatch == "scan":
            # same 2-D dots inside a lax.map body: ~8x smaller HLO for compile
            # helpers that crash on the fully unrolled graph; ~same device time
            # (the expert dots are serial on one core either way)
            h = jax.lax.map(
                lambda ops: expert_ffn(*ops), (xin, w1, w2)
            )
        elif dispatch == "batched":
            # single 3-D batched dots: goes through XLA:TPU's conv
            # batch-in-sublanes emitter (slower on the MXU) but produces the
            # lowest-peak-HBM update graph - the per-expert slice/stack form
            # makes XLA insert layout-change copies of the expert-weight grads
            # and optimizer moments (~50MB per MoE weight, OOMs 512px mask-0).
            he = jnp.einsum("emd,edf->emf", xin, w1)
            he = nn.gelu(he.astype(jnp.float32), approximate=False).astype(he.dtype)
            h = jnp.einsum("emf,efd->emd", he, w2)
        else:
            h = jnp.stack([expert_ffn(xin[i], w1[i], w2[i]) for i in range(e)])

        gt = jnp.swapaxes(g, 0, 1).reshape(e, n * k)  # (e, n*k)
        out = h * gt[..., None]

        # Combine: scatter-add back to flat token rows (tokens picked by several
        # experts accumulate, matching the reference one-hot combine einsum).
        out_flat = (
            jnp.zeros((n * t, d), out.dtype)
            .at[gidx.reshape(-1)]
            .add(out.reshape(-1, d))
        )
        # named for the 'dots_attn_moe' remat policy: the expert einsums are
        # batched over e, so dots_with_no_batch_dims never saves them
        return checkpoint_name(out_flat.reshape(n, t, d), "moe_out")

    def _hybrid_path(self, x, g, m, w1, w2):
        """Gather-fwd / matmul-bwd dispatch + matmul-fwd / gather-bwd combine
        (ops/moe_dispatch.py custom VJPs) around the fused Pallas expert FFN.

        Same math as the reference one-hot einsums (dit.py:126-143); the gate
        is folded elementwise between FFN and combine so d(gate) is a rowwise
        dot (sum_d dhg * h), not a (2t, t) matmul. See the dispatch-mode table
        above: this is the cheapest correct form on every MicroDiT stage."""
        n, t, d = x.shape
        e = self.num_experts
        k = m.shape[-1]
        from ..ops.moe_dispatch import combine_rows, dispatch_rows
        from ..ops.moe_ffn import moe_ffn

        idx = m.reshape(n, e * k)
        xg = dispatch_rows(x, idx, t)  # (n, e*k, d)
        h = moe_ffn(xg.reshape(n, e, k, d), w1, w2).reshape(n, e * k, d)
        hg = h * g.reshape(n, e * k, 1)
        return combine_rows(hg, idx, t)  # (n, t, d)

    def _onehot_path(self, x, g, m, w1, w2, hidden):
        """Gather/scatter-free dispatch: per-sample one-hot matmuls.

        Routing picks tokens WITHIN each sample (top-k over t per (n, e)), so both
        the dispatch gather and the combine scatter-add are block-diagonal per
        sample - i.e. a batched matmul with a (2t, t) one-hot selection matrix:

            xg[n]  = D[n]       @ x[n]      D = one-hot(m)           (n, e*k, t)
            out[n] = (D*g)[n]^T @ h[n]      gate folded into combine

        This rides the MXU instead of XLA:TPU's serialized scatter-add (profiled
        as the largest single ops at stage 1, PERF.md round 2), and its backward
        is also a matmul - the take/scatter form's backward re-emits the scatter.
        FLOP overhead is 4*n*t^2*d per matmul ~= t/f_avg of the expert-FFN FLOPs
        (4-13% across MicroDiT stages), repaid by removing the gather/scatter DMA
        entirely. n is a dot batch dim, so dots-saveable remat policies skip the
        (n, 2t, d) dispatch/combine outputs automatically.

        Matches the reference's one-hot einsum semantics (dit.py:126-143) with the
        [n, e, k, t] one-hot collapsed to block-diagonal 3-D form.
        """
        n, t, d = x.shape
        e = self.num_experts
        k = m.shape[-1]

        iota = jnp.arange(t, dtype=m.dtype)
        onehot = (m[..., None] == iota).astype(self.dtype)  # (n, e, k, t)
        onehot = jax.lax.stop_gradient(onehot).reshape(n, e * k, t)

        # dispatch: (n, e*k, t) @ (n, t, d) -> rows in (sample, expert, slot) order
        xg = jax.lax.dot_general(
            onehot, x, (((2,), (1,)), ((0,), (0,)))
        )  # (n, e*k, d) bf16

        if self.dispatch == "onehot":
            from ..ops.moe_ffn import moe_ffn

            h = moe_ffn(xg.reshape(n, e, k, d), w1, w2).reshape(n, e * k, d)
        else:  # onehot_dots: unrolled XLA 2-D expert dots (hiddens in HBM)
            xg4 = xg.reshape(n, e, k, d)

            def _dot2(a, b):
                if self.remat_experts:
                    return jax.lax.dot_general(
                        a[None], b[None], (((a.ndim,), (1,)), ((0,), (0,)))
                    )[0]
                return jnp.dot(a, b)

            hs = []
            for i in range(e):
                he = _dot2(xg4[:, i].reshape(n * k, d), w1[i])
                he = nn.gelu(he.astype(jnp.float32), approximate=False).astype(
                    he.dtype
                )
                hs.append(_dot2(he, w2[i]).reshape(n, k, d))
            h = jnp.stack(hs, axis=1).reshape(n, e * k, d)

        # combine: gate-weighted one-hot, contraction over the e*k row axis.
        # W depends on g, so autodiff routes d(gate) through the (tiny) one-hot.
        weights = onehot * g.reshape(n, e * k, 1)
        return jax.lax.dot_general(
            weights, h, (((1,), (1,)), ((0,), (0,)))
        )  # (n, t, d)


# --------------------------------------------------------------------------------------
# Attention
# --------------------------------------------------------------------------------------


def _lean_dense(mod: nn.Module, x: jax.Array, *, name: str, features: int,
                use_bias: bool, kernel_init, dtype, lean: bool) -> jax.Array:
    """nn.Dense semantics with an optional 'lean' emission: the dot carries a
    size-1 batch dimension at the jaxpr level so dots_with_no_batch_dims
    remat policies skip saving its output (XLA's simplifier collapses the
    dummy batch before codegen). The single compute path both FeedForward and
    the attention projections share - see FeedForward._linear for why a nested
    jax.checkpoint can NOT express this."""
    dense = nn.Dense(
        features, use_bias=use_bias, kernel_init=kernel_init,
        bias_init=zeros_init, dtype=dtype, param_dtype=jnp.float32, name=name,
    )
    if mod.is_initializing() or not lean:
        return dense(x)
    w = mod.variables["params"][name]["kernel"].astype(dtype)
    xb = x.astype(dtype)[None]
    y = jax.lax.dot_general(
        xb, w[None], (((xb.ndim - 1,), (1,)), ((0,), (0,)))
    )[0]
    if use_bias:
        y = y + mod.variables["params"][name]["bias"].astype(dtype)
    return y


class SelfAttention(nn.Module):
    """Self-attention with fused qkv and non-affine QK-LayerNorm over the flattened
    head dims (reference utils.py:144-201)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    norm_eps: float = 1e-6
    hidden_dim: Optional[int] = None
    qkv_init: Initializer = normal_init(0.02)
    proj_init: Initializer = xavier_uniform
    dtype: Any = jnp.bfloat16
    # attention backend (ops/attention.py): 'auto' | 'xla' | 'flash' |
    # 'flash_bthd' - a static config attribute, not an env var
    attn_impl: str = "auto"
    # Emit the qkv/out projections lean (see _lean_dense) so dots-saveable remat
    # policies don't store them: the pre-norm qkv dot output is the single
    # largest saved tensor per block at 512px (42MB at mb8) and its backward
    # recompute only needs the block input, which block-boundary remat saves
    # anyway. Enabled by the '*_alean' remat policies.
    remat_proj: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = self.hidden_dim or self.dim
        assert hidden % self.num_heads == 0
        head_dim = hidden // self.num_heads
        b, n, _ = x.shape

        qkv = _lean_dense(
            self, x, name="qkv", features=hidden * 3, use_bias=self.qkv_bias,
            kernel_init=self.qkv_init, dtype=self.dtype, lean=self.remat_proj,
        )
        qkv = qkv.reshape(b, n, 3, hidden)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        ln = lambda name: LayerNorm(
            hidden, eps=self.norm_eps, use_scale=False, dtype=self.dtype, name=name
        )
        q = ln("ln_q")(q).reshape(b, n, self.num_heads, head_dim)
        k = ln("ln_k")(k).reshape(b, n, self.num_heads, head_dim)
        v = v.reshape(b, n, self.num_heads, head_dim)

        out = dot_product_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, n, hidden)
        return _lean_dense(
            self, out, name="proj", features=self.dim, use_bias=self.qkv_bias,
            kernel_init=self.proj_init, dtype=self.dtype, lean=self.remat_proj,
        )


class CrossAttention(nn.Module):
    """Cross-attention: q from image tokens, kv from caption tokens, QK-LayerNorm on the
    flattened hidden dims (reference utils.py:81-141)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    norm_eps: float = 1e-6
    hidden_dim: Optional[int] = None
    qkv_init: Initializer = normal_init(0.02)
    proj_init: Initializer = xavier_uniform
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"  # see SelfAttention.attn_impl
    remat_proj: bool = False  # see SelfAttention.remat_proj

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        hidden = self.hidden_dim or self.dim
        assert hidden % self.num_heads == 0
        head_dim = hidden // self.num_heads
        b, n, _ = x.shape
        l = cond.shape[-2]
        cond = cond.reshape(b, l, cond.shape[-1])

        q = _lean_dense(
            self, x, name="q_linear", features=hidden, use_bias=self.qkv_bias,
            kernel_init=self.qkv_init, dtype=self.dtype, lean=self.remat_proj,
        )
        kv = _lean_dense(
            self, cond, name="kv_linear", features=hidden * 2,
            use_bias=self.qkv_bias, kernel_init=self.qkv_init, dtype=self.dtype,
            lean=self.remat_proj,
        )
        kv = kv.reshape(b, l, 2, hidden)
        k, v = kv[:, :, 0], kv[:, :, 1]

        ln = lambda name: LayerNorm(
            hidden, eps=self.norm_eps, use_scale=False, dtype=self.dtype, name=name
        )
        q = ln("ln_q")(q).reshape(b, n, self.num_heads, head_dim)
        k = ln("ln_k")(k).reshape(b, l, self.num_heads, head_dim)
        v = v.reshape(b, l, self.num_heads, head_dim)

        out = dot_product_attention(
            q, k, v, impl=self.attn_impl, ckpt_name="xattn_out"
        )
        out = out.reshape(b, n, hidden)
        return _lean_dense(
            self, out, name="proj", features=self.dim, use_bias=self.qkv_bias,
            kernel_init=self.proj_init, dtype=self.dtype, lean=self.remat_proj,
        )


# --------------------------------------------------------------------------------------
# Embedders / final layer
# --------------------------------------------------------------------------------------


class PatchEmbed(nn.Module):
    """Conv patchify + flatten, replacing timm PatchEmbed (dit.py:312-314).

    Input follows the reference NCHW layout; internally the conv runs NHWC (the TPU-native
    layout) and the (H/p, W/p) grid is flattened row-major to (B, T, D) like timm's
    flatten(2).transpose(1, 2).
    """

    patch_size: int
    in_channels: int
    embed_dim: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, c, h, w = x.shape
        p = self.patch_size
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=patch_embed_kernel_init,
            bias_init=torch_linear_bias_init(c * p * p),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(x)
        return x.reshape(b, (h // p) * (w // p), self.embed_dim)


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding + 2-layer MLP (reference utils.py:243-289).

    The frequency embedding is cos-first: cat([cos, sin]) (utils.py:278).
    """

    hidden_size: int
    frequency_embedding_size: int = 512
    dtype: Any = jnp.bfloat16

    @staticmethod
    def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
        half = dim // 2
        freqs = jnp.exp(
            -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        if dim % 2:
            emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
        return emb

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        t_freq = self.timestep_embedding(t, self.frequency_embedding_size)
        t_freq = t_freq.astype(self.dtype)
        dense = lambda name: nn.Dense(
            self.hidden_size, use_bias=True, kernel_init=normal_init(0.02),
            bias_init=zeros_init, dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        x = dense("mlp_0")(t_freq)
        x = nn.gelu(x, approximate=True)
        return dense("mlp_2")(x)


class CaptionProjection(nn.Module):
    """Caption embedding -> model dim MLP with inner LayerNorm (utils.py:292-318)."""

    in_channels: int
    hidden_size: int
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, caption: jax.Array) -> jax.Array:
        return Mlp(
            in_features=self.in_channels,
            hidden_features=self.hidden_size,
            out_features=self.hidden_size,
            use_norm=True,
            norm_eps=self.norm_eps,
            fc1_init=normal_init(0.02),
            fc2_init=normal_init(0.02),
            dtype=self.dtype,
            name="y_proj",
        )(caption)


class T2IFinalLayer(nn.Module):
    """Final adaLN (shift/scale) + linear to patch^2 * C (reference utils.py:204-240).

    Both the adaLN linear and the output linear are zero-initialized (dit.py:626-627).
    """

    hidden_size: int
    time_emb_dim: int
    patch_size: int
    out_channels: int
    norm_eps: float = 1e-6
    fused_adaln: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        ada = nn.gelu(c, approximate=True)
        ada = nn.Dense(
            2 * self.hidden_size, use_bias=True, kernel_init=zeros_init,
            bias_init=zeros_init, dtype=self.dtype, param_dtype=jnp.float32,
            name="adaLN_modulation_1",
        )(ada)
        shift, scale = jnp.split(ada, 2, axis=1)
        x = LayerNorm(self.hidden_size, eps=self.norm_eps,
                      fused_adaln=self.fused_adaln, dtype=self.dtype,
                      name="norm_final")(x, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels, use_bias=True,
            kernel_init=zeros_init, bias_init=zeros_init, dtype=self.dtype,
            param_dtype=jnp.float32, name="linear",
        )(x)


class AttentionBlockPromptEmbedding(nn.Module):
    """Pre-LN self-attention + SwiGLU FF block over caption tokens (dit.py:12-60).

    Output projections (attn.proj, mlp.w3) are zero-initialized (dit.py:621-623) so the
    block starts as identity.
    """

    dim: int
    head_dim: int
    mlp_ratio: float
    multiple_of: int
    norm_eps: float
    use_bias: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.dim % self.head_dim == 0
        h = LayerNorm(self.dim, eps=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        x = x + SelfAttention(
            dim=self.dim,
            num_heads=self.dim // self.head_dim,
            qkv_bias=self.use_bias,
            norm_eps=self.norm_eps,
            qkv_init=normal_init(0.02),
            proj_init=zeros_init,
            dtype=self.dtype,
            name="attn",
        )(h)
        h = LayerNorm(self.dim, eps=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        x = x + FeedForward(
            dim=self.dim,
            hidden_dim=int(self.dim * self.mlp_ratio),
            multiple_of=self.multiple_of,
            use_bias=self.use_bias,
            w1_init=normal_init(0.02),
            w2_init=normal_init(0.02),
            w3_init=zeros_init,
            dtype=self.dtype,
            name="mlp",
        )(h)
        return x


# --------------------------------------------------------------------------------------
# 2D sin-cos positional embedding (host-side numpy, reference utils.py:330-379)
# --------------------------------------------------------------------------------------


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed_from_grid(embed_dim: int, grid: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_2d_sincos_pos_embed(
    embed_dim: int,
    grid_size: int,
    pos_interp_scale: float = 1.0,
    base_size: int = 16,
) -> np.ndarray:
    """2D sin-cos positional embedding with resolution-transfer interpolation
    (reference utils.py:330-353): grid coords divided by (grid/base)/interp_scale."""
    grid_h = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size) / pos_interp_scale
    grid_w = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size) / pos_interp_scale
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0)
    grid = grid.reshape([2, 1, grid_size, grid_size])
    return get_2d_sincos_pos_embed_from_grid(embed_dim, grid)
