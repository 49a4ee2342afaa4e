"""TPU-native DiT backbone (MicroDiT) in flax.linen.

Architecture and initialization reproduce the reference (micro_diffusion/models/dit.py):
patchify -> pos-embed -> caption/timestep conditioning -> patch-mixer -> (optional) deferred
token masking -> width-laddered DiT blocks (adaLN-zero self-attn + cross-attn +
dense-or-EC-MoE FFN) -> final layer -> unmask scatter -> unpatchify.

TPU-first design choices (vs. the reference's CUDA/torch idioms):
  * all shapes are jit-static: the masking keep-count comes from a static mask_ratio,
    CFG batch-doubling happens at trace time, per-layer ragged qkv/ffn widths unroll into
    28 distinct block programs which XLA compiles once;
  * compute is bf16 on the MXU with fp32 parameters and fp32 softmax/LN statistics;
  * `pos_embed` and `mask_token` are deterministic constants (reference keeps them as
    torch buffers, dit.py:319,440-443; the mask token is zero-initialized and never
    trained, so we fold both out of the parameter pytree).

Reference citations are file:line into /root/reference.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    AttentionBlockPromptEmbedding,
    CaptionProjection,
    CrossAttention,
    FeedForward,
    FeedForwardECMoe,
    LayerNorm,
    Mlp,
    PatchEmbed,
    SelfAttention,
    T2IFinalLayer,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
    modulate,
    normal_init,
    xavier_uniform,
    zeros_init,
)
from ..ops.masking import gather_tokens, make_token_mask, scatter_tokens


def qkv_hidden_dim(dim: int, qkv_ratio: float, head_dim: int) -> int:
    """Per-layer qkv width: dim*ratio rounded up to a multiple of 2*head_dim
    (reference dit.py:192-195)."""
    if qkv_ratio == 1:
        return dim
    unit = head_dim * 2
    return unit * ((int(dim * qkv_ratio) + unit - 1) // unit)


class NormLinear(nn.Module):
    """LayerNorm + Linear projection pair (patch_mixer_map_{xin,xout,y}, dit.py:377-388)."""

    in_dim: int
    out_dim: int
    use_bias: bool
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = LayerNorm(self.in_dim, eps=self.norm_eps, dtype=self.dtype, name="norm")(x)
        return nn.Dense(
            self.out_dim, use_bias=self.use_bias, kernel_init=xavier_uniform,
            bias_init=zeros_init, dtype=self.dtype, param_dtype=jnp.float32,
            name="linear",
        )(x)


class DiTBlock(nn.Module):
    """adaLN-zero DiT block: gated self-attn, ungated cross-attn, gated (dense|MoE) FFN
    (reference dit.py:151-246). The adaLN projection is zero-initialized (dit.py:615-619)
    so every block starts as (almost) identity."""

    dim: int
    head_dim: int
    mlp_ratio: float
    qkv_ratio: float
    multiple_of: int
    pooled_emb_dim: int
    norm_eps: float
    depth_init: bool
    layer_id: int
    num_layers: int
    compress_xattn: bool
    use_bias: bool
    moe_block: bool
    num_experts: int
    expert_capacity: float
    moe_remat_experts: bool = False
    ffn_remat_hidden: bool = False
    attn_remat_proj: bool = False
    moe_dispatch: str = "onehot"
    attn_impl: str = "auto"
    # Cross-attention backend override (None -> follow attn_impl). The xattn
    # site's shape is extreme - kv = 77 caption tokens vs Tq up to 1024 - and
    # the measured-best backend can differ from self-attention's (the lane
    # kernel runs one tiny program per (image, q-block) there; see
    # ops/attention.py and PERF.md round 4).
    xattn_impl: Optional[str] = None
    fused_adaln: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array, c: jax.Array) -> jax.Array:
        qkv_hidden = qkv_hidden_dim(self.dim, self.qkv_ratio, self.head_dim)
        mlp_hidden = int(self.dim * self.mlp_ratio)
        # Depth-scaled init std for output projections (dit.py:227-230).
        init_std = (
            0.02 / (2 * (self.layer_id + 1)) ** 0.5
            if self.depth_init
            else 0.02 / (2 * self.num_layers) ** 0.5
        )

        ada = nn.gelu(c, approximate=True)
        ada = nn.Dense(
            6 * self.dim, use_bias=True, kernel_init=zeros_init, bias_init=zeros_init,
            dtype=self.dtype, param_dtype=jnp.float32, name="adaLN_modulation_1",
        )(ada)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            ada, 6, axis=1
        )

        h = LayerNorm(self.dim, eps=self.norm_eps, fused_adaln=self.fused_adaln,
                      dtype=self.dtype, name="norm1")(
            x, shift_msa, scale_msa
        )
        h = SelfAttention(
            dim=self.dim,
            num_heads=qkv_hidden // self.head_dim,
            qkv_bias=self.use_bias,
            norm_eps=self.norm_eps,
            hidden_dim=qkv_hidden,
            qkv_init=normal_init(0.02),
            proj_init=normal_init(init_std),
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat_proj=self.attn_remat_proj,
            name="attn",
        )(h)
        x = x + gate_msa[:, None, :] * h

        h = LayerNorm(self.dim, eps=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(
            dim=self.dim,
            num_heads=(qkv_hidden if self.compress_xattn else self.dim) // self.head_dim,
            qkv_bias=self.use_bias,
            norm_eps=self.norm_eps,
            hidden_dim=qkv_hidden if self.compress_xattn else self.dim,
            qkv_init=normal_init(0.02),
            proj_init=normal_init(init_std),
            dtype=self.dtype,
            attn_impl=self.xattn_impl or self.attn_impl,
            remat_proj=self.attn_remat_proj,
            name="cross_attn",
        )(h, y)

        h = LayerNorm(self.dim, eps=self.norm_eps, fused_adaln=self.fused_adaln,
                      dtype=self.dtype, name="norm3")(
            x, shift_mlp, scale_mlp
        )
        if self.moe_block:
            h = FeedForwardECMoe(
                num_experts=self.num_experts,
                expert_capacity=self.expert_capacity,
                dim=self.dim,
                hidden_dim=mlp_hidden,
                multiple_of=self.multiple_of,
                w2_init=normal_init(init_std),
                remat_experts=self.moe_remat_experts,
                dispatch=self.moe_dispatch,
                dtype=self.dtype,
                name="mlp",
            )(h)
        else:
            h = FeedForward(
                dim=self.dim,
                hidden_dim=mlp_hidden,
                multiple_of=self.multiple_of,
                use_bias=self.use_bias,
                w1_init=normal_init(0.02),
                w2_init=normal_init(init_std),
                w3_init=normal_init(init_std),
                remat_hidden=self.ffn_remat_hidden,
                dtype=self.dtype,
                name="mlp",
            )(h)
        x = x + gate_mlp[:, None, :] * h
        return x


def _moe_block_flags(depth: int, experts_every_n: int, *, skip_last: bool) -> list[bool]:
    """Every n-th block is MoE. Backbone candidates are range(0, depth-1) - block 0 can
    be MoE when experts_every_n == 1, never the last block (dit.py:410-414); mixer
    candidates are range(1, depth) (dit.py:346-349)."""
    if skip_last:  # backbone
        candidates = range(0, depth - 1)
    else:  # patch mixer
        candidates = range(1, depth)
    moe_idx = {i for i in candidates if (i + 1) % experts_every_n == 0}
    return [i in moe_idx for i in range(depth)]


class DiT(nn.Module):
    """Text-conditioned Diffusion Transformer (reference dit.py:249-627)."""

    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    dim: int = 1152
    depth: int = 28
    head_dim: int = 64
    multiple_of: int = 256
    caption_channels: int = 1024
    pos_interp_scale: float = 1.0
    norm_eps: float = 1e-6
    depth_init: bool = True
    qkv_multipliers: Sequence[float] = (1.0,)
    ffn_multipliers: Sequence[float] = (4.0,)
    use_patch_mixer: bool = True
    patch_mixer_depth: int = 4
    patch_mixer_dim: int = 512
    patch_mixer_qkv_ratio: float = 1.0
    patch_mixer_mlp_ratio: float = 1.0
    use_bias: bool = True
    num_experts: int = 8
    expert_capacity: float = 1.0
    experts_every_n: int = 2
    dtype: Any = jnp.bfloat16
    # Rematerialize each DiT block in the backward pass (jax.checkpoint): trades ~30%
    # more FLOPs for O(depth) less activation HBM - the standard TPU memory lever
    # (the reference instead relies on 80GB H100s).
    remat: bool = False
    # 'full'  - recompute everything in the block (min memory, +1 fwd of FLOPs)
    # 'dots'  - save matmul outputs, recompute elementwise only (near-zero extra MXU
    #           FLOPs, moderate memory) - usually the best TPU throughput point
    # 'dots_attn_moe' - 'dots' plus the pallas attention outputs and the EC-MoE
    #           block outputs (saved by name; both are custom-call/scatter results
    #           that no dot-based policy catches) - best measured at every stage
    # '<any>_lean' - same, but the per-expert MoE hidden dots stay remat-only
    #           (~117MB/MoE block saved at 512px mask-0 mb8; required to fit there)
    remat_policy: str = "full"
    # EC-MoE dispatch/combine implementation (see FeedForwardECMoe.dispatch):
    # 'onehot' (one-hot matmul dispatch + fused Pallas expert FFN, default),
    # 'gather' (flat gather + fused Pallas FFN + scatter - the T=1024 choice),
    # 'onehot_dots', 'unroll', 'batched', 'scan'. A static config field - NOT an
    # env var - so it participates in the module hash and two models traced in
    # one process cannot diverge silently (round-2 advisor finding).
    moe_dispatch: str = "onehot"
    # Attention backend ('auto' | 'xla' | 'flash' | 'flash_bthd'; ops/attention.py).
    # On TPU 'auto' dispatches the lane-packed flash kernel at EVERY supported
    # shape (head_dim 64, even H): with zero relayout copies around the custom
    # call it beat the XLA path in-step at all MicroDiT lengths (round 3,
    # commit cedfe94). Where the lane kernel does not apply, flash-bh takes over
    # only at Tq >= 512 (it pays host transposes) and XLA runs below.
    attention_impl: str = "auto"
    # Cross-attention backend override (None -> attention_impl). See DiTBlock.
    xattn_attention_impl: Optional[str] = None
    # Fuse each adaLN LayerNorm+modulate into one Pallas VMEM pass
    # (ops/adaln.py). Off by default: XLA fuses the unfused chain well and the
    # kernel never won a bench rung; kept as a config choice with an
    # equivalence test (tests/test_adaln.py).
    fused_adaln: bool = False

    @property
    def out_channels(self) -> int:
        return self.in_channels

    @property
    def base_size(self) -> int:
        return self.input_size // self.patch_size

    def _layer_ratios(self) -> tuple[list[float], list[float]]:
        """Distribute qkv/ffn multipliers across depth (reference dit.py:394-408)."""
        qkv_m = list(self.qkv_multipliers)
        ffn_m = list(self.ffn_multipliers)
        assert len(qkv_m) == len(ffn_m)
        if len(ffn_m) == self.depth:
            return qkv_m, ffn_m
        num_splits = len(ffn_m)
        assert self.depth % num_splits == 0, (
            "number of blocks should be divisible by number of splits"
        )
        per = self.depth // num_splits
        qkv = [m for m in qkv_m for _ in range(per)]
        ffn = [m for m in ffn_m for _ in range(per)]
        return qkv, ffn

    def setup(self):
        self.x_embedder = PatchEmbed(
            patch_size=self.patch_size,
            in_channels=self.in_channels,
            embed_dim=self.dim,
            use_bias=True,
            dtype=self.dtype,
        )
        self.t_embedder = TimestepEmbedder(self.dim, dtype=self.dtype)
        self.y_embedder = CaptionProjection(
            in_channels=self.caption_channels,
            hidden_size=self.dim,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
        )
        self.y_emb_preprocess = AttentionBlockPromptEmbedding(
            dim=self.dim,
            head_dim=self.head_dim,
            mlp_ratio=4.0,
            multiple_of=self.multiple_of,
            norm_eps=self.norm_eps,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )
        self.pooled_y_emb_process = Mlp(
            in_features=self.dim,
            hidden_features=self.dim,
            out_features=self.dim,
            use_norm=True,
            norm_eps=self.norm_eps,
            fc1_init=normal_init(0.02),
            fc2_init=normal_init(0.02),
            dtype=self.dtype,
        )

        # '<policy>_lean' variants additionally recompute the per-expert MoE hidden
        # activations in the backward pass (see FeedForwardECMoe.remat_experts);
        # '<policy>_xlean' also recomputes the dense SwiGLU hiddens
        # (FeedForward.remat_hidden). Needed at 512px mask-0, where saving these
        # exceeds one chip's HBM.
        base_policy = self.remat_policy
        # '_alean': emit the attention qkv/q/kv/out projections lean so dots
        # policies skip saving them (the pre-norm qkv dot output is the largest
        # per-block saved tensor at 512px; its recompute reads only the
        # block-boundary input). Composes with _lean/_xlean: e.g.
        # 'dots_attn_moe_xlean_alean'.
        attn_lean = base_policy.endswith("_alean")
        if attn_lean:
            base_policy = base_policy[: -len("_alean")]
        ffn_lean = base_policy.endswith("_xlean")
        if ffn_lean:
            base_policy = base_policy[: -len("_xlean")]
        moe_lean = ffn_lean or base_policy.endswith("_lean")
        if base_policy.endswith("_lean"):
            base_policy = base_policy[: -len("_lean")]
        if self.remat:
            if base_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif base_policy == "attn_moe":
                # Save ONLY the named attention/EC-MoE block outputs: nearly
                # full-remat memory, but the backward skips re-running the two
                # most DMA-heavy subgraphs (the MoE dispatch gathers and the
                # attention chains) - the stage-1 profile is copy/DMA-bound.
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "xattn_out", "moe_out"
                )
            elif base_policy == "dots_attn_moe":
                # 'dots' misses two recompute-heavy hot spots: pallas attention
                # outputs (custom calls are never dot-saveable) and the EC-MoE
                # expert einsums (batched over the expert dim, so excluded by
                # no_batch_dims). Save those by name too - the values are tagged
                # via checkpoint_name in ops/attention.py and models/layers.py.
                saved_names = ["attn_out", "moe_out"]
                if not attn_lean:
                    # '_alean' recomputes cross-attention in the backward (its
                    # kv is the 77-token caption side - cheap), freeing the
                    # 16MB-per-site xattn_out saves on top of the lean
                    # projections.
                    saved_names.append("xattn_out")
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names(*saved_names),
                )
            else:
                policy = None
            block_cls = nn.remat(DiTBlock, policy=policy)
        else:
            block_cls = DiTBlock
        if self.use_patch_mixer:
            mixer_moe = _moe_block_flags(
                self.patch_mixer_depth, self.experts_every_n, skip_last=False
            )
            self.patch_mixer = [
                block_cls(
                    dim=self.patch_mixer_dim,
                    head_dim=self.head_dim,
                    mlp_ratio=self.patch_mixer_mlp_ratio,
                    qkv_ratio=self.patch_mixer_qkv_ratio,
                    multiple_of=self.multiple_of,
                    pooled_emb_dim=self.dim,
                    norm_eps=self.norm_eps,
                    depth_init=False,
                    layer_id=0,
                    num_layers=self.depth,
                    compress_xattn=False,
                    use_bias=self.use_bias,
                    moe_block=mixer_moe[i],
                    num_experts=self.num_experts,
                    expert_capacity=self.expert_capacity,
                    moe_remat_experts=moe_lean,
                    ffn_remat_hidden=ffn_lean,
                    attn_remat_proj=attn_lean,
                    moe_dispatch=self.moe_dispatch,
                    attn_impl=self.attention_impl,
                    xattn_impl=self.xattn_attention_impl,
                    fused_adaln=self.fused_adaln,
                    dtype=self.dtype,
                    name=f"patch_mixer_{i}",
                )
                for i in range(self.patch_mixer_depth)
            ]
            if self.patch_mixer_dim != self.dim:
                self.patch_mixer_map_xin = NormLinear(
                    self.dim, self.patch_mixer_dim, self.use_bias,
                    norm_eps=self.norm_eps, dtype=self.dtype,
                )
                self.patch_mixer_map_xout = NormLinear(
                    self.patch_mixer_dim, self.dim, self.use_bias,
                    norm_eps=self.norm_eps, dtype=self.dtype,
                )
                self.patch_mixer_map_y = NormLinear(
                    self.dim, self.patch_mixer_dim, self.use_bias,
                    norm_eps=self.norm_eps, dtype=self.dtype,
                )
            else:
                self.patch_mixer_map_xin = None
                self.patch_mixer_map_xout = None
                self.patch_mixer_map_y = None

        qkv_ratios, mlp_ratios = self._layer_ratios()
        backbone_moe = _moe_block_flags(self.depth, self.experts_every_n, skip_last=True)
        self.blocks = [
            block_cls(
                dim=self.dim,
                head_dim=self.head_dim,
                mlp_ratio=mlp_ratios[i],
                qkv_ratio=qkv_ratios[i],
                multiple_of=self.multiple_of,
                pooled_emb_dim=self.dim,
                norm_eps=self.norm_eps,
                depth_init=self.depth_init,
                layer_id=i,
                num_layers=self.depth,
                compress_xattn=False,
                use_bias=self.use_bias,
                moe_block=backbone_moe[i],
                num_experts=self.num_experts,
                expert_capacity=self.expert_capacity,
                moe_remat_experts=moe_lean,
                ffn_remat_hidden=ffn_lean,
                attn_remat_proj=attn_lean,
                moe_dispatch=self.moe_dispatch,
                attn_impl=self.attention_impl,
                xattn_impl=self.xattn_attention_impl,
                fused_adaln=self.fused_adaln,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]

        self.final_layer = T2IFinalLayer(
            hidden_size=self.dim,
            time_emb_dim=self.dim,
            patch_size=self.patch_size,
            out_channels=self.out_channels,
            norm_eps=self.norm_eps,
            fused_adaln=self.fused_adaln,
            dtype=self.dtype,
        )

        # Deterministic constants (reference buffers dit.py:319,440-443,591-597).
        num_patches = (self.input_size // self.patch_size) ** 2
        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(
                self.dim,
                int(num_patches**0.5),
                pos_interp_scale=self.pos_interp_scale,
                base_size=self.base_size,
            )[None],
            dtype=jnp.float32,
        )
        self.mask_token = jnp.zeros(
            (1, 1, self.patch_size**2 * self.out_channels), dtype=jnp.float32
        )

    def unpatchify(self, x: jax.Array) -> jax.Array:
        """(B, T, p*p*C) -> (B, C, H, W) (reference dit.py:566-575)."""
        c = self.out_channels
        p = self.patch_size
        h = w = int(x.shape[1] ** 0.5)
        assert h * w == x.shape[1]
        x = x.reshape(x.shape[0], h, w, p, p, c)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        return x.reshape(x.shape[0], c, h * p, w * p)

    def forward_without_cfg(
        self,
        x: jax.Array,
        t: jax.Array,
        y: jax.Array,
        mask_ratio: float = 0.0,
    ) -> dict:
        """Unguided forward pass (reference dit.py:455-519).

        Args:
            x: (B, C, H, W) noisy latents.
            t: () or (B,) timesteps (EDM c_noise values).
            y: (B, 1, L, cap_dim) or (B, L, cap_dim) caption embeddings.
            mask_ratio: static Python float; >0 enables deferred token masking and
                requires a 'mask' rng.
        Returns:
            {'sample': (B, C, H, W), 'mask': (B, T) or None}
        """
        b = x.shape[0]
        x = self.x_embedder(x) + self.pos_embed.astype(self.dtype)  # (B, T, D)
        t = self.t_embedder(jnp.broadcast_to(jnp.atleast_1d(t), (b,)))  # (B, D)

        if y.ndim == 4:
            y = y.reshape(b, y.shape[-2], y.shape[-1])
        y = self.y_embedder(y)  # (B, L, D)
        y = self.y_emb_preprocess(y)
        y_pooled = self.pooled_y_emb_process(jnp.mean(y, axis=-2))
        c = t + y_pooled

        mask = None
        if self.use_patch_mixer:
            if self.patch_mixer_map_xin is not None:
                x = self.patch_mixer_map_xin(x)
                y_mixer = self.patch_mixer_map_y(y)
            else:
                y_mixer = y
            for block in self.patch_mixer:
                x = block(x, y_mixer, c)

        if mask_ratio > 0:
            token_mask = make_token_mask(
                self.make_rng("mask"), x.shape[0], x.shape[1], mask_ratio
            )
            mask = token_mask.mask
            x = gather_tokens(x, token_mask.ids_keep)

        if self.use_patch_mixer and self.patch_mixer_map_xout is not None:
            # Project back to backbone dim after masking to save compute (dit.py:506-508).
            x = self.patch_mixer_map_xout(x)

        for block in self.blocks:
            x = block(x, y, c)

        x = self.final_layer(x, c)  # (B, T_keep, p*p*C)

        if mask_ratio > 0:
            x = scatter_tokens(x, token_mask.ids_restore, self.mask_token)

        x = self.unpatchify(x.astype(jnp.float32))
        return {"sample": x, "mask": mask}

    def forward_with_cfg(
        self,
        x: jax.Array,
        t: jax.Array,
        y: jax.Array,
        cfg: float = 1.0,
        mask_ratio: float = 0.0,
    ) -> dict:
        """Classifier-free guidance via batch doubling (reference dit.py:521-550)."""
        x = jnp.concatenate([x, x], axis=0)
        y = jnp.concatenate([y, jnp.zeros_like(y)], axis=0)
        t = jnp.atleast_1d(t)
        if t.shape[0] != 1:
            t = jnp.concatenate([t, t], axis=0)
        eps = self.forward_without_cfg(x, t, y, mask_ratio)["sample"]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        eps = uncond_eps + cfg * (cond_eps - uncond_eps)
        return {"sample": eps}

    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        y: jax.Array,
        cfg: float = 1.0,
        mask_ratio: float = 0.0,
    ) -> dict:
        """Routes on the static cfg scale (reference dit.py:552-564)."""
        if cfg != 1.0:
            return self.forward_with_cfg(x, t, y, cfg, mask_ratio)
        return self.forward_without_cfg(x, t, y, mask_ratio)


def MicroDiT_Tiny_2(
    caption_channels: int = 1024,
    qkv_ratio: Sequence[float] = (0.5, 1.0),
    mlp_ratio: Sequence[float] = (0.5, 4.0),
    pos_interp_scale: float = 1.0,
    input_size: int = 32,
    num_experts: int = 8,
    expert_capacity: float = 2.0,
    experts_every_n: int = 2,
    in_channels: int = 4,
    **kwargs,
) -> DiT:
    """~201M-param MicroDiT (reference dit.py:630-668)."""
    depth = 16
    return DiT(
        input_size=input_size,
        patch_size=2,
        in_channels=in_channels,
        dim=512,
        depth=depth,
        head_dim=32,
        multiple_of=256,
        caption_channels=caption_channels,
        pos_interp_scale=pos_interp_scale,
        norm_eps=1e-6,
        depth_init=True,
        qkv_multipliers=tuple(np.linspace(qkv_ratio[0], qkv_ratio[1], num=depth)),
        ffn_multipliers=tuple(np.linspace(mlp_ratio[0], mlp_ratio[1], num=depth)),
        use_patch_mixer=True,
        patch_mixer_depth=4,
        patch_mixer_dim=512,
        patch_mixer_qkv_ratio=1.0,
        patch_mixer_mlp_ratio=4.0,
        use_bias=False,
        num_experts=num_experts,
        expert_capacity=expert_capacity,
        experts_every_n=experts_every_n,
        **kwargs,
    )


def MicroDiT_XL_2(
    caption_channels: int = 1024,
    qkv_ratio: Sequence[float] = (0.5, 1.0),
    mlp_ratio: Sequence[float] = (0.5, 4.0),
    pos_interp_scale: float = 1.0,
    input_size: int = 32,
    num_experts: int = 8,
    expert_capacity: float = 2.0,
    experts_every_n: int = 2,
    in_channels: int = 4,
    **kwargs,
) -> DiT:
    """~1.165B-param MicroDiT (reference dit.py:671-709)."""
    depth = 28
    return DiT(
        input_size=input_size,
        patch_size=2,
        in_channels=in_channels,
        dim=1024,
        depth=depth,
        head_dim=64,
        multiple_of=256,
        caption_channels=caption_channels,
        pos_interp_scale=pos_interp_scale,
        norm_eps=1e-6,
        depth_init=True,
        qkv_multipliers=tuple(np.linspace(qkv_ratio[0], qkv_ratio[1], num=depth)),
        ffn_multipliers=tuple(np.linspace(mlp_ratio[0], mlp_ratio[1], num=depth)),
        use_patch_mixer=True,
        patch_mixer_depth=6,
        patch_mixer_dim=768,
        patch_mixer_qkv_ratio=1.0,
        patch_mixer_mlp_ratio=4.0,
        use_bias=False,
        num_experts=num_experts,
        expert_capacity=expert_capacity,
        experts_every_n=experts_every_n,
        **kwargs,
    )


def MicroDiT_Micro_2(
    caption_channels: int = 1024,
    qkv_ratio: Sequence[float] = (0.5, 1.0),
    mlp_ratio: Sequence[float] = (0.5, 4.0),
    pos_interp_scale: float = 1.0,
    input_size: int = 32,
    num_experts: int = 4,
    expert_capacity: float = 2.0,
    experts_every_n: int = 2,
    in_channels: int = 4,
    **kwargs,
) -> DiT:
    """Debug-scale model (~1M params in the backbone) for smoke tests and CI - not part
    of the reference zoo (dit.py has Tiny/XL only) but structurally identical."""
    depth = 4
    return DiT(
        input_size=input_size,
        patch_size=2,
        in_channels=in_channels,
        dim=64,
        depth=depth,
        head_dim=16,
        multiple_of=32,
        caption_channels=caption_channels,
        pos_interp_scale=pos_interp_scale,
        norm_eps=1e-6,
        depth_init=True,
        qkv_multipliers=tuple(np.linspace(qkv_ratio[0], qkv_ratio[1], num=depth)),
        ffn_multipliers=tuple(np.linspace(mlp_ratio[0], mlp_ratio[1], num=depth)),
        use_patch_mixer=True,
        patch_mixer_depth=2,
        patch_mixer_dim=48,
        patch_mixer_qkv_ratio=1.0,
        patch_mixer_mlp_ratio=4.0,
        use_bias=False,
        num_experts=num_experts,
        expert_capacity=expert_capacity,
        experts_every_n=experts_every_n,
        **kwargs,
    )
