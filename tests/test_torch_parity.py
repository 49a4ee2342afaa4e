"""Cross-framework parity: our JAX DiT vs an independent torch implementation of the
same architecture (tests/torch_ref.py), with weights flowing through the interop
converter. Agreement proves the converter layouts (conv/qkv packing, SwiGLU wiring,
adaLN ordering) and the architecture semantics simultaneously."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from micro_diffusion_tpu.models.dit import DiT
from micro_diffusion_tpu.models.interop import params_to_torch_state_dict
from micro_diffusion_tpu.models.layers import get_2d_sincos_pos_embed

from torch_ref import TorchMicroDiT


def test_jax_vs_torch_forward():
    cfg = dict(
        input_size=16, patch_size=2, in_channels=4, dim=64, depth=4, head_dim=16,
        multiple_of=32, caption_channels=32,
        qkv_multipliers=(0.5, 1.0), ffn_multipliers=(0.5, 4.0),
        patch_mixer_depth=2, patch_mixer_dim=48, use_bias=False,
        num_experts=4, expert_capacity=2.0,
    )
    model = DiT(
        dtype=jnp.float32, use_patch_mixer=True, patch_mixer_qkv_ratio=1.0,
        patch_mixer_mlp_ratio=4.0, **cfg,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 16, 16))
    t = jnp.asarray([0.3, 0.9])
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8, 32))
    params = jax.jit(lambda: model.init({"params": rng, "mask": rng}, x, t, y))()
    # randomize the zero-init output layers so the comparison is informative
    params = jax.tree_util.tree_map_with_path(
        lambda path, leaf: leaf
        + 0.05
        * jax.random.normal(
            jax.random.PRNGKey(
                __import__("zlib").crc32(str(path).encode()) % (2**31)
            ),
            leaf.shape,
        ),
        params,
    )

    out_jax = jax.jit(lambda p: model.apply(p, x, t, y)["sample"])(params)

    # expand the per-split multipliers to per-layer like the reference ladder
    per = cfg["depth"] // len(cfg["ffn_multipliers"])
    qkv = [m for m in cfg["qkv_multipliers"] for _ in range(per)]
    ffn = [m for m in cfg["ffn_multipliers"] for _ in range(per)]
    pos = get_2d_sincos_pos_embed(cfg["dim"], 8, 1.0, base_size=8)
    tmodel = TorchMicroDiT(
        input_size=16, patch_size=2, in_channels=4, dim=64, depth=4, head_dim=16,
        multiple_of=32, caption_channels=32, qkv_multipliers=qkv,
        ffn_multipliers=ffn, mixer_depth=2, mixer_dim=48, bias=False,
        num_experts=4, capacity=2.0, pos_embed=pos,
    ).eval()

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state_dict(params).items()
    }
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert not unexpected, f"converter produced unknown keys: {unexpected[:5]}"
    assert set(missing) == {"pos_embed"}, f"missing: {missing[:8]}"

    with torch.no_grad():
        out_torch = tmodel(
            torch.from_numpy(np.asarray(x)),
            torch.from_numpy(np.asarray(t)),
            torch.from_numpy(np.asarray(y)),
        ).numpy()

    np.testing.assert_allclose(np.asarray(out_jax), out_torch, rtol=2e-4, atol=2e-4)
