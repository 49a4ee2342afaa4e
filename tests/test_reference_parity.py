"""Parity against the REAL reference model (/root/reference/micro_diffusion/models).

Round-1 parity tests compared against tests/torch_ref.py - a self-written replica
(VERDICT.md missing #3). These tests import the actual reference `dit.py` (torch is
installed; `timm.models.vision_transformer.PatchEmbed` plus the unused-at-import
`torchmetrics`/`open_clip` modules are stubbed) and assert:

  (a) ground-truth param counts for MicroDiT_Tiny_2 / MicroDiT_XL_2,
  (b) forward allclose between the reference module and our DiT through the interop
      converter at micro and Tiny scale,
  (c) converter key-set + shape equality against a real `dit.state_dict()`.
"""

import importlib
import sys
import types

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn

from micro_diffusion_tpu.models.dit import DiT as JaxDiT
from micro_diffusion_tpu.models.dit import MicroDiT_Tiny_2
from micro_diffusion_tpu.models.interop import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)

REFERENCE_ROOT = "/root/reference/micro_diffusion"


class _PatchEmbedStub(nn.Module):
    """Minimal timm.models.vision_transformer.PatchEmbed: Conv2d(k=p, s=p) + flatten.

    Matches the attribute surface the reference uses: `.proj` (state-dict name
    x_embedder.proj.*, touched by initialize_weights) and `.num_patches`
    (reference dit.py:312-318).
    """

    def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768,
                 norm_layer=None, flatten=True, bias=True):
        super().__init__()
        self.patch_size = (patch_size, patch_size)
        self.num_patches = (img_size // patch_size) ** 2
        self.flatten = flatten
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                              stride=patch_size, bias=bias)

    def forward(self, x):
        x = self.proj(x)
        if self.flatten:
            x = x.flatten(2).transpose(1, 2)  # (B, C, H', W') -> (B, T, C)
        return x


def _stub_module(name: str) -> types.ModuleType:
    """Module stub with a real __spec__ (transformers probes timm via find_spec,
    which raises on spec-less sys.modules entries)."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _install_stubs():
    if "timm.models.vision_transformer" not in sys.modules:
        timm = _stub_module("timm")
        timm_models = _stub_module("timm.models")
        timm_vit = _stub_module("timm.models.vision_transformer")
        timm_vit.PatchEmbed = _PatchEmbedStub
        timm.models = timm_models
        timm_models.vision_transformer = timm_vit
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.vision_transformer"] = timm_vit
    if "torchmetrics" not in sys.modules:
        tm = _stub_module("torchmetrics")

        class Metric:  # only subclassed (DistLoss), never exercised here
            def __init__(self, *a, **k):
                pass

        tm.Metric = Metric
        sys.modules["torchmetrics"] = tm
    if "open_clip" not in sys.modules:
        # module-level `import open_clip` only; all uses are inside encoder builders
        sys.modules["open_clip"] = _stub_module("open_clip")


@pytest.fixture(scope="module")
def ref_dit_module():
    """Import the real reference micro_diffusion.models.dit as a package module."""
    _install_stubs()
    pkg = types.ModuleType("ref_micro_diffusion")
    pkg.__path__ = [REFERENCE_ROOT]
    models = types.ModuleType("ref_micro_diffusion.models")
    models.__path__ = [f"{REFERENCE_ROOT}/models"]
    sys.modules.setdefault("ref_micro_diffusion", pkg)
    sys.modules.setdefault("ref_micro_diffusion.models", models)
    return importlib.import_module("ref_micro_diffusion.models.dit")


# Exact analytic counts, asserted in round 1 against our flax model
# (tests/test_dit.py); here we pin them against the actual reference module.
TINY_PARAMS = 200_692_752
XL_PARAMS = 1_165_442_320

MICRO_KWARGS = dict(
    input_size=16, patch_size=2, in_channels=4, dim=64, depth=4, head_dim=16,
    multiple_of=32, caption_channels=32, pos_interp_scale=1.0, norm_eps=1e-6,
    depth_init=True, qkv_multipliers=list(np.linspace(0.5, 1.0, 4)),
    ffn_multipliers=list(np.linspace(0.5, 4.0, 4)), use_patch_mixer=True,
    patch_mixer_depth=2, patch_mixer_dim=48, patch_mixer_qkv_ratio=1.0,
    patch_mixer_mlp_ratio=4.0, use_bias=False, num_experts=4,
    expert_capacity=2.0, experts_every_n=2,
)


def _count_params(model: nn.Module) -> int:
    return sum(p.numel() for p in model.parameters())


def test_tiny_param_count_matches_reference(ref_dit_module):
    torch.manual_seed(0)
    model = ref_dit_module.MicroDiT_Tiny_2()
    assert _count_params(model) == TINY_PARAMS


def test_xl_param_count_matches_reference(ref_dit_module):
    # meta device: count parameters without allocating/initializing 4.7GB
    try:
        with torch.device("meta"):
            model = ref_dit_module.MicroDiT_XL_2()
    except Exception:  # older torch or init incompatibilities -> real instantiation
        model = ref_dit_module.MicroDiT_XL_2()
    assert _count_params(model) == XL_PARAMS


def _jax_dit_like(ref_kwargs) -> JaxDiT:
    kw = dict(ref_kwargs)
    kw["qkv_multipliers"] = tuple(kw["qkv_multipliers"])
    kw["ffn_multipliers"] = tuple(kw["ffn_multipliers"])
    return JaxDiT(dtype=jax.numpy.float32, **kw)


def _forward_parity(ref_model, jax_model, b, c, res, cap_len, cap_dim, atol):
    ref_model.eval()
    sd = ref_model.state_dict()
    params = {"params": torch_state_dict_to_params(sd)}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, c, res, res), dtype=np.float32)
    t = rng.uniform(0.0, 4.0, size=(b,)).astype(np.float32)
    y = rng.standard_normal((b, 1, cap_len, cap_dim), dtype=np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)
        )["sample"].numpy()

    jax_out = np.asarray(
        jax.jit(
            lambda p, x, t, y: jax_model.apply(
                p, x, t, y, method=jax_model.forward_without_cfg
            )["sample"]
        )(params, x, t, y)
    )
    np.testing.assert_allclose(jax_out, ref_out, atol=atol, rtol=1e-4)


def test_forward_parity_micro(ref_dit_module):
    torch.manual_seed(0)
    ref_model = ref_dit_module.DiT(**MICRO_KWARGS)
    jax_model = _jax_dit_like(MICRO_KWARGS)
    _forward_parity(ref_model, jax_model, b=2, c=4, res=16, cap_len=8, cap_dim=32,
                    atol=2e-5)


def test_forward_parity_tiny(ref_dit_module):
    """Full 201M-param MicroDiT_Tiny_2 forward vs the real reference weights."""
    torch.manual_seed(0)
    ref_model = ref_dit_module.MicroDiT_Tiny_2()
    jax_model = MicroDiT_Tiny_2(dtype=jax.numpy.float32)
    _forward_parity(ref_model, jax_model, b=1, c=4, res=32, cap_len=77,
                    cap_dim=1024, atol=5e-4)


def test_converter_keyset_matches_real_state_dict(ref_dit_module):
    """params_to_torch_state_dict must produce exactly the reference's key set
    (minus the two deterministic buffers we fold out) with identical shapes."""
    torch.manual_seed(0)
    ref_model = ref_dit_module.DiT(**MICRO_KWARGS)
    ref_sd = {k: v for k, v in ref_model.state_dict().items()
              if k not in ("pos_embed", "mask_token")}

    jax_model = _jax_dit_like(MICRO_KWARGS)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    variables = jax_model.init(
        {"params": rng, "mask": rng},
        jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)), jnp.zeros((1, 1, 8, 32)),
    )
    ours = params_to_torch_state_dict(variables["params"])

    assert set(ours) == set(ref_sd), (
        f"missing={sorted(set(ref_sd) - set(ours))[:8]} "
        f"extra={sorted(set(ours) - set(ref_sd))[:8]}"
    )
    for k, v in ref_sd.items():
        assert tuple(ours[k].shape) == tuple(v.shape), (
            k, ours[k].shape, tuple(v.shape)
        )


def test_roundtrip_through_real_reference(ref_dit_module):
    """torch -> flax -> torch roundtrip loads back into the real module verbatim."""
    torch.manual_seed(0)
    ref_model = ref_dit_module.DiT(**MICRO_KWARGS)
    sd = ref_model.state_dict()
    params = torch_state_dict_to_params(sd)
    back = params_to_torch_state_dict(params)
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in back.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert set(missing) == {"pos_embed", "mask_token"}, missing
    for k, v in ref_model.state_dict().items():
        if k in ("pos_embed", "mask_token"):
            continue
        np.testing.assert_array_equal(v.numpy(), sd[k].numpy(), err_msg=k)
