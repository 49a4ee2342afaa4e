"""Torch checkpoint <-> JAX pytree interop for MicroDiT.

Converts the reference's released checkpoints (HF `VSehwag24/MicroDiT`, loadable in torch
via ``model.dit.load_state_dict(torch.load(path))``, reference README.md:71) and Composer
trainer checkpoints (nested ``state/model`` with ``dit.`` prefixes) into the flax param
tree produced by models/dit.py, and back.

Name mapping (torch -> flax path):
    blocks.3.*                -> blocks_3/*
    patch_mixer.2.*           -> patch_mixer_2/*
    t_embedder.mlp.0/.2       -> t_embedder/mlp_0, mlp_2
    adaLN_modulation.1        -> adaLN_modulation_1
    patch_mixer_map_xin.0/.1  -> patch_mixer_map_xin/norm, linear
    <linear>.weight           -> <linear>/kernel  (transposed)
    <layernorm>.weight        -> <norm>/weight    (as-is)
    x_embedder.proj.weight    -> x_embedder/proj/kernel  ((D,C,p,p) -> (p,p,C,D))
    mlp.w1 / mlp.w2 (MoE 3-D params)            (as-is, (e,d,f))

Buffers ``pos_embed`` and ``mask_token`` are deterministic constants in our DiT and are
skipped on load (with a value check for mask_token).
"""

from typing import Any, Dict

import numpy as np

try:  # torch is optional at runtime; only needed for .pt files
    import torch
except ImportError:  # pragma: no cover
    torch = None

SKIPPED_BUFFERS = ("pos_embed", "mask_token")


def _flax_path_tokens(torch_key: str) -> list[str]:
    """Map a torch parameter name to the flax param-tree path (without kernel/weight)."""
    parts = torch_key.split(".")
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        if p in ("blocks", "patch_mixer") and nxt is not None and nxt.isdigit():
            out.append(f"{p}_{nxt}")
            i += 2
        elif p in ("mlp", "adaLN_modulation") and nxt is not None and nxt.isdigit():
            # t_embedder.mlp.0 / adaLN_modulation.1 Sequential indices
            out.append(f"{p}_{nxt}")
            i += 2
        elif p.startswith("patch_mixer_map") and nxt is not None and nxt.isdigit():
            out.append(p)
            out.append("norm" if nxt == "0" else "linear")
            i += 2
        else:
            out.append(p)
            i += 1
    return out


def torch_state_dict_to_params(
    state_dict: Dict[str, Any], strict: bool = True
) -> Dict[str, Any]:
    """Convert a torch DiT state dict (numpy/torch tensors) to a flax params dict.

    Returns the inner ``params`` tree (wrap as {'params': tree} before apply).
    """
    tree: Dict[str, Any] = {}
    for key, value in state_dict.items():
        base = key.split(".")[0]
        if base in SKIPPED_BUFFERS or key in SKIPPED_BUFFERS:
            if "mask_token" in key:
                arr = _to_numpy(value)
                if np.any(arr != 0):
                    raise ValueError(
                        "checkpoint has a non-zero mask_token; our DiT folds it out as "
                        "a constant zero - conversion would change behavior"
                    )
            continue
        arr = _to_numpy(value)
        path = _flax_path_tokens(key)
        leaf_name = path[-1]
        if leaf_name == "weight":
            if arr.ndim == 4:  # conv (D, C, p, p) -> (p, p, C, D)
                path[-1] = "kernel"
                arr = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:  # linear (out, in) -> (in, out)
                path[-1] = "kernel"
                arr = arr.T
            # ndim == 1: LayerNorm weight, name stays "weight"
        elif leaf_name == "bias":
            pass
        elif arr.ndim == 3 and leaf_name in ("w1", "w2"):
            pass  # MoE expert tensors (e, d, f) - layout identical
        elif strict:
            raise ValueError(f"unrecognized checkpoint key: {key} (shape {arr.shape})")

        node = tree
        for tok in path[:-1]:
            node = node.setdefault(tok, {})
        node[path[-1]] = arr
    return tree


def params_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Convert a flax params tree back into a torch-layout state dict (numpy values)."""
    flat: Dict[str, np.ndarray] = {}

    def visit(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, path + [k])
            return
        arr = np.asarray(node)
        toks = list(path)
        leaf = toks[-1]
        # undo name/layout mapping
        if leaf == "kernel":
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            else:
                arr = arr.T
            toks[-1] = "weight"
        torch_toks = []
        for tok in toks:
            if tok.startswith("blocks_") and tok[7:].isdigit():
                torch_toks += ["blocks", tok[7:]]
            elif tok.startswith("patch_mixer_") and tok[12:].isdigit():
                torch_toks += ["patch_mixer", tok[12:]]
            elif tok.startswith("mlp_") and tok[4:].isdigit():
                torch_toks += ["mlp", tok[4:]]
            elif tok.startswith("adaLN_modulation_"):
                torch_toks += ["adaLN_modulation", tok.split("_")[-1]]
            elif tok == "norm" and toks[0].startswith("patch_mixer_map"):
                torch_toks += ["0"]
            elif tok == "linear" and toks[0].startswith("patch_mixer_map"):
                torch_toks += ["1"]
            else:
                torch_toks.append(tok)
        flat[".".join(torch_toks)] = arr

    visit(params.get("params", params), [])
    return flat


def _to_numpy(value: Any) -> np.ndarray:
    if torch is not None and isinstance(value, torch.Tensor):
        return value.detach().to(torch.float32).cpu().numpy()
    return np.asarray(value, dtype=np.float32)


def _strip_prefixes(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Strip Composer-style prefixes: 'state/model' nesting + 'model.'/'dit.' prefixes."""
    sd = state_dict
    if "state" in sd and isinstance(sd["state"], dict):
        sd = sd["state"].get("model", sd["state"])
    out = {}
    for k, v in sd.items():
        for prefix in ("model.dit.", "module.dit.", "dit."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        out[k] = v
    return out


def load_torch_checkpoint(path: str, strict: bool = True) -> Dict[str, Any]:
    """Load a reference .pt checkpoint file (plain dit state dict or Composer trainer
    state) into a flax params dict."""
    if torch is None:
        raise ImportError("torch is required to read .pt checkpoints")
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(sd, dict):
        raise ValueError(f"unexpected checkpoint object: {type(sd)}")
    sd = _strip_prefixes(sd)
    return {"params": torch_state_dict_to_params(sd, strict=strict)}


def load_any_checkpoint(path: str, strict: bool = True) -> Dict[str, Any]:
    """Load DiT params from either a torch .pt file (reference checkpoints) or an orbax
    checkpoint directory written by our Trainer (extracts the 'params' entry; prefers
    'ema_params' when present, matching how eval should use EMA weights)."""
    import os

    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(path))
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints under {path}")
        restored = mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore())
        )
        state = restored["state"]
        params = state.get("ema_params") or state["params"]
        return params
    return load_torch_checkpoint(path, strict=strict)


def validate_params_match(converted: Dict[str, Any], reference: Dict[str, Any]) -> None:
    """Assert two param trees have identical structure and shapes (for load checks)."""
    import jax

    c_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    r_flat = dict(jax.tree_util.tree_flatten_with_path(reference)[0])
    c_keys, r_keys = set(map(str, c_flat)), set(map(str, r_flat))
    if c_keys != r_keys:
        missing = sorted(r_keys - c_keys)[:10]
        extra = sorted(c_keys - r_keys)[:10]
        raise ValueError(f"param tree mismatch; missing={missing} extra={extra}")
    for k, v in c_flat.items():
        rv = r_flat[k]
        if tuple(v.shape) != tuple(rv.shape):
            raise ValueError(f"shape mismatch at {k}: {v.shape} vs {rv.shape}")
