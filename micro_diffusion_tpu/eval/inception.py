"""InceptionV3 pool3 feature extractor in pure functional JAX (for FID).

The reference computes its headline FID-30K with the canonical pt_inception
weights (pt_inception-2015-12-05, the TF-ported network used by pytorch-fid;
reference README.md:56-61). This is a TPU-native port of that exact graph:

  * torch state-dict naming is the parameter addressing scheme (Conv2d_1a_3x3.conv
    .weight, Mixed_5b.branch1x1.bn.running_mean, ...) - no conversion step, the
    loaded dict IS the param tree;
  * the FID variants of the blocks are reproduced: InceptionA/C/E use
    ``avg_pool(count_include_pad=False)`` and Mixed_7c (FIDInceptionE_2) uses a
    MAX pool in its pool branch;
  * input convention matches pytorch-fid: float images in [0, 1], NCHW, bilinear
    resize to 299x299 WITHOUT antialiasing, then scaled to [-1, 1];
  * all compute is jit'd; BN eps = 1e-3 folded at load time.

Numerics are validated against a torch oracle on synthetic weights
(tests/test_inception.py), making the padding/pooling semantics load-bearing.
"""

import functools
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3
FEATURE_DIM = 2048
INPUT_SIZE = 299


# ------------------------------------------------------------------ ops (NCHW)


def _conv(x, w, stride=1, padding=((0, 0), (0, 0))):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _conv_bn(params, name, x, stride=1, padding=((0, 0), (0, 0))):
    """BasicConv2d: conv(no bias) -> BN(eps 1e-3) -> relu."""
    x = _conv(x, params[f"{name}.conv.weight"], stride, padding)
    scale = params[f"{name}.bn.weight"] * jax.lax.rsqrt(
        params[f"{name}.bn.running_var"] + BN_EPS
    )
    bias = params[f"{name}.bn.bias"] - params[f"{name}.bn.running_mean"] * scale
    return jax.nn.relu(x * scale[None, :, None, None] + bias[None, :, None, None])


def _max_pool(x, window=3, stride=2, padding=0):
    pads = ((0, 0), (0, 0), (padding, padding), (padding, padding))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, window, window), (1, 1, stride, stride),
        pads,
    )


def _avg_pool_no_pad_count(x, window=3, stride=1, padding=1):
    """avg_pool2d(count_include_pad=False): divide by the number of VALID (non-pad)
    elements under each window - the FID-variant blocks' pool."""
    pads = ((0, 0), (0, 0), (padding, padding), (padding, padding))
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, window, window), (1, 1, stride, stride), pads
    )
    ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 1, window, window), (1, 1, stride, stride), pads
    )
    return sums / counts


# ------------------------------------------------------------------ blocks

_P0 = ((0, 0), (0, 0))
_P1 = ((1, 1), (1, 1))
_P2 = ((2, 2), (2, 2))
_P_1x7 = ((0, 0), (3, 3))  # kernel (1,7): pad W by 3
_P_7x1 = ((3, 3), (0, 0))  # kernel (7,1): pad H by 3
_P_1x3 = ((0, 0), (1, 1))
_P_3x1 = ((1, 1), (0, 0))


def _inception_a(p, n, x):
    b1 = _conv_bn(p, f"{n}.branch1x1", x)
    b5 = _conv_bn(p, f"{n}.branch5x5_1", x)
    b5 = _conv_bn(p, f"{n}.branch5x5_2", b5, padding=_P2)
    b3 = _conv_bn(p, f"{n}.branch3x3dbl_1", x)
    b3 = _conv_bn(p, f"{n}.branch3x3dbl_2", b3, padding=_P1)
    b3 = _conv_bn(p, f"{n}.branch3x3dbl_3", b3, padding=_P1)
    bp = _avg_pool_no_pad_count(x)
    bp = _conv_bn(p, f"{n}.branch_pool", bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(p, n, x):
    b3 = _conv_bn(p, f"{n}.branch3x3", x, stride=2)
    bd = _conv_bn(p, f"{n}.branch3x3dbl_1", x)
    bd = _conv_bn(p, f"{n}.branch3x3dbl_2", bd, padding=_P1)
    bd = _conv_bn(p, f"{n}.branch3x3dbl_3", bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c(p, n, x):
    b1 = _conv_bn(p, f"{n}.branch1x1", x)
    b7 = _conv_bn(p, f"{n}.branch7x7_1", x)
    b7 = _conv_bn(p, f"{n}.branch7x7_2", b7, padding=_P_1x7)
    b7 = _conv_bn(p, f"{n}.branch7x7_3", b7, padding=_P_7x1)
    bd = _conv_bn(p, f"{n}.branch7x7dbl_1", x)
    bd = _conv_bn(p, f"{n}.branch7x7dbl_2", bd, padding=_P_7x1)
    bd = _conv_bn(p, f"{n}.branch7x7dbl_3", bd, padding=_P_1x7)
    bd = _conv_bn(p, f"{n}.branch7x7dbl_4", bd, padding=_P_7x1)
    bd = _conv_bn(p, f"{n}.branch7x7dbl_5", bd, padding=_P_1x7)
    bp = _avg_pool_no_pad_count(x)
    bp = _conv_bn(p, f"{n}.branch_pool", bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(p, n, x):
    b3 = _conv_bn(p, f"{n}.branch3x3_1", x)
    b3 = _conv_bn(p, f"{n}.branch3x3_2", b3, stride=2)
    b7 = _conv_bn(p, f"{n}.branch7x7x3_1", x)
    b7 = _conv_bn(p, f"{n}.branch7x7x3_2", b7, padding=_P_1x7)
    b7 = _conv_bn(p, f"{n}.branch7x7x3_3", b7, padding=_P_7x1)
    b7 = _conv_bn(p, f"{n}.branch7x7x3_4", b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e(p, n, x, pool: str):
    b1 = _conv_bn(p, f"{n}.branch1x1", x)
    b3 = _conv_bn(p, f"{n}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _conv_bn(p, f"{n}.branch3x3_2a", b3, padding=_P_1x3),
        _conv_bn(p, f"{n}.branch3x3_2b", b3, padding=_P_3x1),
    ], axis=1)
    bd = _conv_bn(p, f"{n}.branch3x3dbl_1", x)
    bd = _conv_bn(p, f"{n}.branch3x3dbl_2", bd, padding=_P1)
    bd = jnp.concatenate([
        _conv_bn(p, f"{n}.branch3x3dbl_3a", bd, padding=_P_1x3),
        _conv_bn(p, f"{n}.branch3x3dbl_3b", bd, padding=_P_3x1),
    ], axis=1)
    if pool == "avg":  # FIDInceptionE_1 (Mixed_7b)
        bp = _avg_pool_no_pad_count(x)
    else:  # FIDInceptionE_2 (Mixed_7c): max pool - pytorch-fid's TF-parity patch
        bp = _max_pool(x, window=3, stride=1, padding=1)
    bp = _conv_bn(p, f"{n}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


def pool3_features(params: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """(B, 3, 299, 299) in [-1, 1] -> (B, 2048) pool3 activations."""
    p = params
    x = _conv_bn(p, "Conv2d_1a_3x3", x, stride=2)
    x = _conv_bn(p, "Conv2d_2a_3x3", x)
    x = _conv_bn(p, "Conv2d_2b_3x3", x, padding=_P1)
    x = _max_pool(x)
    x = _conv_bn(p, "Conv2d_3b_1x1", x)
    x = _conv_bn(p, "Conv2d_4a_3x3", x)
    x = _max_pool(x)
    x = _inception_a(p, "Mixed_5b", x)
    x = _inception_a(p, "Mixed_5c", x)
    x = _inception_a(p, "Mixed_5d", x)
    x = _inception_b(p, "Mixed_6a", x)
    x = _inception_c(p, "Mixed_6b", x)
    x = _inception_c(p, "Mixed_6c", x)
    x = _inception_c(p, "Mixed_6d", x)
    x = _inception_c(p, "Mixed_6e", x)
    x = _inception_d(p, "Mixed_7a", x)
    x = _inception_e(p, "Mixed_7b", x, pool="avg")
    x = _inception_e(p, "Mixed_7c", x, pool="max")
    return jnp.mean(x, axis=(2, 3))  # adaptive avg pool to 1x1


# ----------------------------------------------------- parameter table / loading


def _basic(name: str, cin: int, cout: int, kh: int, kw: int) -> List[Tuple[str, tuple]]:
    return [
        (f"{name}.conv.weight", (cout, cin, kh, kw)),
        (f"{name}.bn.weight", (cout,)),
        (f"{name}.bn.bias", (cout,)),
        (f"{name}.bn.running_mean", (cout,)),
        (f"{name}.bn.running_var", (cout,)),
    ]


def parameter_shapes() -> Dict[str, tuple]:
    """The full pt_inception parameter table (name -> shape); the architecture spec
    in data form, also used to synthesize test weights."""
    t: List[Tuple[str, tuple]] = []
    t += _basic("Conv2d_1a_3x3", 3, 32, 3, 3)
    t += _basic("Conv2d_2a_3x3", 32, 32, 3, 3)
    t += _basic("Conv2d_2b_3x3", 32, 64, 3, 3)
    t += _basic("Conv2d_3b_1x1", 64, 80, 1, 1)
    t += _basic("Conv2d_4a_3x3", 80, 192, 3, 3)

    def block_a(n, cin, pool):
        t.extend(_basic(f"{n}.branch1x1", cin, 64, 1, 1))
        t.extend(_basic(f"{n}.branch5x5_1", cin, 48, 1, 1))
        t.extend(_basic(f"{n}.branch5x5_2", 48, 64, 5, 5))
        t.extend(_basic(f"{n}.branch3x3dbl_1", cin, 64, 1, 1))
        t.extend(_basic(f"{n}.branch3x3dbl_2", 64, 96, 3, 3))
        t.extend(_basic(f"{n}.branch3x3dbl_3", 96, 96, 3, 3))
        t.extend(_basic(f"{n}.branch_pool", cin, pool, 1, 1))

    block_a("Mixed_5b", 192, 32)
    block_a("Mixed_5c", 256, 64)
    block_a("Mixed_5d", 288, 64)

    t += _basic("Mixed_6a.branch3x3", 288, 384, 3, 3)
    t += _basic("Mixed_6a.branch3x3dbl_1", 288, 64, 1, 1)
    t += _basic("Mixed_6a.branch3x3dbl_2", 64, 96, 3, 3)
    t += _basic("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)

    def block_c(n, c7):
        t.extend(_basic(f"{n}.branch1x1", 768, 192, 1, 1))
        t.extend(_basic(f"{n}.branch7x7_1", 768, c7, 1, 1))
        t.extend(_basic(f"{n}.branch7x7_2", c7, c7, 1, 7))
        t.extend(_basic(f"{n}.branch7x7_3", c7, 192, 7, 1))
        t.extend(_basic(f"{n}.branch7x7dbl_1", 768, c7, 1, 1))
        t.extend(_basic(f"{n}.branch7x7dbl_2", c7, c7, 7, 1))
        t.extend(_basic(f"{n}.branch7x7dbl_3", c7, c7, 1, 7))
        t.extend(_basic(f"{n}.branch7x7dbl_4", c7, c7, 7, 1))
        t.extend(_basic(f"{n}.branch7x7dbl_5", c7, 192, 1, 7))
        t.extend(_basic(f"{n}.branch_pool", 768, 192, 1, 1))

    block_c("Mixed_6b", 128)
    block_c("Mixed_6c", 160)
    block_c("Mixed_6d", 160)
    block_c("Mixed_6e", 192)

    t += _basic("Mixed_7a.branch3x3_1", 768, 192, 1, 1)
    t += _basic("Mixed_7a.branch3x3_2", 192, 320, 3, 3)
    t += _basic("Mixed_7a.branch7x7x3_1", 768, 192, 1, 1)
    t += _basic("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    t += _basic("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    t += _basic("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)

    def block_e(n, cin):
        t.extend(_basic(f"{n}.branch1x1", cin, 320, 1, 1))
        t.extend(_basic(f"{n}.branch3x3_1", cin, 384, 1, 1))
        t.extend(_basic(f"{n}.branch3x3_2a", 384, 384, 1, 3))
        t.extend(_basic(f"{n}.branch3x3_2b", 384, 384, 3, 1))
        t.extend(_basic(f"{n}.branch3x3dbl_1", cin, 448, 1, 1))
        t.extend(_basic(f"{n}.branch3x3dbl_2", 448, 384, 3, 3))
        t.extend(_basic(f"{n}.branch3x3dbl_3a", 384, 384, 1, 3))
        t.extend(_basic(f"{n}.branch3x3dbl_3b", 384, 384, 3, 1))
        t.extend(_basic(f"{n}.branch_pool", cin, 192, 1, 1))

    block_e("Mixed_7b", 1280)
    block_e("Mixed_7c", 2048)
    return dict(t)


def synthetic_params(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random weights with the exact pt_inception shapes (for tests). Conv weights are
    fan-in scaled so activations stay O(1) through all 17 stages."""
    rng = np.random.default_rng(seed)
    out = {}
    for name, shape in parameter_shapes().items():
        if name.endswith("running_var") or name.endswith("bn.weight"):
            out[name] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        elif name.endswith("conv.weight"):
            fan_in = int(np.prod(shape[1:]))
            out[name] = (rng.standard_normal(shape) / np.sqrt(fan_in)).astype(
                np.float32
            )
        else:
            out[name] = (rng.standard_normal(shape) * 0.1).astype(np.float32)
    return out


def load_params(weights_path: str) -> Dict[str, np.ndarray]:
    """Load the pt_inception-2015-12-05 torch checkpoint from a local path. Ignores
    the aux-logits/fc heads (FID uses pool3 only); validates the pool3 subgraph's
    key set and shapes."""
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):  # torchvision-style wrapper
        sd = sd.state_dict()
    expected = parameter_shapes()
    out = {}
    missing = []
    for name, shape in expected.items():
        if name not in sd:
            missing.append(name)
            continue
        arr = np.asarray(sd[name].detach().to(torch.float32).numpy())
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(f"{name}: shape {arr.shape} != expected {shape}")
        out[name] = arr
    if missing:
        raise ValueError(f"weights missing pool3 keys, e.g. {missing[:5]}")
    return out


def make_feature_fn(
    params: Dict[str, np.ndarray], resize: bool = True, batch_fixed: bool = False
) -> Callable[[np.ndarray], np.ndarray]:
    """Build feature_fn(images) -> (B, 2048) for eval.fid.FIDStats.

    ``images``: float array (B, 3, H, W) in [0, 1] (pytorch-fid input convention);
    resized to 299 bilinear (no antialias, matching F.interpolate) and scaled to
    [-1, 1] inside the jit'd graph.
    """
    jparams = {k: jnp.asarray(v) for k, v in params.items()}

    @jax.jit
    def fn(x):
        x = jnp.asarray(x, jnp.float32)
        if resize and x.shape[2:] != (INPUT_SIZE, INPUT_SIZE):
            x = jax.image.resize(
                x, x.shape[:2] + (INPUT_SIZE, INPUT_SIZE), "bilinear",
                antialias=False,
            )
        x = 2.0 * x - 1.0
        return pool3_features(jparams, x)

    return lambda images: np.asarray(fn(np.asarray(images)))
