"""InceptionV3-pool3 port tests: JAX graph vs an independent torch oracle on synthetic
weights (VERDICT.md next-round #4).

The oracle builds the FID-variant graph in torch (count_include_pad=False avg pools,
max pool in Mixed_7c's pool branch) with the exact pt_inception state-dict naming, so
``synthetic_params`` load via plain load_state_dict. Parity here pins the load-bearing
semantics: conv padding, BN eps folding, pool divisors, branch concat order.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from micro_diffusion_tpu.eval.inception import (
    FEATURE_DIM,
    load_params,
    make_feature_fn,
    parameter_shapes,
    pool3_features,
    synthetic_params,
)


class _Conv(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class _A(nn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.branch1x1 = _Conv(cin, 64, kernel_size=1)
        self.branch5x5_1 = _Conv(cin, 48, kernel_size=1)
        self.branch5x5_2 = _Conv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _Conv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _Conv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _Conv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _Conv(cin, pool, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x)),
        ], 1)


class _B(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = _Conv(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _Conv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = _Conv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _Conv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class _C(nn.Module):
    def __init__(self, c7):
        super().__init__()
        self.branch1x1 = _Conv(768, 192, kernel_size=1)
        self.branch7x7_1 = _Conv(768, c7, kernel_size=1)
        self.branch7x7_2 = _Conv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _Conv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _Conv(768, c7, kernel_size=1)
        self.branch7x7dbl_2 = _Conv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _Conv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _Conv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _Conv(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _Conv(768, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_3(self.branch7x7dbl_2(bd))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(bd))
        return torch.cat(
            [self.branch1x1(x), b7, bd, self.branch_pool(_avg(x))], 1
        )


class _D(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch3x3_1 = _Conv(768, 192, kernel_size=1)
        self.branch3x3_2 = _Conv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _Conv(768, 192, kernel_size=1)
        self.branch7x7x3_2 = _Conv(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _Conv(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _Conv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)), b7, F.max_pool2d(x, 3, stride=2)
        ], 1)


class _E(nn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = _Conv(cin, 320, kernel_size=1)
        self.branch3x3_1 = _Conv(cin, 384, kernel_size=1)
        self.branch3x3_2a = _Conv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _Conv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _Conv(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = _Conv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _Conv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _Conv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _Conv(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = (_avg(x) if self.pool == "avg"
              else F.max_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class _TorchInceptionPool3(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _Conv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _Conv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _Conv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _Conv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _Conv(80, 192, kernel_size=3)
        self.Mixed_5b = _A(192, 32)
        self.Mixed_5c = _A(256, 64)
        self.Mixed_5d = _A(288, 64)
        self.Mixed_6a = _B(288)
        self.Mixed_6b = _C(128)
        self.Mixed_6c = _C(160)
        self.Mixed_6d = _C(160)
        self.Mixed_6e = _C(192)
        self.Mixed_7a = _D()
        self.Mixed_7b = _E(1280, "avg")
        self.Mixed_7c = _E(2048, "max")

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for n in ("5b", "5c", "5d", "6a", "6b", "6c", "6d", "6e", "7a", "7b", "7c"):
            x = getattr(self, f"Mixed_{n}")(x)
        return x.mean(dim=(2, 3))


@pytest.fixture(scope="module")
def oracle_and_params():
    params = synthetic_params(seed=0)
    model = _TorchInceptionPool3().eval()
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in params.items()}, strict=False
    )
    # only num_batches_tracked BN bookkeeping may be missing
    assert not unexpected, unexpected[:5]
    assert all(m.endswith("num_batches_tracked") for m in missing), missing[:5]
    return model, params


def test_parameter_table_is_complete(oracle_and_params):
    model, params = oracle_and_params
    torch_keys = {
        k for k in model.state_dict() if not k.endswith("num_batches_tracked")
    }
    assert torch_keys == set(parameter_shapes())


def test_pool3_matches_torch_oracle(oracle_and_params):
    model, params = oracle_and_params
    rng = np.random.default_rng(1)
    # 75x75 exercises every block (incl. 1x1 feature maps in Mixed_7x) cheaply
    x = rng.uniform(-1, 1, (2, 3, 75, 75)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    import jax

    got = np.asarray(jax.jit(pool3_features)(
        {k: np.asarray(v) for k, v in params.items()}, x
    ))
    assert got.shape == (2, FEATURE_DIM)
    # normalized comparison: ReLU produces exact zeros, so elementwise rtol is
    # ill-posed; bound the max abs error relative to the activation scale
    scale = np.abs(ref).max()
    assert scale > 0
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)


def test_feature_fn_resize_and_range(oracle_and_params):
    _, params = oracle_and_params
    fn = make_feature_fn(params)
    imgs = np.random.default_rng(2).uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    feats = fn(imgs)
    assert feats.shape == (2, FEATURE_DIM)
    assert np.isfinite(feats).all()


def test_load_params_roundtrip(tmp_path, oracle_and_params):
    model, params = oracle_and_params
    path = tmp_path / "pt_inception.pth"
    torch.save(model.state_dict(), path)
    loaded = load_params(str(path))
    assert set(loaded) == set(parameter_shapes())
    np.testing.assert_array_equal(
        loaded["Mixed_7c.branch_pool.conv.weight"],
        params["Mixed_7c.branch_pool.conv.weight"],
    )


def test_load_params_rejects_wrong_shapes(tmp_path):
    sd = {k: torch.zeros(s) for k, s in parameter_shapes().items()}
    sd["Conv2d_1a_3x3.conv.weight"] = torch.zeros(1, 1, 1, 1)
    path = tmp_path / "bad.pth"
    torch.save(sd, path)
    with pytest.raises(ValueError, match="shape"):
        load_params(str(path))
