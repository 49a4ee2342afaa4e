"""FID evaluation: streaming activation statistics + Frechet distance.

The reference's headline benchmark is FID-30K on zero-shot COCO (README.md:56-61,
BASELINE.md). This module provides the TPU-side machinery:

  * FIDStats - streaming (mu, Sigma) accumulation over feature batches (no need to hold
    30k activations in memory)
  * frechet_distance - ||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) via scipy sqrtm
  * InceptionV3 feature extraction is pluggable: pass any feature_fn(images)->(B, D).
    The standard FID uses InceptionV3 pool3 (2048-d); weights must be provided locally
    (zero-egress environment) - see load_inception_feature_fn.

Typical flow (eval/generate_eval_images.py drives generation):
    stats_real = FIDStats.from_batches(feature_fn, real_batches)
    stats_fake = FIDStats.from_batches(feature_fn, fake_batches)
    fid = compute_fid_from_stats(stats_real, stats_fake)
"""

import dataclasses
from typing import Callable, Iterable, Optional

import numpy as np


@dataclasses.dataclass
class FIDStats:
    """Streaming mean/covariance accumulator for feature vectors."""

    dim: int
    n: int = 0
    sum: Optional[np.ndarray] = None
    outer_sum: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.sum is None:
            self.sum = np.zeros(self.dim, np.float64)
        if self.outer_sum is None:
            self.outer_sum = np.zeros((self.dim, self.dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        feats = np.asarray(feats, np.float64)
        assert feats.ndim == 2 and feats.shape[1] == self.dim
        self.n += feats.shape[0]
        self.sum += feats.sum(axis=0)
        self.outer_sum += feats.T @ feats

    @property
    def mean(self) -> np.ndarray:
        return self.sum / max(self.n, 1)

    @property
    def cov(self) -> np.ndarray:
        mu = self.mean
        return (self.outer_sum - self.n * np.outer(mu, mu)) / max(self.n - 1, 1)

    @classmethod
    def from_batches(
        cls, feature_fn: Callable, batches: Iterable[np.ndarray]
    ) -> "FIDStats":
        stats = None
        for batch in batches:
            feats = np.asarray(feature_fn(batch))
            if stats is None:
                stats = cls(dim=feats.shape[1])
            stats.update(feats)
        assert stats is not None, "no batches"
        return stats

    def save(self, path: str) -> None:
        np.savez(path, n=self.n, sum=self.sum, outer_sum=self.outer_sum)

    @classmethod
    def load(cls, path: str) -> "FIDStats":
        z = np.load(path)
        return cls(
            dim=int(z["sum"].shape[0]), n=int(z["n"]), sum=z["sum"],
            outer_sum=z["outer_sum"],
        )


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Standard FID Frechet distance (Heusel et al.)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_fid_from_stats(real: FIDStats, fake: FIDStats) -> float:
    return frechet_distance(real.mean, real.cov, fake.mean, fake.cov)


def load_inception_feature_fn(weights_path: str) -> Callable:
    """InceptionV3 pool3 feature extractor from local torch weights (the canonical FID
    feature space, pt_inception-2015-12-05). The graph is the TPU-native JAX port in
    eval/inception.py (torch-oracle-validated); runs jit'd on the default backend.

    Returns feature_fn(images (B,3,H,W) float [0,1]) -> (B, 2048) numpy.
    """
    from .inception import load_params, make_feature_fn

    return make_feature_fn(load_params(weights_path))


def iter_image_dir_batches(
    image_dir: str, batch_size: int = 32, limit: Optional[int] = None
):
    """Yield (B, 3, H, W) float32 [0,1] batches from a directory of images (the
    output of eval/generate_eval_images.py, or a real-image reference set). Images
    are center-cropped to square so batches stack; FID resizing to 299 happens
    inside the feature fn."""
    import os

    from PIL import Image

    names = sorted(
        f for f in os.listdir(image_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
    )
    if limit:
        names = names[:limit]
    buf = []
    for name in names:
        img = Image.open(os.path.join(image_dir, name))
        if img.mode != "RGB":
            img = img.convert("RGB")
        w, h = img.size
        s = min(w, h)
        img = img.crop(((w - s) // 2, (h - s) // 2,
                        (w - s) // 2 + s, (h - s) // 2 + s))
        if s != 299:
            img = img.resize((299, 299), Image.BILINEAR)
        buf.append(np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0)
        if len(buf) == batch_size:
            yield np.stack(buf)
            buf = []
    if buf:
        yield np.stack(buf)


def main(argv=None):
    """FID between two image directories (or a dir and precomputed .npz stats):

    python -m micro_diffusion_tpu.eval.fid --real <dir|stats.npz> --fake <dir> \
        --inception_weights pt_inception-2015-12-05.pth [--save_real_stats out.npz]
    """
    from ..utils.platform import apply_platform_override

    apply_platform_override()  # MDT_PLATFORM=cpu for offline dry runs

    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--real", required=True, help="image dir or FIDStats .npz")
    p.add_argument("--fake", required=True, help="image dir or FIDStats .npz")
    p.add_argument("--inception_weights", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--limit", type=int, default=None, help="cap image count (30k)")
    p.add_argument("--save_real_stats", default=None,
                   help="save the real-side stats for reuse across runs")
    args = p.parse_args(argv)

    feature_fn = load_inception_feature_fn(args.inception_weights)

    def stats_for(path: str) -> FIDStats:
        if path.endswith(".npz"):
            return FIDStats.load(path)
        return FIDStats.from_batches(
            feature_fn, iter_image_dir_batches(path, args.batch_size, args.limit)
        )

    real = stats_for(args.real)
    if args.save_real_stats:
        real.save(args.save_real_stats)
    fake = stats_for(args.fake)
    fid = compute_fid_from_stats(real, fake)
    import json

    print(json.dumps({"fid": round(fid, 4), "real_n": real.n, "fake_n": fake.n}))
    return fid


if __name__ == "__main__":
    main()
