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
    feature space). Runs the torch-cpu InceptionV3 port on host - FID evaluation is
    offline and not throughput-critical.

    ``weights_path``: local pt_inception weights file (pt_inception-2015-12-05).
    """
    import torch

    state = torch.load(weights_path, map_location="cpu", weights_only=True)
    raise NotImplementedError(
        "InceptionV3 graph construction requires torchvision (not in this image). "
        "Provide features via any local extractor and feed FIDStats directly; the "
        "Frechet math above is extractor-agnostic."
    )
