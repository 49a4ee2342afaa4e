from .fid import FIDStats, frechet_distance, compute_fid_from_stats

__all__ = ["FIDStats", "frechet_distance", "compute_fid_from_stats"]
