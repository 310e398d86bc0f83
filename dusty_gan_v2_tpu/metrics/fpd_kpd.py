"""Frechet (FPD) and kernel (KPD) distances over PointNet features.

Behavioral equivalent of reference `gans/metrics/fpd_kpd.py:5-27` (numpy/scipy math,
unchanged — these run host-side on cached feature matrices).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg

__all__ = ["compute_frechet_distance", "compute_squared_mmd"]


def compute_frechet_distance(feats1: np.ndarray, feats2: np.ndarray) -> float:
    mu1, sigma1 = np.mean(feats1, axis=0), np.cov(feats1, rowvar=False)
    mu2, sigma2 = np.mean(feats2, axis=0), np.cov(feats2, rowvar=False)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape
    m = np.square(mu1 - mu2).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sigma1, sigma2), disp=False)
    return float(np.real(m + np.trace(sigma1 + sigma2 - s * 2)))


def compute_squared_mmd(
    feats1: np.ndarray, feats2: np.ndarray, num_subsets=100, max_subset_size=1000
) -> float:
    """Cubic-polynomial-kernel squared MMD (KID-style subset estimator)."""
    n = feats1.shape[1]
    m = min(min(feats1.shape[0], feats2.shape[0]), max_subset_size)
    t = 0.0
    for _ in range(num_subsets):
        x = feats2[np.random.choice(feats2.shape[0], m, replace=False)]
        y = feats1[np.random.choice(feats1.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.diag(a).sum()) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)
