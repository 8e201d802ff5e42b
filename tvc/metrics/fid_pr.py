"""FID + improved precision/recall over feature sets.

Replicates the capability of `evaluation/{fid_PR.py,pr.py}` (MCVD leftovers,
not on the sender path): the stabilized Fréchet distance with epsilon repair
(fid_PR.py:53-107) and k-NN manifold precision/recall (pr.py:10-54). Feature
extraction is pluggable — the reference uses InceptionV3 pool3 activations;
tvc accepts any (N, D) feature arrays (e.g. from tvc.models.i3d or a converted
inception network), keeping the metric math framework-native.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
from scipy import linalg


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Stable FID (fid_PR.py:53-107)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(f"Imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_features(feats1: np.ndarray, feats2: np.ndarray) -> float:
    mu1, s1 = feats1.mean(0), np.cov(feats1, rowvar=False)
    mu2, s2 = feats2.mean(0), np.cov(feats2, rowvar=False)
    return calculate_frechet_distance(mu1, s1, mu2, s2)


def _cdist(a: np.ndarray, b: np.ndarray, batch: int = 10000) -> np.ndarray:
    out = []
    for i in range(0, len(b), batch):
        bb = b[i : i + batch]
        d2 = (np.sum(a * a, 1)[:, None] + np.sum(bb * bb, 1)[None, :]
              - 2.0 * a @ bb.T)
        out.append(np.sqrt(np.maximum(d2, 0.0)))
    return np.concatenate(out, axis=1)


def calculate_precision_recall(
    feat_r: np.ndarray, feat_g: np.ndarray, k: int = 3, batch_size: int = 10000
) -> Tuple[float, float]:
    """k-NN manifold precision/recall (pr.py:44-54): a generated sample is
    precise if it lands within the k-NN radius of any real sample, and vice
    versa for recall."""
    feat_r = np.asarray(feat_r, np.float64)
    feat_g = np.asarray(feat_g, np.float64)
    d_rr = _cdist(feat_r, feat_r, batch_size)
    nnk_r = np.sort(d_rr, axis=1)[:, k]  # k+1-th smallest incl. self (kthvalue(k+1))
    d_gg = _cdist(feat_g, feat_g, batch_size)
    nnk_g = np.sort(d_gg, axis=1)[:, k]
    d_gr = _cdist(feat_g, feat_r, batch_size)
    precision = float(np.mean(np.any(d_gr <= nnk_r[None, :], axis=1)))
    recall = float(np.mean(np.any(d_gr.T <= nnk_g[None, :], axis=1)))
    return precision, recall


def get_fid_pr(
    feats_real: np.ndarray, feats_fake: np.ndarray, k: int = 3
) -> Tuple[float, float, float]:
    """fid_PR.py:282-300 over precomputed features: (fid, precision, recall)."""
    fid = fid_from_features(feats_real, feats_fake)
    precision, recall = calculate_precision_recall(feats_real, feats_fake, k=k)
    return fid, precision, recall


def nearest_neighbor_indices(
    feat_samples: np.ndarray,
    feat_data: np.ndarray,
    k: int = 9,
    feat_samples_flipped: Optional[np.ndarray] = None,
    batch_size: int = 10000,
) -> np.ndarray:
    """Top-k nearest dataset indices per sample in Inception-feature space
    (evaluation/nearest_neighbor.py:70-113).

    Matches the reference's flip trick: when features of horizontally
    flipped samples are supplied, the per-dataset-image distance is the min
    over the original and flipped queries. Returns (n_samples, k) int
    indices into feat_data, nearest first."""
    d = _cdist(feat_samples, feat_data, batch_size)
    if feat_samples_flipped is not None:
        d = np.minimum(d, _cdist(feat_samples_flipped, feat_data, batch_size))
    return np.argsort(d, axis=1)[:, :k]


def save_nearest_neighbor_grid(
    samples: np.ndarray,
    data: np.ndarray,
    indices: np.ndarray,
    out_png: str,
) -> None:
    """(n, H, W, C) samples + dataset + (n, k) indices -> grid PNG, one row
    per sample: [sample | k nearest dataset images]
    (nearest_neighbor.py:105-113 `save_image(nrow=k+1)`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n, k = indices.shape
    rows = [np.concatenate([samples[i]] + [data[j] for j in indices[i]], axis=1)
            for i in range(n)]
    grid = np.concatenate(rows, axis=0)
    if grid.shape[-1] == 1:
        grid = np.repeat(grid, 3, axis=-1)
    plt.imsave(out_png, np.clip(grid, 0.0, 1.0))
