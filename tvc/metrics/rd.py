"""Rate-distortion Pareto envelope via convex hull.

Transcribes the selection logic of `process_data_and_save`
(function.py:148-230), including its distinct vertex-walk rules for PSNR
(maximize), LPIPS (minimize) and FVD (minimize, with endpoint insertion).
scipy.spatial.ConvexHull vertices are in counterclockwise order, which these
walks rely on.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import numpy as np
import scipy.spatial as spt


def psnr_envelope(bpps: Sequence[float], psnr_means: Sequence[float]) -> np.ndarray:
    """(2, K) array [bpp; psnr] on the upper-left hull edge (function.py:165-179)."""
    points = np.stack([np.asarray(bpps), np.asarray(psnr_means)]).transpose(1, 0)
    hull = spt.ConvexHull(points=points)
    leftmost = int(np.argmin(points[hull.vertices, 0]))
    highest = int(np.argmax(points[hull.vertices, 1]))
    if highest > leftmost + 1:
        sel = list(range(highest + 1, len(hull.vertices)))
    else:
        sel = list(range(highest, leftmost + 1))
    pts = points[hull.vertices[sel]]
    return np.vstack((pts[:, 0], pts[:, 1]))


def lpips_envelope(bpps: Sequence[float], lpips_means: Sequence[float]) -> np.ndarray:
    """Lower-left hull edge for a minimized metric (function.py:182-197)."""
    points = np.stack([np.asarray(bpps), np.asarray(lpips_means)]).transpose(1, 0)
    hull = spt.ConvexHull(points=points)
    lowest = int(np.argmin(points[hull.vertices, 1]))
    leftest = int(np.argmin(points[hull.vertices, 0]))
    if leftest >= lowest + 1:
        sel = list(range(leftest + 1, len(hull.vertices)))
    else:
        sel = list(range(leftest, lowest + 1))
    pts = points[hull.vertices[sel]]
    return np.vstack((pts[:, 0], pts[:, 1]))


def fvd_envelope(bpps: Sequence[float], fvds: Sequence[float]) -> np.ndarray:
    """FVD variant with endpoint insertion (function.py:199-220)."""
    points = np.stack([np.asarray(bpps), np.asarray(fvds)]).transpose(1, 0)
    hull = spt.ConvexHull(points=points)
    lowest = int(np.argmin(points[hull.vertices, 1]))
    leftest = int(np.argmin(points[hull.vertices, 0]))
    if leftest > lowest + 1:
        sel = list(range(leftest + 1, len(hull.vertices)))
        sel.insert(0, leftest)
        sel.append(lowest)
    else:
        sel = list(range(leftest, lowest + 1))
    pts = points[hull.vertices[sel]]
    return np.vstack((pts[:, 0], pts[:, 1]))


def process_data_and_save(
    databatchidx: int,
    bpps: Sequence[float],
    psnr_lists: Sequence[Sequence[float]],
    lpips_lists: Sequence[Sequence[float]],
    fvds: Sequence[float],
    save_path: str,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-video RD persistence (function.py:148-230): mean the per-frame
    metric lists, hull-select, save `{psnr,lpips,fvd}_{idx}.npy`."""
    psnr_means = np.mean(np.asarray(psnr_lists), axis=1)
    lpips_means = np.mean(np.asarray(lpips_lists), axis=1)
    psnr_arr = psnr_envelope(bpps, psnr_means)
    lpips_arr = lpips_envelope(bpps, lpips_means)
    fvd_arr = fvd_envelope(bpps, fvds)
    os.makedirs(save_path, exist_ok=True)
    np.save(os.path.join(save_path, f"psnr_{databatchidx}.npy"), psnr_arr)
    np.save(os.path.join(save_path, f"lpips_{databatchidx}.npy"), lpips_arr)
    np.save(os.path.join(save_path, f"fvd_{databatchidx}.npy"), fvd_arr)
    return psnr_arr, lpips_arr, fvd_arr
