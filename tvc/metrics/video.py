"""Per-frame / clip-prefix video metric wrappers.

Replicates the `fvd_utils/calculate_{fvd,psnr,ssim,lpips}.py` API surface:
each takes batched videos and returns a dict of per-clip-prefix (or per-frame)
values plus an optional 'final' entry. Videos here are (B, T, H, W, C) in
[0,1]; grayscale inputs are expanded to 3 channels like the reference `trans`.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tvc.metrics.fvd import FVDMetric, _to_rgb
from tvc.metrics.lpips import LPIPSMetric
from tvc.metrics.pixel import psnr as _psnr, ssim as _ssim


def calculate_psnr(videos1: np.ndarray, videos2: np.ndarray,
                   calculate_per_frame: int = 1, calculate_final: bool = True) -> Dict:
    """Per-frame PSNR averaged over the batch (fvd_utils/calculate_psnr.py)."""
    assert videos1.shape == videos2.shape
    b, t = videos1.shape[:2]
    per = {}
    vals = [
        float(np.mean([_psnr(videos1[i, j], videos2[i, j]) for i in range(b)]))
        for j in range(t)
    ]
    for clip in range(calculate_per_frame, t + 1, calculate_per_frame):
        per[f"[:{clip}]"] = float(np.mean(vals[:clip]))
    out = {"psnr": per, "psnr_per_frame": calculate_per_frame,
           "psnr_video_setting": videos1.shape}
    if calculate_final:
        out["psnr"]["final"] = float(np.mean(vals))
    out["psnr_per_frame_values"] = vals
    return out


def calculate_ssim(videos1: np.ndarray, videos2: np.ndarray,
                   calculate_per_frame: int = 1, calculate_final: bool = True) -> Dict:
    assert videos1.shape == videos2.shape
    b, t = videos1.shape[:2]
    vals = [
        float(np.mean([
            _ssim(videos1[i, j].transpose(2, 0, 1), videos2[i, j].transpose(2, 0, 1))
            for i in range(b)
        ]))
        for j in range(t)
    ]
    per = {}
    for clip in range(calculate_per_frame, t + 1, calculate_per_frame):
        per[f"[:{clip}]"] = float(np.mean(vals[:clip]))
    out = {"ssim": per, "ssim_per_frame": calculate_per_frame,
           "ssim_video_setting": videos1.shape}
    if calculate_final:
        out["ssim"]["final"] = float(np.mean(vals))
    out["ssim_per_frame_values"] = vals
    return out


def calculate_lpips(videos1: np.ndarray, videos2: np.ndarray,
                    metric: Optional[LPIPSMetric] = None,
                    calculate_per_frame: int = 1, calculate_final: bool = True) -> Dict:
    """Per-frame LPIPS on [-1,1]-rescaled frames (calculate_lpips.py trans)."""
    assert videos1.shape == videos2.shape
    metric = metric or LPIPSMetric.create()
    v1 = _to_rgb(np.asarray(videos1)) * 2 - 1
    v2 = _to_rgb(np.asarray(videos2)) * 2 - 1
    b, t = v1.shape[:2]
    vals = [
        float(np.mean(np.asarray(metric(v1[:, j], v2[:, j])))) for j in range(t)
    ]
    per = {}
    for clip in range(calculate_per_frame, t + 1, calculate_per_frame):
        per[f"[:{clip}]"] = float(np.mean(vals[:clip]))
    out = {"lpips": per, "lpips_per_frame": calculate_per_frame,
           "lpips_video_setting": videos1.shape}
    if calculate_final:
        out["lpips"]["final"] = float(np.mean(vals))
    out["lpips_per_frame_values"] = vals
    return out


def calculate_fvd(videos1: np.ndarray, videos2: np.ndarray,
                  metric: Optional[FVDMetric] = None,
                  calculate_per_frame: int = 10, calculate_final: bool = True) -> Dict:
    """Clip-prefix FVD, prefixes >= 10 frames (fvd_utils/calculate_fvd.py:16-66)."""
    assert videos1.shape == videos2.shape
    metric = metric or FVDMetric()
    v1 = _to_rgb(np.asarray(videos1))
    v2 = _to_rgb(np.asarray(videos2))
    t = v1.shape[1]
    per = {}
    for clip in range(calculate_per_frame, t + 1, calculate_per_frame):
        if clip < 10:  # I3D needs >= 10 frames
            continue
        per[f"[:{clip}]"] = metric(v1[:, :clip], v2[:, :clip])
    out = {"fvd": per, "fvd_per_frame": calculate_per_frame,
           "fvd_video_setting": videos1.shape}
    if calculate_final:
        out["fvd"]["final"] = metric(v1, v2)
    return out
