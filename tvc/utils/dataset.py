"""Dataset preparation utilities.

Replicates the capability of `benchmark/{center_crop.py,npy.py}` (SURVEY.md
§2.6 "Dataset prep utils"): center-crop + Lanczos resize to 128², frame dumps
npy<->png, and metric-txt collation into anchor arrays.
"""

from __future__ import annotations

import os
import re
from typing import List, Sequence, Tuple

import numpy as np


def center_crop_resize(img: np.ndarray, size: int = 128) -> np.ndarray:
    """(H,W,3) uint8/float -> (size,size,3), center square crop + Lanczos."""
    from PIL import Image

    h, w = img.shape[:2]
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    crop = img[top : top + s, left : left + s]
    if crop.dtype != np.uint8:
        crop = np.clip(crop * 255 if crop.max() <= 1.0 else crop, 0, 255).astype(np.uint8)
    out = Image.fromarray(crop).resize((size, size), Image.LANCZOS)
    return np.asarray(out)


def video_to_pngs(video: np.ndarray, out_dir: str, prefix: str = "frame") -> List[str]:
    """(T,H,W,3) [0,1] -> per-frame pngs."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, frame in enumerate(video):
        p = os.path.join(out_dir, f"{prefix}_{i:04d}.png")
        Image.fromarray(np.clip(frame * 255, 0, 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


def pngs_to_video(paths: Sequence[str]) -> np.ndarray:
    """pngs -> (T,H,W,3) float [0,1]."""
    from PIL import Image

    frames = [np.asarray(Image.open(p).convert("RGB")) / 255.0 for p in paths]
    return np.stack(frames).astype(np.float32)


def build_dataset_npy(video_dirs: Sequence[str], out_path: str, size: int = 128,
                      num_frames: int = 30) -> np.ndarray:
    """Folder-of-pngs per video -> (B,T,C,H,W) uint8-range npy (the
    city_bonn.npy layout, city_sender.py:487)."""
    videos = []
    for d in video_dirs:
        paths = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.lower().endswith(".png")
        )[:num_frames]
        frames = [center_crop_resize(np.asarray(_open_rgb(p)), size) for p in paths]
        videos.append(np.stack(frames))
    arr = np.stack(videos)  # (B,T,H,W,3) uint8
    arr = np.transpose(arr, (0, 1, 4, 2, 3)).astype(np.float32)
    np.save(out_path, arr)
    return arr


def _open_rgb(path: str):
    from PIL import Image

    return Image.open(path).convert("RGB")


_METRIC_RE = re.compile(
    r"PSNR:\s*([\d.eE+-]+).*?LPIPS:\s*\[*([\d.eE+-]+).*?FVD:\s*([\d.eE+-]+).*?BPP:\s*([\d.eE+-]+)"
)


def collate_metric_txt(paths: Sequence[str]) -> np.ndarray:
    """Parse `psnr_lpips_fvd_bpp.txt` files (benchmark/bench.py:526-528) into
    the (videos, 4, QPs) anchor layout [psnr, lpips, fvd, bpp]."""
    out = []
    for p in paths:
        rows = [[], [], [], []]
        with open(p) as f:
            for line in f:
                m = _METRIC_RE.search(line)
                if m:
                    for i in range(4):
                        rows[i].append(float(m.group(i + 1)))
        out.append(np.asarray(rows))
    return np.stack(out)
