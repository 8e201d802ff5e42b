"""Colorspace transforms for the anchor benchmark (BT.709).

Replicates `benchmark/transform.py:26-172`: RGB<->YCbCr with ITU-R BT.709
coefficients, chroma 444<->420 via avg-pool down / interpolated up. NHWC numpy
(the anchor harness is host-side; ffmpeg does the heavy lifting).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# Kr, Kg, Kb for ITU-R BT.709
KR, KG, KB = 0.2126, 0.7152, 0.0722


def rgb2ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(..., H, W, 3) float RGB -> YCbCr."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = KR * r + KG * g + KB * b
    cb = 0.5 * (b - y) / (1 - KB) + 0.5
    cr = 0.5 * (r - y) / (1 - KR) + 0.5
    return np.stack([y, cb, cr], axis=-1)


def ycbcr2rgb(ycbcr: np.ndarray) -> np.ndarray:
    y, cb, cr = ycbcr[..., 0], ycbcr[..., 1], ycbcr[..., 2]
    r = y + (2 - 2 * KR) * (cr - 0.5)
    b = y + (2 - 2 * KB) * (cb - 0.5)
    g = (y - KR * r - KB * b) / KG
    return np.stack([r, g, b], axis=-1)


def yuv_444_to_420(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> Tuple[np.ndarray, ...]:
    """Chroma avg-pool 2x2 (transform.py:79-108). Planes are (H, W)."""

    def down(p):
        h, w = p.shape
        return p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    return y, down(u), down(v)


def yuv_420_to_444(y: np.ndarray, u: np.ndarray, v: np.ndarray, mode: str = "bicubic") -> np.ndarray:
    """Upsample chroma to luma resolution; returns (H, W, 3).

    The reference uses torch F.interpolate bicubic (bench.py:472); here
    jax.image.resize cubic matches the half-pixel convention.
    """
    import jax
    import jax.numpy as jnp

    h, w = y.shape
    method = {"bilinear": "bilinear", "bicubic": "cubic", "nearest": "nearest"}[mode]
    uu = np.asarray(jax.image.resize(jnp.asarray(u, jnp.float32), (h, w), method))
    vv = np.asarray(jax.image.resize(jnp.asarray(v, jnp.float32), (h, w), method))
    return np.stack([y.astype(np.float32), uu, vv], axis=-1)
