"""Pixel-space metrics: PSNR and SSIM.

PSNR matches `cal_psnr` (city_sender.py:257-260): float64 MSE over the whole
array. SSIM matches `fvd_utils/calculate_ssim.py:6-43`: 11x11 Gaussian window
(sigma 1.5), valid-region crop, per-channel average, C1=0.01^2, C2=0.03^2 on
[0,1] data.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img1: np.ndarray, img2: np.ndarray, maxvalue: float = 1.0) -> float:
    a = np.asarray(img1, dtype=np.float64)
    b = np.asarray(img2, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10((maxvalue ** 2) / mse))


def psnr_jax(a: jax.Array, b: jax.Array, maxvalue: float = 1.0, axis=None) -> jax.Array:
    """Jittable PSNR; reduces over `axis` (default: all)."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2, axis=axis)
    return 10.0 * jnp.log10((maxvalue ** 2) / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    half = (size - 1) / 2.0
    x = np.arange(size, dtype=np.float64) - half
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    """2-D single-channel SSIM, valid window (calculate_ssim.py:6-23)."""
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    w = _gaussian_kernel()

    def filt(x):
        # valid-mode correlation with the (symmetric) gaussian window
        from scipy.signal import convolve2d

        return convolve2d(x, w, mode="valid")

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = filt(img1 ** 2) - mu1_sq
    s2 = filt(img2 ** 2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return float(m.mean())


def ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """Channel-first (C,H,W) or 2-D images in [0,1] (calculate_ssim.py:27-43)."""
    img1, img2 = np.asarray(img1), np.asarray(img2)
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2:
        return ssim_single(img1, img2)
    if img1.ndim == 3:
        if img1.shape[0] == 1:
            return ssim_single(img1[0], img2[0])
        return float(np.mean([ssim_single(img1[c], img2[c]) for c in range(img1.shape[0])]))
    raise ValueError("Wrong input image dimensions.")


def ssim_jax(a: jax.Array, b: jax.Array) -> jax.Array:
    """Jittable batched SSIM for NHWC images in [0,1]; returns (B,)."""
    w = jnp.asarray(_gaussian_kernel(), jnp.float32)
    c = a.shape[-1]
    kern = jnp.tile(w[:, :, None, None], (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = filt(a), filt(b)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = filt(a * a) - mu1_sq
    s2 = filt(b * b) - mu2_sq
    s12 = filt(a * b) - mu12
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m, axis=(1, 2, 3))


def per_frame_psnr(video1: np.ndarray, video2: np.ndarray) -> List[float]:
    """(T, ...) videos -> per-frame PSNR list (city_sender.py:565-566)."""
    return [psnr(video1[t], video2[t]) for t in range(video1.shape[0])]
