"""PMF -> quantized CDF conversion (16-bit), compressai/ryg_rans-compatible.

Implements the standard stb/ryg_rans normalization used by the reference's
entropy coder: round probabilities to a 2^16 grid, rescale to sum exactly to
2^16, then repair zero-frequency bins by stealing mass from the
lowest-frequency bin > 1. Pure numpy, float64, host-side.
"""

from __future__ import annotations

import numpy as np

PRECISION = 16


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = PRECISION) -> np.ndarray:
    """Quantize a pmf (including the tail-mass bin as its last entry) to a CDF.

    Returns int32 array of length len(pmf)+1 with cdf[0]=0, cdf[-1]=2^precision,
    and every bin non-empty.
    """
    pmf = np.asarray(pmf, dtype=np.float64)
    if np.any(pmf < 0) or not np.all(np.isfinite(pmf)):
        raise ValueError("invalid pmf")
    n = len(pmf)
    cdf = np.zeros(n + 1, dtype=np.int64)
    cdf[1:] = np.round(pmf * (1 << precision)).astype(np.int64)

    total = int(cdf.sum())
    if total == 0:
        raise ValueError("pmf is all-zero")
    # rescale so the running sum hits exactly 2^precision
    cdf = ((1 << precision) * cdf) // total
    cdf = np.cumsum(cdf)
    cdf[-1] = 1 << precision

    # repair empty bins
    for i in range(n):
        if cdf[i] == cdf[i + 1]:
            best_freq = np.iinfo(np.int64).max
            best_steal = -1
            for j in range(n):
                freq = cdf[j + 1] - cdf[j]
                if 1 < freq < best_freq:
                    best_freq = freq
                    best_steal = j
            if best_steal == -1:
                raise ValueError("cannot repair cdf: no bin to steal from")
            if best_steal < i:
                cdf[best_steal + 1 : i + 1] -= 1
            else:
                cdf[i + 1 : best_steal + 1] += 1

    assert cdf[0] == 0 and cdf[-1] == (1 << precision)
    assert np.all(np.diff(cdf) > 0)
    return cdf.astype(np.int32)


def build_cdf_table(pmfs: np.ndarray, tail_mass: np.ndarray, pmf_lengths: np.ndarray,
                    max_length: int) -> np.ndarray:
    """Stack per-channel/per-scale CDFs into a padded int32 matrix.

    Row i holds the quantized CDF of `pmfs[i, :pmf_lengths[i]]` with the tail
    mass appended as the escape bin; padded with zeros to max_length + 2.
    """
    n = pmfs.shape[0]
    out = np.zeros((n, max_length + 2), dtype=np.int32)
    for i in range(n):
        p = np.concatenate([pmfs[i, : pmf_lengths[i]], [tail_mass[i]]])
        c = pmf_to_quantized_cdf(p)
        out[i, : len(c)] = c
    return out
