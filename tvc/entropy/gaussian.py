"""Conditional Gaussian entropy model ("GaussianConditional").

Re-implements the capability of compressai's `GaussianConditional` (reference:
Network.py:170,271,399-401,423-428,493-517,613): per-element Gaussian
(mean, scale) likelihoods with a 64-entry log-spaced scale table for CDF
indexing, and rANS coding of the quantized residuals.

Split as:
- pure-JAX `gaussian_likelihood` (jittable, runs on TPU inside the codec)
- host-side `GaussianCoder` with frozen quantized CDF tables per scale bin
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as _norm

from tvc.entropy.cdf import build_cdf_table
from tvc.entropy.rans import RansDecoder, RansEncoder

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
LIKELIHOOD_BOUND = 1e-9


def get_scale_table(smin: float = SCALES_MIN, smax: float = SCALES_MAX,
                    levels: int = SCALES_LEVELS) -> np.ndarray:
    """64 log-spaced scales (reference: Network.py:23-27)."""
    return np.exp(np.linspace(math.log(smin), math.log(smax), levels))


def _std_cdf_np(x: np.ndarray) -> np.ndarray:
    """Standard normal CDF via erfc (matches compressai's formulation)."""
    import scipy.special as sp

    return 0.5 * sp.erfc(-x / np.sqrt(2.0))


def gaussian_likelihood(x: jax.Array, scales: jax.Array, means: jax.Array,
                        scale_bound: float = SCALES_MIN) -> jax.Array:
    """P(round(x) | N(means, scales^2)) with folded tails; jittable."""
    scales = jnp.maximum(scales, scale_bound)
    v = jnp.abs(x - means)
    inv = 1.0 / scales
    upper = _std_cdf_jax((0.5 - v) * inv)
    lower = _std_cdf_jax((-0.5 - v) * inv)
    return jnp.maximum(upper - lower, LIKELIHOOD_BOUND)


def _std_cdf_jax(x: jax.Array) -> jax.Array:
    return 0.5 * jax.lax.erfc(-x / jnp.sqrt(2.0).astype(x.dtype))


def build_indexes_np(scales: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Scale-bin index per element (compressai build_indexes semantics):
    smallest i with scales <= table[i], capped at len(table)-1."""
    s = np.maximum(scales, table[0])
    idx = np.full(s.shape, len(table) - 1, dtype=np.int32)
    for t in table[:-1]:
        idx -= (s <= t).astype(np.int32)
    return idx


def build_indexes_jax(scales: jax.Array, table: jax.Array) -> jax.Array:
    s = jnp.maximum(scales, table[0])
    # sum_i [s > table[i]] over the first L-1 thresholds
    return jnp.sum(s[..., None] > table[:-1], axis=-1).astype(jnp.int32)


class GaussianCoder:
    """Frozen CDF tables over the scale table + rANS calls.

    Mirrors GaussianConditional.update()/compress()/decompress().
    """

    def __init__(self, scale_table: np.ndarray | None = None, tail_mass: float = 1e-9):
        self.scale_table = np.asarray(scale_table if scale_table is not None else get_scale_table(),
                                      dtype=np.float64)
        self.tail_mass = float(tail_mass)
        self._enc = RansEncoder()
        self._dec = RansDecoder()
        self.update()

    def update(self):
        multiplier = -_norm.ppf(self.tail_mass / 2.0)
        pmf_center = np.ceil(self.scale_table * multiplier).astype(np.int64)
        pmf_length = 2 * pmf_center + 1
        max_length = int(pmf_length.max())

        samples = np.abs(np.arange(max_length, dtype=np.float64)[None, :] - pmf_center[:, None])
        scales = self.scale_table[:, None]
        upper = _std_cdf_np((0.5 - samples) / scales)
        lower = _std_cdf_np((-0.5 - samples) / scales)
        pmf = upper - lower
        tail = 2.0 * lower[:, :1]

        self.cdf = build_cdf_table(pmf, tail[:, 0], pmf_length, max_length)
        self.cdf_length = (pmf_length + 2).astype(np.int32)
        self.offset = (-pmf_center).astype(np.int32)

    def build_indexes(self, scales: np.ndarray) -> np.ndarray:
        return build_indexes_np(scales, self.scale_table)

    def compress(self, y: np.ndarray, indexes: np.ndarray, means: np.ndarray) -> List[bytes]:
        """y/means/indexes: (B, ...). One string per batch element."""
        b = y.shape[0]
        sym = np.round(y - means).astype(np.int32).reshape(b, -1)
        idx = indexes.reshape(b, -1)
        return self._enc.encode_batch(
            sym, idx, [sym.shape[1]] * b, self.cdf, self.cdf_length, self.offset
        )

    def decompress(self, strings: Sequence[bytes], indexes: np.ndarray,
                   means: np.ndarray) -> np.ndarray:
        b = len(strings)
        idx = indexes.reshape(b, -1)
        vals = self._dec.decode_batch(
            strings, idx, [idx.shape[1]] * b, self.cdf, self.cdf_length, self.offset
        )
        return vals.reshape(means.shape).astype(np.float32) + np.asarray(means, np.float32)
