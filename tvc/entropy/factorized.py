"""Factorized-prior entropy model ("EntropyBottleneck").

Re-implements the capability of compressai's `EntropyBottleneck` (used by the
reference codec at Network.py:197-201,346-347,450,544-547) as:

- a Flax module (`FactorizedEntropy`) holding the learnable univariate CDF
  network (matrices/biases/factors cascade, Ballé et al. 2018 appendix 6.1)
  and the quantile parameters; likelihood evaluation is pure JAX and jittable;
- a host-side coder (`FactorizedCoder`) that freezes quantized CDF tables from
  the same parameters (float64 numpy) and drives the C++ rANS coder.

Channel convention: tensors are NHWC; channels = last axis.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tvc.entropy.cdf import build_cdf_table
from tvc.entropy.rans import RansDecoder, RansEncoder

LIKELIHOOD_BOUND = 1e-9


def _logits_cumulative_np(params: dict, x: np.ndarray) -> np.ndarray:
    """Host (float64) mirror of the CDF-network logits. x: (C, 1, N)."""
    logits = x
    k = 0
    while f"matrix_{k}" in params:
        m = np.asarray(params[f"matrix_{k}"], dtype=np.float64)
        logits = np.einsum("cij,cjn->cin", _softplus_np(m), logits)
        logits = logits + np.asarray(params[f"bias_{k}"], dtype=np.float64)
        if f"factor_{k}" in params:
            f = np.asarray(params[f"factor_{k}"], dtype=np.float64)
            logits = logits + np.tanh(f) * np.tanh(logits)
        k += 1
    return logits


def _softplus_np(x):
    return np.logaddexp(0.0, x)


class FactorizedEntropy(nn.Module):
    """Learnable factorized prior over the last (channel) axis."""

    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        f = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        mats, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init_v = float(np.log(np.expm1(1.0 / scale / f[i + 1])))
            mats.append(
                self.param(f"matrix_{i}", lambda k, s, v=init_v: jnp.full(s, v, jnp.float32),
                           (self.channels, f[i + 1], f[i]))
            )
            biases.append(
                self.param(f"bias_{i}",
                           lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.5, 0.5),
                           (self.channels, f[i + 1], 1))
            )
            if i < len(self.filters):
                factors.append(
                    self.param(f"factor_{i}", nn.initializers.zeros, (self.channels, f[i + 1], 1))
                )
        self._mats, self._biases, self._factors = mats, biases, factors
        self.quantiles = self.param(
            "quantiles",
            lambda k, s: jnp.tile(jnp.array([[[-self.init_scale, 0.0, self.init_scale]]],
                                            jnp.float32), (self.channels, 1, 1)),
            (self.channels, 1, 3),
        )

    def _logits_cumulative(self, x):
        """x: (C, 1, N) -> logits (C, 1, N)."""
        logits = x
        for i in range(len(self.filters) + 1):
            logits = jnp.einsum("cij,cjn->cin", jax.nn.softplus(self._mats[i]), logits)
            logits = logits + self._biases[i]
            if i < len(self.filters):
                logits = logits + jnp.tanh(self._factors[i]) * jnp.tanh(logits)
        return logits

    def medians(self):
        return jax.lax.stop_gradient(self.quantiles[:, 0, 1])

    def _likelihood(self, x):
        """x: (C, 1, N) -> pmf of the integer bin containing x."""
        lower = self._logits_cumulative(x - 0.5)
        upper = self._logits_cumulative(x + 0.5)
        sign = -jnp.sign(lower + upper)
        sign = jax.lax.stop_gradient(sign)
        likelihood = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return likelihood

    def __call__(self, x, training: bool = False, rng: Optional[jax.Array] = None):
        """x: NHWC. Returns (x_hat, likelihoods) like compressai's forward."""
        b, h, w, c = x.shape
        med = self.medians().astype(x.dtype)
        if training:
            assert rng is not None, "training quantization needs an rng"
            noise = jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
            x_hat = x + noise
        else:
            x_hat = jnp.round(x - med) + med

        # evaluate likelihood channel-major: (C, 1, B*H*W)
        perm = jnp.transpose(x_hat, (3, 0, 1, 2)).reshape(c, 1, -1)
        lk = self._likelihood(perm)
        lk = jnp.maximum(lk, LIKELIHOOD_BOUND)
        lk = jnp.transpose(lk.reshape(c, b, h, w), (1, 2, 3, 0))
        return x_hat, lk

    def aux_loss(self):
        """Quantile fitting loss (keeps tails at +-tail_mass/2)."""
        logits = self._logits_cumulative(self.quantiles)
        target = float(np.log(2.0 / self.tail_mass - 1.0))
        t = jnp.array([-target, 0.0, target], jnp.float32)
        return jnp.sum(jnp.abs(logits - t))


class FactorizedCoder:
    """Host-side freeze of a FactorizedEntropy: CDF tables + rANS calls.

    Mirrors EntropyBottleneck.update/compress/decompress. Streams are coded in
    channel-major (C, H, W) element order per batch item (matching the
    reference's torch C-order flatten), one string per batch element.
    """

    def __init__(self, params: dict, tail_mass: float = 1e-9):
        # params: flax param dict for one FactorizedEntropy module (numpy-able)
        self.params = {k: np.asarray(v) for k, v in params.items()}
        self.tail_mass = tail_mass
        self.channels = self.params["quantiles"].shape[0]
        self._enc = RansEncoder()
        self._dec = RansDecoder()
        self.update()

    # -- table construction (EntropyBottleneck.update) --
    def update(self):
        q = np.asarray(self.params["quantiles"], dtype=np.float64)  # (C,1,3)
        medians = q[:, 0, 1]
        minima = np.maximum(np.ceil(medians - q[:, 0, 0]).astype(np.int64), 0)
        maxima = np.maximum(np.ceil(q[:, 0, 2] - medians).astype(np.int64), 0)
        pmf_start = medians - minima
        pmf_length = (maxima + minima + 1).astype(np.int64)
        max_length = int(pmf_length.max())

        samples = np.arange(max_length, dtype=np.float64)[None, :] + pmf_start[:, None]
        s = samples[:, None, :]  # (C,1,N)
        lower = _logits_cumulative_np(self.params, s - 0.5)
        upper = _logits_cumulative_np(self.params, s + 0.5)
        sign = -np.sign(lower + upper)
        pmf = np.abs(_sigmoid_np(sign * upper) - _sigmoid_np(sign * lower))[:, 0, :]

        lower_start = _logits_cumulative_np(self.params, (pmf_start - 0.5)[:, None, None])
        upper_end = _logits_cumulative_np(
            self.params, (pmf_start + pmf_length.astype(np.float64) - 0.5)[:, None, None]
        )
        tail = _sigmoid_np(lower_start)[:, 0, 0] + _sigmoid_np(-upper_end)[:, 0, 0]

        self.medians = medians
        self.cdf = build_cdf_table(pmf, tail, pmf_length, max_length)
        self.cdf_length = (pmf_length + 2).astype(np.int32)
        self.offset = (-minima).astype(np.int32)

    # -- coding --
    def _indexes(self, h: int, w: int) -> np.ndarray:
        return np.broadcast_to(
            np.arange(self.channels, dtype=np.int32)[:, None, None], (self.channels, h, w)
        ).reshape(-1)

    def compress(self, z: np.ndarray) -> List[bytes]:
        """z: (B, H, W, C) float -> one bytestring per batch element."""
        b, h, w, c = z.shape
        assert c == self.channels
        sym = np.round(
            np.transpose(z, (0, 3, 1, 2)) - self.medians[None, :, None, None]
        ).astype(np.int32)
        idx = self._indexes(h, w)
        return self._enc.encode_batch(
            sym.reshape(b, -1), np.tile(idx, (b, 1)), [idx.size] * b,
            self.cdf, self.cdf_length, self.offset,
        )

    def quantize(self, z: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Encoder-side (z_hat, symbols) without touching rANS.

        z_hat equals `decompress(compress(z), hw)` bitwise by the coder's
        contract — decompress returns sym + median in f32 and sym is
        round(z - median) (asserted by test_factorized_quantize_contract).
        Lets `ELICCoder.compress` take the hyper path off the rANS critical
        path (the z encode runs on a worker thread)."""
        zc = np.transpose(z, (0, 3, 1, 2))
        med = self.medians[None, :, None, None]
        sym = np.round(zc - med).astype(np.int32)
        vals = sym.astype(np.float32) + med.astype(np.float32)
        return (np.transpose(vals, (0, 2, 3, 1)),
                np.transpose(sym, (0, 2, 3, 1)))

    def compress_symbols(self, sym: np.ndarray) -> List[bytes]:
        """Encode pre-computed integer symbols sym = round(z - median), NHWC.

        Used by the fused compress program (ELICModel.compress_forward), which
        quantizes z on device in f32; coding the device's own symbols keeps
        encoder and decoder bit-consistent by construction (decompress returns
        sym + median)."""
        b, h, w, c = sym.shape
        assert c == self.channels
        s = np.transpose(sym, (0, 3, 1, 2)).astype(np.int32)
        idx = self._indexes(h, w)
        return self._enc.encode_batch(
            s.reshape(b, -1), np.tile(idx, (b, 1)), [idx.size] * b,
            self.cdf, self.cdf_length, self.offset,
        )

    def decompress(self, strings: Sequence[bytes], hw: Tuple[int, int]) -> np.ndarray:
        h, w = hw
        b = len(strings)
        idx = self._indexes(h, w)
        vals = self._dec.decode_batch(
            strings, np.tile(idx, (b, 1)), [idx.size] * b,
            self.cdf, self.cdf_length, self.offset,
        )
        vals = vals.reshape(b, self.channels, h, w).astype(np.float32)
        vals = vals + self.medians[None, :, None, None].astype(np.float32)
        return np.transpose(vals, (0, 2, 3, 1))  # NHWC


def _sigmoid_np(x):
    return 0.5 * (1.0 + np.tanh(0.5 * x))
