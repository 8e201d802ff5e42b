"""Data transforms between [0,1] pixel space and model space.

Replicates `data_transform` / `inverse_data_transform` / `logit_transform`
(function.py:56-86, duplicated at city_sender.py:232-244).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tvc.core.config import Config


def logit_transform(image: jax.Array, lam: float = 1e-6) -> jax.Array:
    image = lam + (1 - 2 * lam) * image
    return jnp.log(image) - jnp.log1p(-image)


def data_transform(cfg: Config, x: jax.Array, rng: Optional[jax.Array] = None) -> jax.Array:
    if cfg.data.uniform_dequantization:
        assert rng is not None
        x = x / 256.0 * 255.0 + jax.random.uniform(rng, x.shape, x.dtype) / 256.0
    if cfg.data.gaussian_dequantization:
        assert rng is not None
        x = x + jax.random.normal(rng, x.shape, x.dtype) * 0.01
    if cfg.data.rescaled:
        x = 2.0 * x - 1.0
    elif cfg.data.logit_transform:
        x = logit_transform(x)
    return x


def inverse_data_transform(cfg: Config, x: jax.Array) -> jax.Array:
    if cfg.data.logit_transform:
        x = jax.nn.sigmoid(x)
    elif cfg.data.rescaled:
        x = (x + 1.0) / 2.0
    return jnp.clip(x, 0.0, 1.0)
