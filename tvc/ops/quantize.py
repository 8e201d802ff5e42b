"""Quantization ops (reference: Network.py:62-72 `Quantizer`, compressai `ste_round`)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ste_round(x: jax.Array) -> jax.Array:
    """Round with straight-through gradient (identity backward)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize(x: jax.Array, mode: str = "noise", rng: Optional[jax.Array] = None) -> jax.Array:
    """noise: additive U(-0.5, 0.5); ste: straight-through round; round: hard."""
    if mode == "noise":
        assert rng is not None, "noise quantization needs an rng"
        return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
    if mode == "ste":
        return ste_round(x)
    if mode == "round":
        return jnp.round(x)
    raise ValueError(f"unknown quantize mode: {mode}")
