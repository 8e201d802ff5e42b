"""Fused bias + leaky-ReLU x scale activation.

API-parity replacement for the reference's `fused_bias_act` CUDA extension
(`models/better/op/fused_bias_act_kernel.cu`, python wrapper
`models/better/op/fused_act.py:14-22`). On TPU this is a single VPU-fused
elementwise expression — XLA fuses bias-add + select + scale into neighboring
ops automatically, so no Pallas kernel is warranted (SURVEY.md §2.7 item 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fused_leaky_relu(x: jax.Array, bias: jax.Array, negative_slope: float = 0.2,
                     scale: float = 2 ** 0.5) -> jax.Array:
    """y = leaky_relu(x + bias) * scale, bias broadcast over the channel axis."""
    y = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(y >= 0, y, y * negative_slope) * scale


class FusedLeakyReLU:
    """Module-style shim mirroring the reference class (fused_act.py:25-33)."""

    def __init__(self, bias: jax.Array, negative_slope: float = 0.2, scale: float = 2 ** 0.5):
        self.bias = bias
        self.negative_slope = negative_slope
        self.scale = scale

    def __call__(self, x: jax.Array) -> jax.Array:
        return fused_leaky_relu(x, self.bias, self.negative_slope, self.scale)
