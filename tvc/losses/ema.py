"""Exponential moving average of parameters (reference: models/ema.py:4-47).

The torch EMAHelper keeps a shadow dict mutated in place; here the shadow is a
plain pytree and updates are pure `tree_map`s (jittable, donate-friendly).
"""

from __future__ import annotations

from typing import Any

import jax


class EMAHelper:
    """API-compatible shell: register/update/ema/state_dict/load_state_dict."""

    def __init__(self, mu: float = 0.999):
        self.mu = mu
        self.shadow = None

    def register(self, params: Any) -> None:
        self.shadow = jax.tree_util.tree_map(lambda p: p, params)

    def update(self, params: Any) -> None:
        mu = self.mu
        self.shadow = jax.tree_util.tree_map(
            lambda s, p: (1.0 - mu) * p + mu * s, self.shadow, params
        )

    def ema(self, params: Any) -> Any:
        """Return the EMA weights (the torch version copies in place)."""
        return self.shadow

    def ema_copy(self, params: Any) -> Any:
        return jax.tree_util.tree_map(lambda s: s, self.shadow)

    def state_dict(self) -> Any:
        return self.shadow

    def load_state_dict(self, shadow: Any) -> None:
        self.shadow = shadow


def ema_update(shadow: Any, params: Any, mu: float = 0.999) -> Any:
    """Functional one-liner for use inside jitted train steps."""
    return jax.tree_util.tree_map(lambda s, p: (1.0 - mu) * p + mu * s, shadow, params)
