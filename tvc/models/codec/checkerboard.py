"""Checkerboard anchor/non-anchor index arithmetic (NHWC, jit-friendly).

The reference scatters anchors with strided slice assignment
(Network.py:205-211,387-403,416-432,488-521). Here the pack/unpack operations
are pure gathers/reshapes with static shapes — XLA lowers them to cheap
relayouts, no masked scatter needed.

Anchor positions: (h+w) even -> (0::2,0::2) and (1::2,1::2).
Non-anchor:       (h+w) odd  -> (0::2,1::2) and (1::2,0::2).
Packed layout: (B,H,W,C) -> (B,H,W//2,C); even rows carry their even (anchor)
or odd (non-anchor) columns, odd rows the complement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def anchor_mask(h: int, w: int) -> np.ndarray:
    """(h, w, 1) float mask, 1 at anchor positions."""
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (((ii + jj) % 2) == 0).astype(np.float32)[:, :, None]


def keep_anchor(y: jax.Array) -> jax.Array:
    m = jnp.asarray(anchor_mask(y.shape[1], y.shape[2]), y.dtype)
    return y * m


def keep_nonanchor(y: jax.Array) -> jax.Array:
    m = jnp.asarray(anchor_mask(y.shape[1], y.shape[2]), y.dtype)
    return y * (1.0 - m)


def _interleave_rows(even: jax.Array, odd: jax.Array) -> jax.Array:
    """(B,H/2,W,C),(B,H/2,W,C) -> (B,H,W,C) alternating rows."""
    b, h2, w, c = even.shape
    return jnp.stack([even, odd], axis=2).reshape(b, h2 * 2, w, c)


def _interleave_cols(a: jax.Array, b_: jax.Array) -> jax.Array:
    """(B,H,W/2,C),(B,H,W/2,C) -> (B,H,W,C) alternating columns."""
    b, h, w2, c = a.shape
    return jnp.stack([a, b_], axis=3).reshape(b, h, w2 * 2, c)


def pack_anchor(y: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (B,H,W/2,C): even rows keep even cols, odd rows odd cols
    (Network.py:392-397)."""
    even = y[:, 0::2, 0::2, :]
    odd = y[:, 1::2, 1::2, :]
    return _interleave_rows(even, odd)


def pack_nonanchor(y: jax.Array) -> jax.Array:
    """even rows keep odd cols, odd rows even cols (Network.py:416-421)."""
    even = y[:, 0::2, 1::2, :]
    odd = y[:, 1::2, 0::2, :]
    return _interleave_rows(even, odd)


def unpack_anchor(p: jax.Array) -> jax.Array:
    """Inverse of pack_anchor; zeros at non-anchor positions (Network.py:402-403)."""
    even = p[:, 0::2, :, :]
    odd = p[:, 1::2, :, :]
    z = jnp.zeros_like(even)
    even_rows = _interleave_cols(even, z)      # values at even cols
    odd_rows = _interleave_cols(z, odd)        # values at odd cols
    return _interleave_rows(even_rows, odd_rows)


def unpack_nonanchor(p: jax.Array) -> jax.Array:
    """Inverse of pack_nonanchor; zeros at anchor positions (Network.py:431-432)."""
    even = p[:, 0::2, :, :]
    odd = p[:, 1::2, :, :]
    z = jnp.zeros_like(even)
    even_rows = _interleave_cols(z, even)      # values at odd cols
    odd_rows = _interleave_cols(odd, z)        # values at even cols
    return _interleave_rows(even_rows, odd_rows)
