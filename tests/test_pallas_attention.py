"""Pallas fused attention vs the einsum oracle (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from tvc.ops.pallas_attention import attention, attention_pallas, attention_reference

RNG = np.random.RandomState(13)


def test_pallas_attention_matches_reference():
    b, h, t, d = 2, 3, 64, 32
    q = jnp.asarray(RNG.randn(b, h, t, d).astype(np.float32))
    k = jnp.asarray(RNG.randn(b, h, t, d).astype(np.float32))
    v = jnp.asarray(RNG.randn(b, h, t, d).astype(np.float32))
    want = np.asarray(attention_reference(q, k, v))
    got = np.asarray(attention_pallas(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_attention_backend_dispatch():
    q = jnp.asarray(RNG.randn(1, 1, 16, 8).astype(np.float32))
    a = attention(q, q, q, backend="einsum")
    b = attention(q, q, q, backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
