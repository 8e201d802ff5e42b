"""FIR resampling ops vs the numpy oracle (upfirdn2d_native semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tvc.ops.resample import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_kernel,
    upfirdn2d,
    upfirdn2d_ref,
    upsample_2d,
    upsample_conv_2d,
)

RNG = np.random.RandomState(0)


@pytest.mark.parametrize(
    "up,down,pad",
    [
        (1, 1, (0, 0)),
        (2, 1, (2, 1)),
        (1, 2, (1, 1)),
        (2, 1, (3, 2)),
        (1, 1, (2, 2)),
        (1, 1, (-1, -1)),
        (2, 2, (2, 1)),
    ],
)
def test_upfirdn2d_matches_oracle(up, down, pad):
    x = RNG.randn(2, 8, 8, 3).astype(np.float32)
    k = setup_kernel([1, 3, 3, 1]).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), k, up=up, down=down, pad=pad))
    want = upfirdn2d_ref(x.astype(np.float64), k.astype(np.float64), up=up, down=down, pad=pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample_shapes_and_dc_gain():
    x = jnp.ones((1, 8, 8, 2), jnp.float32)
    y = upsample_2d(x)
    assert y.shape == (1, 16, 16, 2)
    # constant input stays constant in the interior (gain=1 after factor^2 comp)
    np.testing.assert_allclose(np.asarray(y)[0, 4:-4, 4:-4, 0], 1.0, atol=1e-5)


def test_downsample_shapes_and_dc_gain():
    x = jnp.ones((1, 16, 16, 2), jnp.float32)
    y = downsample_2d(x)
    assert y.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(y)[0, 2:-2, 2:-2, 0], 1.0, atol=1e-5)


def test_up_then_down_roundtrip_is_near_identity():
    # smooth (band-limited) input survives the FIR up/down roundtrip closely
    t = np.linspace(0, 2 * np.pi, 16)
    x = (np.sin(t)[None, :, None, None] * np.cos(t)[None, None, :, None]).astype(np.float32)
    y = downsample_2d(upsample_2d(jnp.asarray(x)))
    assert y.shape == x.shape
    interior = np.s_[0, 3:-3, 3:-3, 0]
    np.testing.assert_allclose(np.asarray(y)[interior], x[interior], atol=0.1)


def test_upsample_conv_2d_shape():
    x = jnp.asarray(RNG.randn(2, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(RNG.randn(3, 3, 4, 6).astype(np.float32) * 0.1)
    y = upsample_conv_2d(x, w)
    assert y.shape == (2, 16, 16, 6)


def test_conv_downsample_2d_shape():
    x = jnp.asarray(RNG.randn(2, 16, 16, 4).astype(np.float32))
    w = jnp.asarray(RNG.randn(3, 3, 4, 6).astype(np.float32) * 0.1)
    y = conv_downsample_2d(x, w)
    assert y.shape == (2, 8, 8, 6)


def test_fused_upsample_conv_equals_sequential():
    """upsample_conv_2d(x, w) == conv3x3(upsample_2d(x), w) (StyleGAN2 identity)."""
    import jax.lax as lax

    x = jnp.asarray(RNG.randn(1, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(RNG.randn(3, 3, 3, 5).astype(np.float32) * 0.1)
    fused = upsample_conv_2d(x, w)
    seq = lax.conv_general_dilated(
        upsample_2d(x), w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # padding is applied once in the fused op vs twice sequentially, so only
    # the interior is bit-comparable (same as the original StyleGAN2 fusion)
    np.testing.assert_allclose(
        np.asarray(fused)[:, 2:-2, 2:-2], np.asarray(seq)[:, 2:-2, 2:-2], atol=1e-4
    )


def test_fused_conv_downsample_equals_sequential():
    import jax.lax as lax

    x = jnp.asarray(RNG.randn(1, 16, 16, 3).astype(np.float32))
    w = jnp.asarray(RNG.randn(3, 3, 3, 5).astype(np.float32) * 0.1)
    fused = conv_downsample_2d(x, w)
    seq = downsample_2d(
        lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    )
    np.testing.assert_allclose(
        np.asarray(fused)[:, 1:-1, 1:-1], np.asarray(seq)[:, 1:-1, 1:-1], atol=1e-4
    )


def test_naive_resamplers():
    x = jnp.asarray(RNG.randn(1, 4, 4, 2).astype(np.float32))
    up = naive_upsample_2d(x)
    assert up.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(up)[0, ::2, ::2], np.asarray(x)[0], atol=0)
    down = naive_downsample_2d(up)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x), atol=1e-6)


def test_polyphase_fast_path_matches_oracle():
    """upsample_2d/downsample_2d (factor=2, separable 4-tap = the NCSN++
    default) take a polyphase shift-and-add path; it must match the upfirdn
    numpy oracle exactly like the generic conv path does."""
    rng = np.random.RandomState(0)
    for shape in [(2, 8, 8, 3), (1, 6, 10, 5)]:
        x = rng.randn(*shape).astype(np.float32)
        for gain in (1.0, 2.0):
            kk = setup_kernel([1, 3, 3, 1]) * (gain * 4)
            p = kk.shape[0] - 2
            ref = upfirdn2d_ref(x, kk, up=2, pad=((p + 1) // 2 + 1, p // 2))
            got = np.asarray(upsample_2d(jnp.asarray(x), gain=gain))
            np.testing.assert_allclose(got, ref, atol=1e-5)
            kk = setup_kernel([1, 3, 3, 1]) * gain
            refd = upfirdn2d_ref(x, kk, down=2, pad=((p + 1) // 2, p // 2))
            gotd = np.asarray(downsample_2d(jnp.asarray(x), gain=gain))
            np.testing.assert_allclose(gotd, refd, atol=1e-5)


def test_fused_fir_flag_matches_oracle(monkeypatch):
    """TVC_FUSED_FIR=1 (one-pass 2-D polyphase, docs/PERF.md lever) must
    match the upfirdn numpy oracle like the 2-pass path does."""
    monkeypatch.setenv("TVC_FUSED_FIR", "1")
    rng = np.random.RandomState(1)
    for shape in [(2, 8, 8, 3), (1, 6, 10, 5)]:
        x = rng.randn(*shape).astype(np.float32)
        for gain in (1.0, 2.0):
            kk = setup_kernel([1, 3, 3, 1]) * (gain * 4)
            p = kk.shape[0] - 2
            ref = upfirdn2d_ref(x, kk, up=2, pad=((p + 1) // 2 + 1, p // 2))
            got = np.asarray(upsample_2d(jnp.asarray(x), gain=gain))
            np.testing.assert_allclose(got, ref, atol=1e-5)
            kk = setup_kernel([1, 3, 3, 1]) * gain
            refd = upfirdn2d_ref(x, kk, down=2, pad=((p + 1) // 2, p // 2))
            gotd = np.asarray(downsample_2d(jnp.asarray(x), gain=gain))
            np.testing.assert_allclose(gotd, refd, atol=1e-5)
