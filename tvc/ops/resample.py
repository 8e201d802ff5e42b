"""FIR up/down-sampling ops (StyleGAN2-style) as XLA convolutions.

TPU-native replacement for the reference's CUDA ``upfirdn2d`` kernel
(`models/better/op/upfirdn2d_kernel.cu`, binding `models/better/op/upfirdn2d.py`)
and the resampling wrappers in `models/better/up_or_down_sampling.py:60-258`.

Design: the pad→upsample→FIR→downsample pipeline is exactly one
``lax.conv_general_dilated`` with ``lhs_dilation`` (zero insertion), explicit
padding, window strides (decimation) and a depthwise FIR kernel — XLA fuses it
with neighbouring elementwise work, so no hand-written kernel is needed on TPU.

All ops are NHWC (TPU-native layout; channels map onto vector lanes).
Semantics match ``upfirdn2d_native`` (`models/better/op/upfirdn2d.py:163-204`):

1. insert ``up-1`` zeros after every input sample (both spatial dims)
2. zero-pad by ``pad[0]`` (top/left) and ``pad[1]`` (bottom/right); negative crops
3. 2-D *convolution* with the FIR filter ``k`` (i.e. correlation with flipped k)
4. keep every ``down``-th sample starting at 0
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def setup_kernel(k: Sequence[float]) -> np.ndarray:
    """Normalize a 1-D (separable) or 2-D FIR kernel; sum = 1."""
    k = np.asarray(k, dtype=np.float64)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def upfirdn2d(
    x: jax.Array,
    k: np.ndarray | jax.Array,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jax.Array:
    """Pad / upsample / FIR-filter / downsample a batch of NHWC images.

    Output spatial size: ``(H*up + pad0 + pad1 - kh) // down + 1``.
    """
    n, h, w, c = x.shape
    k = jnp.asarray(k, dtype=x.dtype)
    kh, kw = k.shape
    pad0, pad1 = int(pad[0]), int(pad[1])

    # lhs_dilation inserts zeros *between* samples -> size (H-1)*up + 1; the
    # reference appends up-1 trailing zeros too, so fold them into the low pad.
    extra = up - 1
    # conv is correlation; flip k to get true convolution (matches the native op)
    kern = jnp.flip(k, (0, 1)).reshape(kh, kw, 1, 1)
    kern = jnp.tile(kern, (1, 1, 1, c))  # depthwise: HWIO with I=1, O=C

    return lax.conv_general_dilated(
        x,
        kern,
        window_strides=(down, down),
        padding=((pad0, pad1 + extra), (pad0, pad1 + extra)),
        lhs_dilation=(up, up),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def _polyphase_enabled() -> bool:
    import os

    return os.environ.get("TVC_POLYPHASE", "1") != "0"


def _separable_4tap(k: Sequence[float]) -> Optional[np.ndarray]:
    """Return the normalized 1-D kernel if ``k`` is a separable 4-tap FIR."""
    if not _polyphase_enabled():
        return None
    ka = np.asarray(k, dtype=np.float64)
    if ka.ndim == 1 and ka.shape[0] == 4:
        return ka / np.sum(ka)
    return None


def _upsample2x_axis(x: jax.Array, k4: np.ndarray, axis: int) -> jax.Array:
    """Polyphase 2x upsample along one spatial axis with a 4-tap FIR.

    Derivation from upfirdn(up=2, pad=(2,2)) with the flipped kernel:
      out[2m]   = k[3]*x[m-1] + k[1]*x[m]
      out[2m+1] = k[2]*x[m]   + k[0]*x[m+1]
    i.e. 4 fused multiply-adds per output instead of a zero-stuffed dilated
    depthwise conv (which pays for the 75% zero taps and bypasses the MXU)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]

    def sl(start):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + n)
        return xp[tuple(idx)]

    even = k4[3] * sl(0) + k4[1] * sl(1)
    odd = k4[2] * sl(1) + k4[0] * sl(2)
    # interleave even/odd along `axis`
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


def _fused_fir_enabled() -> bool:
    """TVC_FUSED_FIR=1 selects the one-pass 2-D polyphase (docs/PERF.md
    "future work": the 2-pass separable form writes a (2H,W) intermediate
    between passes — 9x input traffic vs 5x for the fused form at the cost
    of 16 vs 12 MACs/output; on a bandwidth-bound op the traffic wins)."""
    import os

    return os.environ.get("TVC_FUSED_FIR", "0") == "1"


def _upsample2x_fused(x: jax.Array, k4: jax.Array) -> jax.Array:
    """One-pass 2-D polyphase 2x upsample (both axes at once).

    Separable taps per output phase (from _upsample2x_axis):
      even: k[3]*x[m-1] + k[1]*x[m];  odd: k[2]*x[m] + k[0]*x[m+1]
    Phase (a,b) is the outer product of the per-axis taps — 4 MACs per
    output pixel, no (2H, W) intermediate."""
    pad = [(0, 0)] * x.ndim
    pad[1] = pad[2] = (1, 1)
    xp = jnp.pad(x, pad)
    n1, n2 = x.shape[1], x.shape[2]

    def sl(i, j):
        return xp[:, i: i + n1, j: j + n2]

    taps_even = ((k4[3], 0), (k4[1], 1))
    taps_odd = ((k4[2], 1), (k4[0], 2))
    phases = []
    for ta in (taps_even, taps_odd):
        row = []
        for tb in (taps_even, taps_odd):
            p = None
            for ca, ia in ta:
                for cb, ib in tb:
                    t = (ca * cb) * sl(ia, ib)
                    p = t if p is None else p + t
            row.append(p)
        phases.append(row)
    # interleave: (N, H, 2, W, 2, C) -> (N, 2H, 2W, C)
    stacked = jnp.stack([jnp.stack(r, axis=3) for r in phases], axis=2)
    return stacked.reshape(x.shape[0], 2 * n1, 2 * n2, x.shape[3])


def _downsample2x_fused(x: jax.Array, k4: jax.Array) -> jax.Array:
    """One-pass 2-D polyphase 2x downsample: the 4x4 separable window
    evaluated directly on strided slices (16 MACs/output, no (H, 2W)
    intermediate). Tap offsets from _downsample2x_axis:
      out[m] = k[3]*x[2m-1] + k[2]*x[2m] + k[1]*x[2m+1] + k[0]*x[2m+2]."""
    pad = [(0, 0)] * x.ndim
    pad[1] = pad[2] = (1, 1)
    xp = jnp.pad(x, pad)
    m1, m2 = x.shape[1] // 2, x.shape[2] // 2

    def sl(i, j):
        return xp[:, i: i + 2 * m1: 2, j: j + 2 * m2: 2]

    taps = ((k4[3], 0), (k4[2], 1), (k4[1], 2), (k4[0], 3))
    out = None
    for ca, ia in taps:
        for cb, ib in taps:
            t = (ca * cb) * sl(ia, ib)
            out = t if out is None else out + t
    return out


def _downsample2x_axis(x: jax.Array, k4: np.ndarray, axis: int) -> jax.Array:
    """Polyphase 2x downsample along one spatial axis with a 4-tap FIR.

    From upfirdn(down=2, pad=(1,1)):
      out[m] = k[3]*x[2m-1] + k[2]*x[2m] + k[1]*x[2m+1] + k[0]*x[2m+2]."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad)
    m = x.shape[axis] // 2

    def sl(start):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + 2 * m, 2)
        return xp[tuple(idx)]

    return k4[3] * sl(0) + k4[2] * sl(1) + k4[1] * sl(2) + k4[0] * sl(3)


def upsample_2d(x: jax.Array, k: Sequence[float] = (1, 3, 3, 1), factor: int = 2, gain: float = 1.0) -> jax.Array:
    """FIR upsample by ``factor`` (reference: up_or_down_sampling.py:196-225).

    factor=2 with a separable 4-tap kernel (the NCSN++ default [1,3,3,1])
    takes the polyphase shift-and-add fast path; anything else falls back to
    the generic upfirdn2d conv."""
    k4 = _separable_4tap(k)
    if factor == 2 and k4 is not None:
        scale = np.float64(gain * factor ** 2)
        k4s = (k4 * np.sqrt(scale)).astype(np.float64)
        kh = jnp.asarray(k4s, x.dtype)
        if _fused_fir_enabled():
            return _upsample2x_fused(x, kh)
        y = _upsample2x_axis(x, kh, axis=1)
        return _upsample2x_axis(y, kh, axis=2)
    kk = setup_kernel(k) * (gain * (factor ** 2))
    p = kk.shape[0] - factor
    return upfirdn2d(x, kk, up=factor, pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: jax.Array, k: Sequence[float] = (1, 3, 3, 1), factor: int = 2, gain: float = 1.0) -> jax.Array:
    """FIR downsample by ``factor`` (reference: up_or_down_sampling.py:228-258).

    factor=2 + separable 4-tap kernel takes the polyphase fast path."""
    k4 = _separable_4tap(k)
    if factor == 2 and k4 is not None:
        k4s = (k4 * np.sqrt(np.float64(gain))).astype(np.float64)
        kh = jnp.asarray(k4s, x.dtype)
        if _fused_fir_enabled():
            return _downsample2x_fused(x, kh)
        y = _downsample2x_axis(x, kh, axis=1)
        return _downsample2x_axis(y, kh, axis=2)
    kk = setup_kernel(k) * gain
    p = kk.shape[0] - factor
    return upfirdn2d(x, kk, down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(
    x: jax.Array,
    w: jax.Array,
    k: Sequence[float] = (1, 3, 3, 1),
    factor: int = 2,
    gain: float = 1.0,
) -> jax.Array:
    """Fused transpose-conv upsample + FIR (reference: up_or_down_sampling.py:73-142).

    ``w`` is an HWIO kernel (kh, kw, C_in, C_out). Equivalent to
    conv_transpose(stride=factor, VALID) followed by upfirdn.
    """
    kh, kw, cin, cout = w.shape
    assert kh == kw
    kk = setup_kernel(k) * (gain * (factor ** 2))
    p = (kk.shape[0] - factor) - (kw - 1)

    # The reference feeds a pre-flipped kernel to conv_transpose2d
    # (up_or_down_sampling.py:126-130), which cancels the transpose's implicit
    # spatial flip — the net effect is a zero-stuffed *correlation* with w,
    # i.e. conv_general_dilated with lhs_dilation and the unflipped kernel.
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(y, kk, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(
    x: jax.Array,
    w: jax.Array,
    k: Sequence[float] = (1, 3, 3, 1),
    factor: int = 2,
    gain: float = 1.0,
) -> jax.Array:
    """FIR + strided conv downsample (reference: up_or_down_sampling.py:145-179)."""
    kh, kw, _, _ = w.shape
    assert kh == kw
    kk = setup_kernel(k) * gain
    p = (kk.shape[0] - factor) + (kw - 1)
    y = upfirdn2d(x, kk, pad=((p + 1) // 2, p // 2))
    return lax.conv_general_dilated(
        y,
        w,
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def naive_upsample_2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbour upsample (reference: up_or_down_sampling.py:60-64)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, 1, w, 1, c)
    x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
    return x.reshape(n, h * factor, w * factor, c)


def naive_downsample_2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Mean-pool downsample (reference: up_or_down_sampling.py:67-70)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return jnp.mean(x, axis=(2, 4))


# ---------------------------------------------------------------------------
# Pure-numpy reference implementation (test oracle), transcribing the
# documented semantics of upfirdn2d_native (upfirdn2d.py:163-204).
# ---------------------------------------------------------------------------


def upfirdn2d_ref(
    x: np.ndarray, k: np.ndarray, up: int = 1, down: int = 1, pad: Tuple[int, int] = (0, 0)
) -> np.ndarray:
    """Slow NHWC oracle for upfirdn2d, written independently with numpy."""
    n, h, w, c = x.shape
    kh, kw = k.shape
    pad0, pad1 = pad

    # 1. zero-stuff
    up_x = np.zeros((n, h * up, w * up, c), dtype=np.float64)
    up_x[:, ::up, ::up, :] = x
    # 2. pad (negative = crop)
    ph0, ph1 = max(pad0, 0), max(pad1, 0)
    up_x = np.pad(up_x, ((0, 0), (ph0, ph1), (ph0, ph1), (0, 0)))
    crop0, crop1 = max(-pad0, 0), max(-pad1, 0)
    up_x = up_x[:, crop0 : up_x.shape[1] - crop1, crop0 : up_x.shape[2] - crop1, :]
    # 3. true 2-D convolution with k
    hh, ww = up_x.shape[1], up_x.shape[2]
    oh, ow = hh - kh + 1, ww - kw + 1
    out = np.zeros((n, oh, ow, c), dtype=np.float64)
    kf = k[::-1, ::-1]
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * up_x[:, i : i + oh, j : j + ow, :]
    # 4. decimate
    return out[:, ::down, ::down, :]
