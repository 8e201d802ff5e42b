"""ELIC codec layer library in Flax (NHWC).

Re-implements the reference codec layer stack — `ELICUtilis/layers/layers.py`
(AttentionBlock, masked convs, residual blocks, GDN) and the compressai
conv/deconv helpers used at `Network.py:17` — TPU-first: NHWC layout, masks
folded into weights at trace time (a single dense conv on the MXU, no custom
kernel needed), transposed convs as `lax.conv_transpose`-equivalent dilated
convs through flax ConvTranspose.

Submodule names are digit-strings mirroring the torch `nn.Sequential` indices
so checkpoint conversion is a key-by-key map.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.lax import Precision
import numpy as np

Dtype = Any


class Conv(nn.Module):
    """compressai `conv`: k5 s2 p2 by default (compressai/models/utils.py)."""

    out_ch: int
    kernel_size: int = 5
    stride: int = 2
    dtype: Dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2
        return nn.Conv(
            self.out_ch,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            dtype=self.dtype,
            precision=self.precision,
            name="conv",
        )(x)


class _TransposeKernelParams(nn.Module):
    """Holds a torch-ConvTranspose-layout kernel (kh,kw,O,I) + bias (O,) under
    the same param names nn.ConvTranspose(transpose_kernel=True) would create,
    so checkpoint conversion (tvc/utils/convert.py:_deconv) is unchanged."""

    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        bias = self.param("bias", nn.initializers.zeros, (self.shape[2],))
        return kernel, bias


class Deconv(nn.Module):
    """compressai `deconv`: ConvTranspose k5 s2, output_padding=s-1, pad k//2.

    Torch output size: (H-1)*s - 2*p + k + (s-1) = 2H for k5 s2 p2 op1.

    Computed as a SUBPIXEL decomposition instead of an lhs-dilated conv:
    out[2m+rh, 2n+rw] = a stride-1 conv of x with the parity-(rh,rw)
    subsampled kernel, so one (ceil(k/2))^2 conv to 4*out_ch channels + a
    pixel-shuffle interleave replaces conv_transpose. Mathematically identical
    (asserted vs nn.ConvTranspose in tests/test_codec.py); chosen because the
    host-CPU entropy-parameter programs (coding.py) hit XLA-CPU's very slow
    conv_transpose lowering (~30 ms for h_s_2 at 4x4 spatial, vs ~1 ms this
    way), and on TPU a stride-1 conv maps onto the MXU at least as well.
    """

    out_ch: int
    kernel_size: int = 5
    stride: int = 2
    dtype: Dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        p = k // 2
        in_ch = x.shape[-1]
        if not (s == 2 and k == 5):
            # generic fallback (library capability; every codec deconv is k5 s2)
            y = nn.ConvTranspose(
                self.out_ch, (k, k), strides=(s, s), padding="VALID",
                transpose_kernel=True, dtype=self.dtype,
                precision=self.precision, name="conv",
            )(x)
            end = p - (s - 1)
            h, w = y.shape[1], y.shape[2]
            return y[:, p : h - end, p : w - end, :]

        kernel, bias = _TransposeKernelParams((k, k, self.out_ch, in_ch), name="conv")()
        kernel = kernel.astype(self.dtype)
        # out[2m+r] = sum_j x[m+j-1] * W[r + 2p - 2j]  (zero where kh outside
        # [0,k)): parity-r taps of the cropped transpose conv. Build the fused
        # (3,3,I,4O) stride-1 kernel, parities ordered (rh,rw) row-major.
        T = p + 1  # 3 taps per axis for k=5

        def w_or_zero(kh, kw):
            if 0 <= kh < k and 0 <= kw < k:
                return kernel[kh, kw].T  # (I, O)
            return jnp.zeros((in_ch, self.out_ch), self.dtype)

        parities = []
        for rh in (0, 1):
            for rw in (0, 1):
                rows = [
                    jnp.stack([w_or_zero(rh + 2 * p - 2 * a, rw + 2 * p - 2 * b)
                               for b in range(T)], axis=0)
                    for a in range(T)
                ]
                parities.append(jnp.stack(rows, axis=0))  # (T,T,I,O)
        K = jnp.concatenate(parities, axis=-1)  # (T,T,I,4O)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), K, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision,
        )
        b_, h, w = y.shape[0], y.shape[1], y.shape[2]
        y = y.reshape(b_, h, w, 2, 2, self.out_ch)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * h, 2 * w, self.out_ch)
        return y + bias.astype(self.dtype)


class Conv1x1(nn.Module):
    out_ch: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_ch, (1, 1), strides=(self.stride, self.stride),
                       dtype=self.dtype, precision=self.precision, name="conv")(x)


class Conv3x3(nn.Module):
    out_ch: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_ch, (3, 3), strides=(self.stride, self.stride),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       precision=self.precision, name="conv")(x)


class ResidualBottleneckBlock(nn.Module):
    """1x1 -> relu -> 3x3 -> relu -> 1x1 + skip (Network.py:33-59)."""

    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv1x1(self.ch // 2, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = Conv3x3(self.ch // 2, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(h)
        h = Conv1x1(self.ch, dtype=self.dtype, name="conv3")(h)
        return x + h


class ResidualUnit(nn.Module):
    """Trunk unit of the Cheng2020 attention block (ELICUtilis layers.py:217-236)."""

    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv1x1(self.ch // 2, dtype=self.dtype, name="0")(x)
        h = nn.relu(h)
        h = Conv3x3(self.ch // 2, dtype=self.dtype, name="2")(h)
        h = nn.relu(h)
        h = Conv1x1(self.ch, dtype=self.dtype, name="4")(h)
        return nn.relu(x + h)


class AttentionBlock(nn.Module):
    """Trunk x sigmoid(gate) attention (ELICUtilis layers.py:202-253)."""

    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = x
        for i in range(3):
            a = ResidualUnit(self.ch, dtype=self.dtype, name=f"conv_a_{i}")(a)
        b = x
        for i in range(3):
            b = ResidualUnit(self.ch, dtype=self.dtype, name=f"conv_b_{i}")(b)
        b = Conv1x1(self.ch, dtype=self.dtype, name="conv_b_3")(b)
        return x + a * jax.nn.sigmoid(b)


def checkerboard_mask(kh: int, kw: int) -> np.ndarray:
    """Anchor-positions mask for the context conv (ELICUtilis layers.py:64-88):
    1 where (i+j) odd relative to top-left, i.e. [0::2,1::2] and [1::2,0::2]."""
    m = np.zeros((kh, kw), np.float32)
    m[0::2, 1::2] = 1
    m[1::2, 0::2] = 1
    return m


class CheckboardMaskedConv(nn.Module):
    """5x5 conv whose kernel is masked to anchor positions; the mask is a
    trace-time constant folded into the weights, so XLA sees a dense conv."""

    out_ch: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2
        in_ch = x.shape[-1]
        w = self.param("weight", nn.initializers.lecun_normal(), (k, k, in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        mask = jnp.asarray(checkerboard_mask(k, k))[:, :, None, None]
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), (w * mask).astype(self.dtype), (1, 1),
            ((p, p), (p, p)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=Precision.HIGHEST,
        ) + b.astype(self.dtype)


class MaskedConv2d(nn.Module):
    """PixelCNN A/B masked conv (ELICUtilis layers.py:36-62); library capability."""

    out_ch: int
    kernel_size: int = 5
    mask_type: str = "A"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2
        in_ch = x.shape[-1]
        w = self.param("weight", nn.initializers.lecun_normal(), (k, k, in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        m = np.ones((k, k), np.float32)
        m[k // 2, k // 2 + (self.mask_type == "B"):] = 0
        m[k // 2 + 1:, :] = 0
        mask = jnp.asarray(m)[:, :, None, None]
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), (w * mask).astype(self.dtype), (1, 1),
            ((p, p), (p, p)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=Precision.HIGHEST,
        ) + b.astype(self.dtype)


class SubpelConv3x3(nn.Module):
    """3x3 conv + pixel shuffle upsample (ELICUtilis layers.py:95-99)."""

    out_ch: int
    r: int = 1
    dtype: Dtype = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_ch * self.r ** 2, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, precision=self.precision, name="conv")(x)
        b, h, w, c = y.shape
        r = self.r
        y = y.reshape(b, h, w, c // (r * r), r, r)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))
        return y.reshape(b, h * r, w * r, c // (r * r))


class GDN(nn.Module):
    """Generalized divisive normalization (ELICUtilis/layers/gdn.py:26-106).

    y_i = x_i / sqrt(beta_i + sum_j gamma_ij x_j^2) (multiply if inverse).
    Parameters are stored through the compressai NonNegativeParametrizer
    (sqrt reparam with offset 2^-18) so converted weights are drop-in.
    """

    ch: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        offset = 2 ** -18
        beta_bound = (self.beta_min + offset ** 2) ** 0.5
        gamma_bound = offset

        beta_r = self.param(
            "beta", lambda k, s: jnp.sqrt(jnp.ones(s, jnp.float32) + offset ** 2), (self.ch,)
        )
        gamma_r = self.param(
            "gamma",
            lambda k, s: jnp.sqrt(self.gamma_init * jnp.eye(s[0], dtype=jnp.float32) + offset ** 2),
            (self.ch, self.ch),
        )
        beta = jnp.maximum(beta_r, beta_bound) ** 2 - offset ** 2
        gamma = jnp.maximum(gamma_r, gamma_bound) ** 2 - offset ** 2
        norm = jnp.einsum("bhwj,ji->bhwi", x.astype(jnp.float32) ** 2, gamma) + beta
        norm = jnp.sqrt(norm)
        y = x * norm if self.inverse else x / norm
        return y.astype(self.dtype)


class ResidualBlockWithStride(nn.Module):
    """conv3x3 s2 -> leaky -> conv3x3 -> GDN + strided skip (layers.py:107-138)."""

    out_ch: int
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv3x3(self.out_ch, stride=self.stride, dtype=self.dtype, name="conv1")(x)
        h = nn.leaky_relu(h, 0.01)
        h = Conv3x3(self.out_ch, dtype=self.dtype, name="conv2")(h)
        h = GDN(self.out_ch, dtype=self.dtype, name="gdn")(h)
        if self.stride != 1 or x.shape[-1] != self.out_ch:
            x = Conv1x1(self.out_ch, stride=self.stride, dtype=self.dtype, name="skip")(x)
        return h + x


class ResidualBlockUpsample(nn.Module):
    """subpel up -> leaky -> conv3x3 -> IGDN + subpel skip (layers.py:141-166)."""

    out_ch: int
    upsample: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = SubpelConv3x3(self.out_ch, self.upsample, dtype=self.dtype, name="subpel_conv")(x)
        h = nn.leaky_relu(h, 0.01)
        h = Conv3x3(self.out_ch, dtype=self.dtype, name="conv")(h)
        h = GDN(self.out_ch, inverse=True, dtype=self.dtype, name="igdn")(h)
        skip = SubpelConv3x3(self.out_ch, self.upsample, dtype=self.dtype, name="upsample")(x)
        return h + skip


class ResidualBlock(nn.Module):
    """Plain two-conv residual block (layers.py:169-199)."""

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv3x3(self.out_ch, dtype=self.dtype, name="conv1")(x)
        h = nn.leaky_relu(h, 0.01)
        h = Conv3x3(self.out_ch, dtype=self.dtype, name="conv2")(h)
        h = nn.leaky_relu(h, 0.01)
        if x.shape[-1] != self.out_ch:
            x = Conv1x1(self.out_ch, dtype=self.dtype, name="skip")(x)
        return h + x
