"""NCSNv2 refinement blocks (CRP/RCU/MSF/Refine) in Flax (NHWC).

Capability-parity port of the legacy NCSNv2 layer family the reference ships
at ``models/better/layers.py:122-338`` (CRPBlock/CondCRPBlock,
RCUBlock/CondRCUBlock, MSFBlock/CondMSFBlock, RefineBlock/CondRefineBlock).
These are dead code on every shipped reference config (``ncsnpp_more.py``
never instantiates them — they belong to the RefineNet-style NCSNv2
architecture family), but the library surface exists, so tvc carries it
behind the same layer library with parity tests against the reference's own
torch modules (tests/test_reference_parity.py).

Torch->Flax converter key layout (for a hypothetical NCSNv2 checkpoint):

- ``CRPBlock.convs.{i}.weight``           -> ``convs_{i}/kernel`` (OIHW->HWIO)
- ``CondCRPBlock.norms.{i}.*``            -> ``norms_{i}/*`` (see normalization.py)
- ``RCUBlock.{i+1}_{j+1}_conv.weight``    -> ``conv_{i}_{j}/kernel``
- ``CondRCUBlock.{i+1}_{j+1}_norm.*``     -> ``norm_{i}_{j}/*``
- ``MSFBlock.convs.{i}.{weight,bias}``    -> ``convs_{i}/{kernel,bias}``
- ``RefineBlock.adapt_convs.{i}.*``       -> ``adapt_{i}/*``,
  ``.output_convs.*`` -> ``output/*``, ``.msf.*`` -> ``msf/*``, ``.crp.*`` -> ``crp/*``

All convs are the torch-default-initialized ``ncsn_conv3x3``
(layers.py:97-104); pooling is 5x5 stride-1 window max/avg with SAME-style
padding 2; MSF's resize is bilinear with ``align_corners=True`` — note that
is NOT ``jax.image.resize`` semantics (half-pixel centers), so the grid is
built explicitly in ``interpolate_bilinear_align_corners``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def _torch_conv_init(key, shape, dtype=jnp.float32):
    """Torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
    b = 1/sqrt(fan_in) for conv kernels (HWIO here)."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class NCSNConv3x3(nn.Module):
    """``ncsn_conv3x3`` (reference layers.py:97-104): 3x3 conv, torch default
    init scaled by init_scale."""

    out_ch: int
    use_bias: bool = True
    init_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = 1e-10 if self.init_scale == 0 else self.init_scale
        in_ch = x.shape[-1]

        def kinit(key, shape, dtype=jnp.float32):
            return _torch_conv_init(key, shape, dtype) * scale

        y = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=kinit, dtype=self.dtype,
                    name="conv")(x)
        if self.use_bias:
            b = self.param("bias",
                           lambda k, s: _torch_bias_init(in_ch * 9)(k, s) * scale,
                           (self.out_ch,))
            y = y + b.astype(y.dtype)
        return y


def _pool5(x: jax.Array, mode: str) -> jax.Array:
    """5x5 stride-1 pooling with padding 2 (torch {Max,Avg}Pool2d(5,1,2)).

    Torch AvgPool2d counts padded zeros in the denominator
    (count_include_pad=True default), so avg divides by 25 everywhere."""
    if mode == "max":
        return nn.max_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
    summed = nn.pool(x, 0.0, jax.lax.add, (5, 5), (1, 1), ((2, 2), (2, 2)))
    return summed / 25.0


def interpolate_bilinear_align_corners(x: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """Torch ``F.interpolate(mode='bilinear', align_corners=True)`` for NHWC.

    align_corners=True maps output corner pixels onto input corner pixels:
    src = dst * (in-1)/(out-1). This differs from jax.image.resize, which
    uses half-pixel centers (align_corners=False)."""
    B, H, W, C = x.shape
    oh, ow = shape
    if (H, W) == (oh, ow):
        return x

    def axis_weights(n_in: int, n_out: int):
        if n_out == 1:
            src = np.zeros((1,), np.float64)
        else:
            src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
        lo = np.clip(np.floor(src).astype(np.int32), 0, n_in - 1)
        hi = np.clip(lo + 1, 0, n_in - 1)
        w = (src - lo).astype(np.float32)
        return lo, hi, jnp.asarray(w)

    ylo, yhi, wy = axis_weights(H, oh)
    xlo, xhi, wx = axis_weights(W, ow)
    top = x[:, ylo, :, :] * (1 - wy)[None, :, None, None] + x[:, yhi, :, :] * wy[None, :, None, None]
    out = top[:, :, xlo, :] * (1 - wx)[None, None, :, None] + top[:, :, xhi, :] * wx[None, None, :, None]
    return out


class CRPBlock(nn.Module):
    """Chained residual pooling (reference layers.py:122-143)."""

    features: int
    n_stages: int
    act: Callable = nn.relu
    maxpool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = _pool5(path, "max" if self.maxpool else "avg")
            path = NCSNConv3x3(self.features, use_bias=False, dtype=self.dtype,
                               name=f"convs_{i}")(path)
            x = path + x
        return x


class CondCRPBlock(nn.Module):
    """Conditional CRP (layers.py:146-169): per-stage normalizer(x, y), avg pool."""

    features: int
    n_stages: int
    normalizer: Callable  # nf -> nn.Module taking (x, y)
    act: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = self.normalizer(self.features, name=f"norms_{i}")(path, y)
            path = _pool5(path, "avg")
            path = NCSNConv3x3(self.features, use_bias=False, dtype=self.dtype,
                               name=f"convs_{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv unit (layers.py:172-194)."""

    features: int
    n_blocks: int
    n_stages: int
    act: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = NCSNConv3x3(self.features, use_bias=False, dtype=self.dtype,
                                name=f"conv_{i}_{j}")(x)
            x = x + residual
        return x


class CondRCUBlock(nn.Module):
    """Conditional RCU (layers.py:197-222)."""

    features: int
    n_blocks: int
    n_stages: int
    normalizer: Callable
    act: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.normalizer(self.features, name=f"norm_{i}_{j}")(x, y)
                x = self.act(x)
                x = NCSNConv3x3(self.features, use_bias=False, dtype=self.dtype,
                                name=f"conv_{i}_{j}")(x)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion (layers.py:225-241): per-input conv, resize to a
    common shape (bilinear align_corners=True), sum."""

    features: int
    n_inputs: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], shape: Tuple[int, int]):
        assert len(xs) == self.n_inputs
        total = None
        for i, xi in enumerate(xs):
            h = NCSNConv3x3(self.features, use_bias=True, dtype=self.dtype,
                            name=f"convs_{i}")(xi)
            h = interpolate_bilinear_align_corners(h, shape)
            total = h if total is None else total + h
        return total


class CondMSFBlock(nn.Module):
    """Conditional MSF (layers.py:244-266): normalize THEN conv, resize, sum."""

    features: int
    n_inputs: int
    in_planes: Tuple[int, ...]
    normalizer: Callable
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], y, shape: Tuple[int, int]):
        assert len(xs) == self.n_inputs
        total = None
        for i, xi in enumerate(xs):
            h = self.normalizer(self.in_planes[i], name=f"norms_{i}")(xi, y)
            h = NCSNConv3x3(self.features, use_bias=True, dtype=self.dtype,
                            name=f"convs_{i}")(h)
            h = interpolate_bilinear_align_corners(h, shape)
            total = h if total is None else total + h
        return total


class RefineBlock(nn.Module):
    """RefineNet block (layers.py:269-303): per-input RCU adapters, MSF fuse,
    CRP, output RCU."""

    features: int
    in_planes: Tuple[int, ...]
    act: Callable = nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], output_shape: Tuple[int, int]):
        assert len(xs) == len(self.in_planes)
        hs = [RCUBlock(self.in_planes[i], 2, 2, self.act, dtype=self.dtype,
                       name=f"adapt_{i}")(xi) for i, xi in enumerate(xs)]
        if len(xs) > 1:
            h = MSFBlock(self.features, len(xs), dtype=self.dtype, name="msf")(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool,
                     dtype=self.dtype, name="crp")(h)
        return RCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                        dtype=self.dtype, name="output")(h)


class CondRefineBlock(nn.Module):
    """Conditional RefineNet block (layers.py:306-338)."""

    features: int
    in_planes: Tuple[int, ...]
    normalizer: Callable
    act: Callable = nn.relu
    start: bool = False
    end: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], y, output_shape: Tuple[int, int]):
        assert len(xs) == len(self.in_planes)
        hs = [CondRCUBlock(self.in_planes[i], 2, 2, self.normalizer, self.act,
                           dtype=self.dtype, name=f"adapt_{i}")(xi, y)
              for i, xi in enumerate(xs)]
        if len(xs) > 1:
            h = CondMSFBlock(self.features, len(xs), tuple(self.in_planes),
                             self.normalizer, dtype=self.dtype, name="msf")(hs, y, output_shape)
        else:
            h = hs[0]
        h = CondCRPBlock(self.features, 2, self.normalizer, self.act,
                         dtype=self.dtype, name="crp")(h, y)
        return CondRCUBlock(self.features, 3 if self.end else 1, 2,
                            self.normalizer, self.act, dtype=self.dtype,
                            name="output")(h, y)
