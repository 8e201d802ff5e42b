"""InceptionV3 feature network (FID backbone) in Flax (NHWC).

Closes the last metric-backbone gap (PARITY.md): the reference FID stack
(`evaluation/inception.py`, torchvision InceptionV3 pool3 features) feeding
`evaluation/fid_PR.py`. Architecture follows torchvision `inception_v3`
(aux-free inference trunk); `load_inception_weights` converts a torchvision
state dict. Returns 2048-d pooled features.

BatchNorm runs in inference mode with stored statistics (eps 1e-3).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, self.kernel, strides=self.stride, padding=self.padding,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _pad(k):
    return ((k // 2, k // 2), (k // 2, k // 2))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(5), dtype=self.dtype, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3), dtype=self.dtype, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3), dtype=self.dtype, name="branch3x3dbl_3")(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(3))
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=(2, 2), dtype=self.dtype, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(3), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=(2, 2), dtype=self.dtype, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7dbl_5")(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(3))
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=(2, 2), dtype=self.dtype, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=(2, 2), dtype=self.dtype, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(3), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(3))
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """299x299x3 in [-1,1] -> 2048-d pooled features (FID pool3)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=(2, 2), dtype=self.dtype, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(3), dtype=self.dtype, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE(dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE(dtype=self.dtype, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)


def load_inception_weights(params: dict, sd: dict) -> dict:
    """Convert a torchvision inception_v3 state dict (fc/aux ignored)."""
    params = jax.tree_util.tree_map(np.asarray, dict(params))

    def walk(tree, prefix):
        for name, sub in tree.items():
            torch_name = f"{prefix}{name}" if not prefix else f"{prefix}.{name}"
            if isinstance(sub, dict) and "conv" in sub:  # BasicConv2d
                sub["conv"]["kernel"] = np.asarray(sd[f"{torch_name}.conv.weight"]).transpose(2, 3, 1, 0)
                sub["bn_scale"] = np.asarray(sd[f"{torch_name}.bn.weight"])
                sub["bn_bias"] = np.asarray(sd[f"{torch_name}.bn.bias"])
                sub["bn_mean"] = np.asarray(sd[f"{torch_name}.bn.running_mean"])
                sub["bn_var"] = np.asarray(sd[f"{torch_name}.bn.running_var"])
            elif isinstance(sub, dict):
                walk(sub, torch_name)

    walk(params, "")
    return params


class FIDInceptionFeatures:
    """Callable feature extractor handle for tvc.metrics.fid_pr."""

    def __init__(self, state_dict: Optional[dict] = None, batch_size: int = 32):
        self.model = InceptionV3Features()
        params = self.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
        self.calibrated = False
        if state_dict is not None:
            params = load_inception_weights(params, state_dict)
            self.calibrated = True
        self.params = params
        self.batch_size = batch_size
        _fn = jax.jit(lambda p, v: self.model.apply({"params": p}, v))
        self._fn = lambda v: _fn(self.params, v)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """(B,H,W,3) [0,1] -> (B, 2048). Resizes to 299 and rescales to [-1,1]."""
        images = jnp.asarray(images, jnp.float32)
        if images.shape[1:3] != (299, 299):
            images = jax.image.resize(
                images, (images.shape[0], 299, 299, images.shape[3]), "bilinear"
            )
        images = images * 2.0 - 1.0
        out = []
        for i in range(0, images.shape[0], self.batch_size):
            out.append(np.asarray(self._fn(images[i : i + self.batch_size])))
        return np.concatenate(out, 0)
