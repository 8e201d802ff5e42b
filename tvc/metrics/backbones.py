"""VGG16 / SqueezeNet feature backbones for LPIPS net choices.

The reference LPIPS stack supports net in {alex, vgg, squeeze}
(models/networks_basic.py:25-179, pip `lpips` equally); AlexNet lives in
tvc/metrics/lpips.py, these provide the other two. NHWC Flax modules returning
the standard LPIPS tap lists, plus torch-state-dict converters (torchvision
`vgg16` / `squeezenet1_1` key layouts).
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

VGG_TAPS = (64, 128, 256, 512, 512)
SQUEEZE_TAPS = (64, 128, 256, 384, 384, 512, 512)


class VGG16Features(nn.Module):
    """torchvision vgg16 `features` trunk; taps relu1_2..relu5_3."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        taps = []
        plan = [  # (out_ch, convs per stage)
            (64, 2), (128, 2), (256, 3), (512, 3), (512, 3),
        ]
        idx = 0
        for stage, (ch, n) in enumerate(plan):
            for i in range(n):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            taps.append(x)
            if stage != len(plan) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class Fire(nn.Module):
    squeeze_ch: int
    e1: int
    e3: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze_ch, (1, 1), dtype=self.dtype, name="squeeze")(x))
        a = nn.relu(nn.Conv(self.e1, (1, 1), dtype=self.dtype, name="expand1x1")(s))
        b = nn.relu(nn.Conv(self.e3, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name="expand3x3")(s))
        return jnp.concatenate([a, b], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """torchvision squeezenet1_1 trunk; 7 LPIPS taps."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        taps = []
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), dtype=self.dtype, name="conv0")(x))
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(16, 64, 64, dtype=self.dtype, name="fire3")(x)
        x = Fire(16, 64, 64, dtype=self.dtype, name="fire4")(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(32, 128, 128, dtype=self.dtype, name="fire6")(x)
        x = Fire(32, 128, 128, dtype=self.dtype, name="fire7")(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(48, 192, 192, dtype=self.dtype, name="fire9")(x)
        taps.append(x)
        x = Fire(48, 192, 192, dtype=self.dtype, name="fire10")(x)
        taps.append(x)
        x = Fire(64, 256, 256, dtype=self.dtype, name="fire11")(x)
        taps.append(x)
        x = Fire(64, 256, 256, dtype=self.dtype, name="fire12")(x)
        taps.append(x)
        return taps


def convert_vgg16(params: dict, sd: dict) -> dict:
    """torchvision vgg16 `features.{i}` conv keys -> VGG16Features tree."""
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = jax.tree_util.tree_map(np.asarray, dict(params))
    for i, cid in enumerate(conv_ids):
        params[f"conv{i}"]["kernel"] = np.asarray(sd[f"features.{cid}.weight"]).transpose(2, 3, 1, 0)
        params[f"conv{i}"]["bias"] = np.asarray(sd[f"features.{cid}.bias"])
    return params


def convert_squeezenet(params: dict, sd: dict) -> dict:
    """torchvision squeezenet1_1 `features.{i}` keys -> SqueezeNetFeatures tree."""
    params = jax.tree_util.tree_map(np.asarray, dict(params))

    def conv(dst, key):
        dst["kernel"] = np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)
        dst["bias"] = np.asarray(sd[f"{key}.bias"])

    conv(params["conv0"], "features.0")
    fire_ids = {"fire3": 3, "fire4": 4, "fire6": 6, "fire7": 7,
                "fire9": 9, "fire10": 10, "fire11": 11, "fire12": 12}
    for name, fid in fire_ids.items():
        conv(params[name]["squeeze"], f"features.{fid}.squeeze")
        conv(params[name]["expand1x1"], f"features.{fid}.expand1x1")
        conv(params[name]["expand3x3"], f"features.{fid}.expand3x3")
    return params
