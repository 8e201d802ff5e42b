"""FVD metric: I3D features + Fréchet distance.

Mirrors the reference FVD path (models/fvd/fvd.py + fvd_utils/calculate_fvd.py
+ the sender wrapper city_sender.py:264-279): BTCHW-equivalent video batches in
[0,1], bilinear resize of the short side to 224 with center crop, [-1,1]
rescale, I3D 400-d features in batches, scipy Fréchet distance on the host.

Here videos are (B, T, H, W, C) NHWC-per-frame; feature extraction is one
jitted I3D apply per batch of 10 (reference bs=10, fvd.py:41).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tvc.metrics.frechet import frechet_distance
from tvc.models.i3d import InceptionI3d, load_i3d_weights


def preprocess_video(video: jax.Array, resolution: int = 224) -> jax.Array:
    """(T,H,W,C) [0,1] -> (T,res,res,C) [-1,1] (fvd.py:160-186)."""
    t, h, w, c = video.shape
    scale = resolution / min(h, w)
    if h < w:
        target = (resolution, math.ceil(w * scale))
    else:
        target = (math.ceil(h * scale), resolution)
    video = jax.image.resize(video, (t, target[0], target[1], c), "bilinear")
    h_start = (target[0] - resolution) // 2
    w_start = (target[1] - resolution) // 2
    video = video[:, h_start : h_start + resolution, w_start : w_start + resolution, :]
    return (video - 0.5) * 2.0


class FVDMetric:
    """I3D feature extractor + Fréchet distance.

    `calibrated` is False when running random I3D weights (no checkpoint
    supplied) — pipeline plumbing works, the absolute FVD number does not
    correspond to the published metric until weights are converted.
    """

    def __init__(self, i3d_state_dict: Optional[dict] = None, batch_size: int = 10):
        self.model = InceptionI3d()
        dummy = jnp.zeros((1, 10, 224, 224, 3))
        params = self.model.init(jax.random.PRNGKey(0), dummy)["params"]
        self.calibrated = False
        if i3d_state_dict is not None:
            params = load_i3d_weights(params, i3d_state_dict)
            self.calibrated = True
        self.params = params
        self.batch_size = batch_size
        _fn = jax.jit(lambda p, v: self.model.apply({"params": p}, v))
        self._feats = lambda v: _fn(self.params, v)

    def features(self, videos: np.ndarray) -> np.ndarray:
        """videos: (B,T,H,W,C) in [0,1] -> (B, 400) features (fvd.py:41-49)."""
        videos = jnp.asarray(videos, jnp.float32)
        pre = jnp.stack([preprocess_video(v) for v in videos])
        out = []
        bs = self.batch_size
        for i in range((pre.shape[0] - 1) // bs + 1):
            out.append(np.asarray(self._feats(pre[i * bs : (i + 1) * bs])))
        return np.concatenate(out, axis=0)

    def __call__(self, videos1: np.ndarray, videos2: np.ndarray) -> float:
        """Scalar FVD between two video batches (city_sender.py:264-279).
        Grayscale inputs are repeated to 3 channels like the reference trans."""
        videos1 = _to_rgb(np.asarray(videos1))
        videos2 = _to_rgb(np.asarray(videos2))
        assert videos1.shape == videos2.shape
        f1 = self.features(videos1)
        f2 = self.features(videos2)
        return frechet_distance(f1, f2)


def _to_rgb(v: np.ndarray) -> np.ndarray:
    if v.shape[-1] == 1:
        v = np.repeat(v, 3, axis=-1)
    return v
