"""Keyframe coding wrapper: pad -> compress -> decompress -> unpad + bits.

Replicates `inference()` (Inference.py:20-75) and the batching wrapper
`compress()` (city_sender.py:440-461) — except frames are coded as ONE batch
through the batch-capable coder instead of a Python loop per frame.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from tvc.models.codec.coding import ELICCoder


def pad_to_multiple(x: np.ndarray, patch: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Zero-pad (B,H,W,C) on bottom/right to multiples of patch (Inference.py:24-31)."""
    h, w = x.shape[1], x.shape[2]
    new_h = (h + patch - 1) // patch * patch
    new_w = (w + patch - 1) // patch * patch
    pad_b, pad_r = new_h - h, new_w - w
    if pad_b or pad_r:
        x = np.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    return x, (pad_b, pad_r)


def per_frame_bits(strings, batch: int) -> List[int]:
    """Split the nested stream structure into per-batch-element bit counts."""
    y, z = per_frame_bits_split(strings, batch)
    return [yb + zb for yb, zb in zip(y, z)]


def per_frame_bits_split(strings, batch: int) -> Tuple[List[int], List[int]]:
    """Per-batch-element (y_bits, z_bits) — the reference's inference()
    reports bpp split between the latent and hyperprior streams
    (Inference.py:49-75)."""
    y_strings, z_strings = strings
    y_bits = [0] * batch
    z_bits = [0] * batch
    for b in range(batch):
        z_bits[b] += len(z_strings[b]) * 8
        for slice_streams in y_strings:
            for phase in slice_streams:  # [anchor, non_anchor]
                y_bits[b] += len(phase[b]) * 8
    return y_bits, z_bits


def code_frames(coder: ELICCoder, frames: np.ndarray, patch: int = 64,
                exact: bool = True) -> Tuple[np.ndarray, List[int]]:
    """Encode+decode a (T,H,W,3) [0,1] frame stack through the real bitstream.

    exact=False uses the fused one-device-program simulation compress (see
    ELICCoder.compress) — the in-process fast path for rate sweeps.
    Returns (decoded frames (T,H,W,3), per-frame bit counts).
    """
    frames = np.asarray(frames, np.float32)
    t, h, w, _ = frames.shape
    x, (pad_b, pad_r) = pad_to_multiple(frames, patch)
    # sender fast path: reconstruction comes from the compress-side decoded
    # latents (== decompress() output by construction; asserted in tests)
    enc = coder.compress(x, return_recon=True, exact=exact)
    x_hat = enc["x_hat"][:, : x.shape[1] - pad_b, : x.shape[2] - pad_r, :]
    return x_hat, per_frame_bits(enc["strings"], t)


def code_frames_device(coder: ELICCoder, frames: np.ndarray, patch: int = 64,
                       exact: bool = True, return_enc: bool = False):
    """`code_frames` variant that keeps the reconstruction ON DEVICE.

    Returns (x_hat device array (T,H,W,3), per-frame bit counts) — plus the
    raw encoder output dict when return_enc=True (so the device GOP loop can
    serialize the TVC1 container of what actually crossed the channel). The
    device-resident GOP loop (tvc/pipeline/sender.py DeviceGOPRunner) feeds
    the reconstruction straight into the next predict cycle's conditioning,
    so fetching it to the host (a blocking tunnel RTT) would be pure
    critical-path waste; unpadding is a device slice."""
    import jax.numpy as jnp

    frames = np.asarray(frames, np.float32)
    t, h, w, _ = frames.shape
    x, (pad_b, pad_r) = pad_to_multiple(frames, patch)
    enc = coder.compress(x, return_recon=True, exact=exact, recon_device=True)
    x_hat = jnp.asarray(enc["x_hat"])[:, : x.shape[1] - pad_b, : x.shape[2] - pad_r, :]
    bits = per_frame_bits(enc["strings"], t)
    if return_enc:
        return x_hat, bits, enc
    return x_hat, bits
