"""Receiver reconstruction must be BIT-IDENTICAL to the sender's decode.

The protocol's core property: the receiver, given only (accepts, seed,
keyframe containers), regenerates non-transmitted frames with the same
deterministic sampler and reproduces the sender's sequence exactly."""

import numpy as np
import pytest

import jax

from tvc.pipeline.receiver import run_gop_receiver
from tvc.pipeline.sender import Sender, run_gop

RNG = np.random.RandomState(41)


@pytest.mark.parametrize(
    "threshold",
    [1e9, pytest.param(0.5, marks=pytest.mark.slow)],
)
def test_receiver_matches_sender(tiny_pipeline, threshold):
    cfg, predictor, coder, lp = tiny_pipeline
    video = RNG.rand(12, 64, 64, 3).astype(np.float32)
    key = jax.random.PRNGKey(7)
    sender = Sender(threshold=threshold, cfg=cfg, predictor=predictor, lpips=lp)
    gop = run_gop(sender, coder, video, key, num_frames_total=8, patch=64,
                  keep_streams=True)
    assert gop.containers is not None and gop.accepts is not None

    rec = run_gop_receiver(cfg, gop.accepts, gop.containers, coder, predictor,
                           key, num_frames_total=8)
    assert rec.shape == (8, 64, 64, 3)
    np.testing.assert_array_equal(rec, gop.x_ge[0])


def test_receiver_all_fallback(tiny_pipeline):
    """Impossible threshold: receiver decodes everything from containers."""
    cfg, predictor, coder, lp = tiny_pipeline
    video = RNG.rand(8, 64, 64, 3).astype(np.float32)
    key = jax.random.PRNGKey(3)
    sender = Sender(threshold=-1.0, cfg=cfg, predictor=predictor, lpips=lp)
    gop = run_gop(sender, coder, video, key, num_frames_total=6, patch=64,
                  keep_streams=True)
    rec = run_gop_receiver(cfg, gop.accepts, gop.containers, coder, predictor,
                           key, num_frames_total=6)
    np.testing.assert_array_equal(rec, gop.x_ge[0])


@pytest.mark.parametrize(
    "threshold",
    [1e9, -1.0, pytest.param(0.5, marks=pytest.mark.slow)],
)
def test_receiver_matches_device_gop_runner(tiny_pipeline, threshold):
    """The production latency path (DeviceGOPRunner) is transmissible: its
    keep_streams containers + accepts + seed reconstruct BYTE-identically
    through the standard receiver, because sender prediction runs the SAME
    jitted sampler executable the receiver runs (VERDICT r4 item 1)."""
    from tvc.pipeline.sender import DeviceGOPRunner

    cfg, predictor, coder, lp = tiny_pipeline
    video = RNG.rand(12, 64, 64, 3).astype(np.float32)
    key = jax.random.PRNGKey(13)
    runner = DeviceGOPRunner(cfg, predictor, lpips=lp, num_frames_total=8)
    gop = runner.run(coder, video, key, threshold, patch=64, keep_streams=True)
    assert gop.containers is not None and gop.accepts is not None

    rec = run_gop_receiver(cfg, gop.accepts, gop.containers, coder, predictor,
                           key, num_frames_total=8)
    np.testing.assert_array_equal(rec, gop.x_ge[0])
