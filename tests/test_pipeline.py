"""End-to-end pipeline tests with tiny models: the sender GOP loop, fallback
behavior, rate sweep, and driver persistence — CPU-sized."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvc.core.config import Config
from tvc.metrics.lpips import LPIPSMetric
from tvc.models.codec.coding import ELICCoder
from tvc.models.codec.elic import ELICModel
from tvc.pipeline.keyframe import code_frames, pad_to_multiple, per_frame_bits
from tvc.pipeline.predictor import FramePredictor
from tvc.pipeline.sender import Sender, run_gop, stack_frames
from tvc.pipeline.transforms import data_transform, inverse_data_transform

RNG = np.random.RandomState(11)


def tiny_cfg():
    cfg = Config()
    cfg.data.image_size = 64
    cfg.data.num_frames = 3
    cfg.data.num_frames_cond = 2
    cfg.model.ngf = 16
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (32,)
    cfg.model.n_head_channels = 8
    cfg.model.num_classes = 20
    cfg.sampling.subsample = 5
    cfg.codec.patch = 64
    return cfg


def test_transforms_roundtrip():
    cfg = tiny_cfg()
    x = jnp.asarray(RNG.rand(2, 4, 4, 3).astype(np.float32))
    y = data_transform(cfg, x)
    assert float(y.min()) >= -1 and float(y.max()) <= 1
    back = inverse_data_transform(cfg, y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_pad_to_multiple():
    x = np.zeros((1, 30, 50, 3))
    p, (pb, pr) = pad_to_multiple(x, 32)
    assert p.shape == (1, 32, 64, 3) and (pb, pr) == (2, 14)


def test_stack_frames_layout():
    f = RNG.rand(1, 2, 4, 4, 3).astype(np.float32)
    s = stack_frames(f)
    assert s.shape == (1, 4, 4, 6)
    # frame-major: channels [f0 rgb, f1 rgb]
    np.testing.assert_allclose(s[0, :, :, :3], f[0, 0])
    np.testing.assert_allclose(s[0, :, :, 3:], f[0, 1])


def test_predictor_generates_frames(tiny_pipeline):
    cfg, predictor, _, _ = tiny_pipeline
    cond = jnp.asarray(RNG.rand(1, 64, 64, 6).astype(np.float32))
    out = predictor.generate(jax.random.PRNGKey(0), cond)
    assert out.shape == (1, 3, 64, 64, 3)
    o = np.asarray(out)
    assert o.min() >= 0 and o.max() <= 1


def test_code_frames_bits(tiny_pipeline):
    cfg, _, coder, _ = tiny_pipeline
    frames = RNG.rand(2, 64, 64, 3).astype(np.float32)
    dec, bits = code_frames(coder, frames, 64)
    assert dec.shape == frames.shape
    assert len(bits) == 2 and all(b > 0 for b in bits)
    # y/z stream split (Inference.py:49-75) sums to the total
    from tvc.pipeline.keyframe import per_frame_bits_split

    enc = coder.compress(frames, exact=False)
    yb, zb = per_frame_bits_split(enc["strings"], 2)
    assert all(y > 0 and z > 0 for y, z in zip(yb, zb))


def test_gop_accepts_with_loose_threshold(tiny_pipeline):
    """threshold=inf accepts every predicted frame: 2 keyframes + generated."""
    cfg, predictor, coder, lp = tiny_pipeline
    video = RNG.rand(12, 64, 64, 3).astype(np.float32)
    sender = Sender(threshold=1e9, cfg=cfg, predictor=predictor, lpips=lp)
    gop = run_gop(sender, coder, video, jax.random.PRNGKey(0), num_frames_total=8, patch=64)
    assert gop.x_ge.shape == (1, 8, 64, 64, 3)
    d = gop.d[0]
    assert d[0] == 1 and d[1] == 1 and np.all(d[2:] == 0)
    assert gop.bits > 0


def test_gop_fallback_with_strict_threshold(tiny_pipeline):
    """threshold=-1 (LPIPS <= -1 impossible) forces all-transmit fallback."""
    cfg, predictor, coder, lp = tiny_pipeline
    video = RNG.rand(12, 64, 64, 3).astype(np.float32)
    sender = Sender(threshold=-1.0, cfg=cfg, predictor=predictor, lpips=lp)
    gop = run_gop(sender, coder, video, jax.random.PRNGKey(0), num_frames_total=8, patch=64)
    assert np.all(gop.d[0] == 1)  # everything transmitted
    assert gop.x_ge.shape[1] == 8


def test_psnr_decision_mode(tiny_pipeline):
    cfg, predictor, coder, lp = tiny_pipeline
    video = RNG.rand(8, 64, 64, 3).astype(np.float32)
    # PSNR >= -inf always true -> all frames accepted
    sender = Sender(threshold=-1e9, cfg=cfg, predictor=predictor, lpips=lp, use_psnr=True)
    gop = run_gop(sender, coder, video, jax.random.PRNGKey(1), num_frames_total=8, patch=64)
    assert np.all(gop.d[0, 2:] == 0)


@pytest.mark.slow
def test_driver_run_sweep(tmp_path, tiny_pipeline):
    from tvc.pipeline.driver import run_sweep

    cfg, predictor, coder, lp = tiny_pipeline
    data = RNG.rand(1, 10, 3, 64, 64).astype(np.float32) * 255
    np.save(tmp_path / "data.npy", data)
    from tvc.pipeline.driver import load_dataset

    d = load_dataset(str(tmp_path / "data.npy"))
    assert d.shape == (1, 10, 64, 64, 3)
    res = run_sweep(
        cfg, d, {4: coder, 5: coder}, predictor, str(tmp_path / "out"),
        start_idx=0, end_idx=0, qualities=[4], thresholds=[1e9, 0.5, 0.1],
        with_fvd=False, lpips_metric=lp,
    )
    pts = res[0]
    assert len(pts) >= 1
    out_root = tmp_path / "out" / "output_0"
    assert (out_root / "points.json").exists()
    assert (out_root / "psnr_0.npy").exists()


def test_device_gop_runner_matches_run_gop(tiny_pipeline):
    """DeviceGOPRunner must walk run_gop's trajectory BIT-exactly given the
    same key: prediction goes through the SAME jitted sampler executable
    (predictor.generate) and scoring through the SAME LPIPSMetric executable
    run_gop's decide() uses, so there is no program-scope ulp drift (VERDICT
    r4 item 1). A mid-range threshold exercises real accept decisions."""
    import jax as _jax

    from tvc.pipeline.sender import DeviceGOPRunner, Sender, run_gop

    cfg, predictor, coder, lp = tiny_pipeline
    T = 8
    video = np.random.RandomState(5).rand(T, 64, 64, 3).astype(np.float32)
    runner = DeviceGOPRunner(cfg, predictor, lpips=lp, num_frames_total=T)

    for thr in (np.inf, -np.inf, 0.5):
        key = _jax.random.PRNGKey(77)
        sender = Sender(threshold=thr, cfg=cfg, predictor=predictor, lpips=lp)
        ref = run_gop(sender, coder, video, key, T, cfg.codec.patch)
        got = runner.run(coder, video, key, thr, patch=cfg.codec.patch)
        assert got.d[0].tolist() == [int(v) for v in ref.d[0]], thr
        assert got.bits == ref.bits, thr
        np.testing.assert_array_equal(got.x_ge, ref.x_ge)


def test_device_gop_runner_uint8_transport(tiny_pipeline):
    """uint8 ground-truth transport must walk the identical trajectory as the
    equivalent float video (u8/255 in f32 is computed identically on either
    side of the link)."""
    import jax as _jax

    from tvc.pipeline.sender import DeviceGOPRunner

    cfg, predictor, coder, lp = tiny_pipeline
    T = 8
    video_u8 = (np.random.RandomState(6).rand(T, 64, 64, 3) * 255).round().astype(np.uint8)
    video_f = video_u8.astype(np.float32) / 255.0
    runner = DeviceGOPRunner(cfg, predictor, lpips=lp, num_frames_total=T)
    key = _jax.random.PRNGKey(11)
    a = runner.run(coder, video_u8, key, 0.5, patch=cfg.codec.patch)
    b = runner.run(coder, video_f, key, 0.5, patch=cfg.codec.patch)
    assert a.d[0].tolist() == b.d[0].tolist()
    assert a.bits == b.bits
    np.testing.assert_array_equal(a.x_ge, b.x_ge)


def test_device_gop_runner_forced_accepts(tiny_pipeline):
    import jax as _jax

    from tvc.pipeline.sender import DeviceGOPRunner

    cfg, predictor, coder, lp = tiny_pipeline
    T = 8
    video = np.random.RandomState(5).rand(T, 64, 64, 3).astype(np.float32)
    runner = DeviceGOPRunner(cfg, predictor, lpips=lp, num_frames_total=T)
    out = runner.run(coder, video, _jax.random.PRNGKey(3), np.inf,
                     patch=cfg.codec.patch, forced_accepts=[0, 3, 0])
    # init 2 + fallback 2 + gen 3 + fallback 1(clamped: 1 frame left)
    assert out.d[0].tolist() == [1, 1, 1, 1, 0, 0, 0, 1]
    assert out.accepts[:2] == [0, 3]


def test_rate_sweep_device_runner_path(tiny_pipeline):
    import jax as _jax

    from tvc.pipeline.sender import DeviceGOPRunner, rate_sweep

    cfg, predictor, coder, lp = tiny_pipeline
    T = 8
    video = np.random.RandomState(5).rand(T, 64, 64, 3).astype(np.float32)
    runner = DeviceGOPRunner(cfg, predictor, lpips=lp, num_frames_total=T)
    points = rate_sweep(
        cfg, video, {0: coder}, predictor, lp, fvd_metric=None,
        qualities=(0,), thresholds=[np.inf], num_frames_total=T,
        bpp_stop=np.inf, verbose=False, device_runner=runner,
        key=_jax.random.PRNGKey(4))
    assert len(points) == 1
    p = points[0]
    assert p.d[:2] == [1, 1] and sum(p.d) == 2  # accept-all: only init pair
    assert p.bpp > 0 and np.isfinite(p.lpips_list).all()


def test_rate_sweep_psnr_decision(tiny_pipeline):
    """use_psnr plumbs the reference's decide_5to5 rule (PSNR >= rho, dB)
    through the sweep: an always-true threshold accepts every prediction."""
    import jax as _jax

    from tvc.pipeline.sender import rate_sweep

    cfg, predictor, coder, lp = tiny_pipeline
    T = 8
    video = np.random.RandomState(7).rand(T, 64, 64, 3).astype(np.float32)
    points = rate_sweep(
        cfg, video, {0: coder}, predictor, lp, fvd_metric=None,
        qualities=(0,), thresholds=[-1e9], num_frames_total=T,
        bpp_stop=np.inf, verbose=False, use_psnr=True,
        key=_jax.random.PRNGKey(9))
    assert len(points) == 1
    assert sum(points[0].d) == 2  # only the initial keyframe pair transmitted


def test_gop_invariant_to_trailing_frames(tiny_pipeline):
    """Frames past num_frames_total must not influence ANY path's result —
    bits, decisions, or reconstructions (the reference's videos are exactly
    T frames; a tail fallback on a longer input must not code or bill
    out-of-GOP frames). Exercised with a mid threshold so tail decisions
    and fallbacks actually occur."""
    import jax as _jax

    from tvc.pipeline.batched import BatchedGOPRunner, GOPJob
    from tvc.pipeline.sender import DeviceGOPRunner, Sender, run_gop

    cfg, predictor, coder, lp = tiny_pipeline
    T = 7  # odd spacing: counts hit T-1 so clamped tails occur
    long_video = np.random.RandomState(8).rand(T + 6, 64, 64, 3).astype(np.float32)
    short_video = long_video[:T].copy()

    for thr in (-1.0, 0.5):
        key = _jax.random.PRNGKey(21)
        sender = Sender(threshold=thr, cfg=cfg, predictor=predictor, lpips=lp)
        a = run_gop(sender, coder, long_video, key, T, cfg.codec.patch)
        b = run_gop(sender, coder, short_video, key, T, cfg.codec.patch)
        assert a.bits == b.bits, thr
        assert a.d[0].tolist() == b.d[0].tolist(), thr
        np.testing.assert_array_equal(a.x_ge, b.x_ge)

    runner = DeviceGOPRunner(cfg, predictor, lpips=lp, num_frames_total=T)
    key = _jax.random.PRNGKey(21)
    a = runner.run(coder, long_video, key, 0.5, patch=cfg.codec.patch)
    b = runner.run(coder, short_video, key, 0.5, patch=cfg.codec.patch)
    assert a.bits == b.bits and a.d[0].tolist() == b.d[0].tolist()
    np.testing.assert_array_equal(a.x_ge, b.x_ge)

    br = BatchedGOPRunner(cfg, predictor, {4: coder}, lpips=lp, batch_size=2)
    ra = br.run([GOPJob(video=long_video, threshold=0.5, quality=4,
                        num_frames_total=T)], _jax.random.PRNGKey(22))
    rb = br.run([GOPJob(video=short_video, threshold=0.5, quality=4,
                        num_frames_total=T)], _jax.random.PRNGKey(22))
    assert ra[0].bits == rb[0].bits
    np.testing.assert_array_equal(ra[0].x_ge, rb[0].x_ge)
