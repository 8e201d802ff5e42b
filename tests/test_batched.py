"""Batched GOP runner: lockstep chains must reproduce per-chain semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvc.metrics.lpips import LPIPSMetric
from tvc.models.codec.coding import ELICCoder
from tvc.models.codec.elic import ELICModel
from tvc.pipeline.batched import BatchedGOPRunner, GOPJob
from tvc.pipeline.predictor import FramePredictor

from tests.test_pipeline import tiny_cfg

RNG = np.random.RandomState(21)


def test_batched_runner_mixed_jobs(tiny_pipeline):
    cfg, predictor, coder, lp = tiny_pipeline
    videos = RNG.rand(3, 10, 64, 64, 3).astype(np.float32)
    jobs = [
        GOPJob(video=videos[0], threshold=1e9, quality=4, num_frames_total=8),
        GOPJob(video=videos[1], threshold=-1.0, quality=4, num_frames_total=8),
        GOPJob(video=videos[2], threshold=1e9, quality=4, num_frames_total=8),
    ]
    runner = BatchedGOPRunner(cfg, predictor, {4: coder}, lpips=lp, batch_size=4)
    results = runner.run(jobs, jax.random.PRNGKey(0))
    assert len(results) == 3
    # job 0/2: loose threshold -> only the 2 keyframes transmitted
    assert np.all(results[0].d[0][2:] == 0)
    assert np.all(results[2].d[0][2:] == 0)
    # job 1: impossible threshold -> everything transmitted
    assert np.all(results[1].d[0] == 1)
    for r in results:
        assert r.x_ge.shape == (1, 8, 64, 64, 3)
        assert r.bits > 0 and np.isfinite(r.bpp)


@pytest.mark.slow
def test_run_sweep_batched_driver(tmp_path, tiny_pipeline):
    from tvc.pipeline.driver import run_sweep_batched

    cfg, predictor, coder, lp = tiny_pipeline
    data = RNG.rand(2, 8, 64, 64, 3).astype(np.float32)
    res = run_sweep_batched(
        cfg, data, {4: coder}, predictor, str(tmp_path / "out"),
        start_idx=0, end_idx=1, qualities=[4], thresholds=[1e9, 0.2],
        batch_size=4, with_fvd=False, lpips_metric=lp,
    )
    assert set(res.keys()) <= {0, 1}
    total_points = sum(len(v) for v in res.values())
    assert total_points >= 1
    # multi-process partition covers the same jobs disjointly
    res0 = run_sweep_batched(
        cfg, data, {4: coder}, predictor, str(tmp_path / "out0"),
        start_idx=0, end_idx=1, qualities=[4], thresholds=[1e9, 0.2],
        batch_size=4, with_fvd=False, lpips_metric=lp,
        num_processes=2, process_id=0,
    )
    res1 = run_sweep_batched(
        cfg, data, {4: coder}, predictor, str(tmp_path / "out1"),
        start_idx=0, end_idx=1, qualities=[4], thresholds=[1e9, 0.2],
        batch_size=4, with_fvd=False, lpips_metric=lp,
        num_processes=2, process_id=1,
    )
    n0 = sum(len(v) for v in res0.values())
    n1 = sum(len(v) for v in res1.values())
    assert n0 + n1 == total_points


def test_run_walks_early_stop_economy(tiny_pipeline):
    """Threshold-descending walks retire at bpp >= bpp_stop (the reference's
    early-stop, city_sender.py:561-562): doomed lower thresholds are never
    encoded, so the walk costs measurably fewer sampler sweeps."""
    cfg, predictor, coder, lp = tiny_pipeline
    video = RNG.rand(10, 64, 64, 3).astype(np.float32)
    # impossible threshold first -> all keyframes -> bpp far above a tiny stop
    walk = [GOPJob(video=video, threshold=t, quality=4, num_frames_total=8)
            for t in (-1.0, -2.0, -3.0)]
    runner = BatchedGOPRunner(cfg, predictor, {4: coder}, lpips=lp, batch_size=2)

    results, stats = runner.run_walks([walk], jax.random.PRNGKey(0),
                                      bpp_stop=1e-6)
    assert results[0][0] is not None and results[0][0].bpp >= 1e-6
    assert results[0][1] is None and results[0][2] is None, "walk not retired"
    assert stats["jobs_run"] == 1 and stats["jobs_skipped"] == 2

    # without the stop, every threshold runs (strictly more sweeps)
    results_all, stats_all = runner.run_walks([walk], jax.random.PRNGKey(0),
                                              bpp_stop=None)
    assert all(r is not None for r in results_all[0])
    assert stats_all["sweeps"] > stats["sweeps"]
    assert stats_all["jobs_run"] == 3


def test_run_walks_backfills_batch_slots(tiny_pipeline):
    """A retired walk's slot is backfilled by other walks' pending points."""
    cfg, predictor, coder, lp = tiny_pipeline
    videos = RNG.rand(2, 10, 64, 64, 3).astype(np.float32)
    walks = [
        [GOPJob(video=videos[0], threshold=t, quality=4, num_frames_total=8)
         for t in (1e9, 0.5)],
        [GOPJob(video=videos[1], threshold=t, quality=4, num_frames_total=8)
         for t in (1e9, 0.5)],
    ]
    runner = BatchedGOPRunner(cfg, predictor, {4: coder}, lpips=lp, batch_size=2)
    results, stats = runner.run_walks(walks, jax.random.PRNGKey(2), bpp_stop=10.0)
    # loose thresholds -> low bpp -> both walks complete both points
    done = [r for w in results for r in w if r is not None]
    assert len(done) == 4 and stats["jobs_skipped"] == 0


def test_batched_runner_smaller_batch_than_jobs(tiny_pipeline):
    cfg, predictor, coder, lp = tiny_pipeline
    videos = RNG.rand(3, 8, 64, 64, 3).astype(np.float32)
    jobs = [GOPJob(video=v, threshold=1e9, quality=4, num_frames_total=6) for v in videos]
    runner = BatchedGOPRunner(cfg, predictor, {4: coder}, lpips=lp, batch_size=2)
    results = runner.run(jobs, jax.random.PRNGKey(1))
    assert len(results) == 3
    for r in results:
        assert r.x_ge.shape[1] == 6


def test_batched_fallback_tail_clamp_alignment(tiny_pipeline):
    """Chains whose fallback lands at the video end contribute FEWER than nc
    frames to the batched keyframe coding (the gt slice clamps). Per-chain
    offsets must follow actual chunk lengths — fixed-stride slicing handed
    one chain's decoded frames to another whenever a clamped chain wasn't
    last in the batch. With reject-all thresholds every frame is a coded
    keyframe, so each chain's x_ge must equal the recon of ITS OWN frames."""
    cfg, predictor, coder, lp = tiny_pipeline
    from tvc.pipeline.keyframe import code_frames

    # T=5, nc=2: chains go 2 -> 4 -> 5; the last fallback clamps to 1 frame
    # for BOTH chains in the same per-quality batch
    T = 5
    videos = np.random.RandomState(31).rand(2, T, 64, 64, 3).astype(np.float32)
    jobs = [GOPJob(video=videos[i], threshold=-1.0, quality=4,
                   num_frames_total=T) for i in range(2)]
    runner = BatchedGOPRunner(cfg, predictor, {4: coder}, lpips=lp, batch_size=2)
    results = runner.run(jobs, jax.random.PRNGKey(2))
    for i, r in enumerate(results):
        assert r.d[0].tolist() == [1] * T
        want = np.concatenate([
            code_frames(coder, videos[i][a: a + 2], 64)[0]
            for a in (0, 2, 4)
        ], axis=0)[:T]
        # tolerance covers batch-size-dependent synthesis compilation (the
        # runner synthesizes 2 chains' frames in one batch — ulp-level);
        # the bug this guards against assigns ANOTHER chain's frames, an
        # O(0.1) difference
        np.testing.assert_allclose(r.x_ge[0], want, atol=1e-4)
