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
