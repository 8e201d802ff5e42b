"""Tests against the reference's REAL shipped anchor arrays
(`bench_npy/bench_26{4,5}_24.npy`, consumed at result_plot.py:37-38) —
validating the published-chart reproduction path with real data (VERDICT r4
item 3a): array semantics (rows psnr/lpips/fvd/bpp over 52 QPs), the
bpp-in-[0,1.2] filter, the anchor-overlay plot(), and the full
RD-comparison persistence flow.
"""

import json
import os

import numpy as np
import pytest

B264 = "/root/reference/bench_npy/bench_264_24.npy"
B265 = "/root/reference/bench_npy/bench_265_24.npy"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(B264) and os.path.exists(B265)),
    reason="reference bench_npy arrays not mounted")


def test_real_anchor_array_semantics():
    """Shape (24 videos, 4 metrics [psnr,lpips,fvd,bpp], 52 QPs); the known
    BASELINE.md spot value (video 0 H.264 QP1: 50.03 dB @ 3.51 bpp) pins the
    row ordering, and the physics of CRF sweeps pins the monotone trends."""
    a264 = np.load(B264)
    a265 = np.load(B265)
    assert a264.shape == (24, 4, 52) and a265.shape == (24, 4, 52)
    np.testing.assert_allclose(a264[0, 0, 1], 50.03, atol=0.01)  # PSNR row
    np.testing.assert_allclose(a264[0, 3, 1], 3.51, atol=0.01)   # bpp row
    for arr in (a264, a265):
        # PSNR decreases and bpp decreases as QP rises (allow QP-0 lossless
        # edge effects and late-QP plateaus: judge the broad trend)
        psnr, lpips, fvd, bpp = (arr[:, i, :] for i in range(4))
        assert (psnr[:, 1] > psnr[:, 45]).all()
        assert (bpp[:, 1] > bpp[:, 45]).all()
        assert (lpips[:, 1] < lpips[:, 45]).all()  # LPIPS grows with QP
        assert (lpips >= 0).all() and (bpp >= 0).all()
        # the published low-bpp regime exists: every video has anchor points
        # inside the chart filter bpp in [0, 1.2] (result_plot.py)
        assert ((bpp >= 0) & (bpp <= 1.2)).any(axis=1).all()


def test_plot_overlays_real_anchors(tmp_path):
    """plot() consumes the real (24,4,52) arrays: the bpp filter keeps a
    strict subset of QPs and the three overlay PNGs are produced for a video
    index in the real range."""
    from tvc.utils.plotting import _valid, plot

    a264 = np.load(B264)
    for vid in (0, 23):
        bpp, psnr, lpips, fvd = _valid(a264[vid])
        assert 0 < len(bpp) < 52, "bpp filter must drop high-rate QPs"
        assert (bpp <= 1.2).all() and (bpp >= 0).all()

        env = np.asarray([[0.05, 0.2, 0.6], [20.0, 24.0, 28.0]])
        env_l = np.asarray([[0.05, 0.2, 0.6], [0.3, 0.15, 0.08]])
        env_f = np.asarray([[0.05, 0.2, 0.6], [900.0, 600.0, 400.0]])
        out = tmp_path / f"plots_{vid}"
        plot(vid, env, env_l, env_f, str(out), bench_264=B264, bench_265=B265)
        for name in ("PSNR", "LPIPS", "FVD"):
            assert (out / f"BPP_{name}_idx{vid}.png").exists()


def test_persist_rd_results_with_real_anchors(tmp_path):
    """The full RD-comparison flow (points -> convex-hull envelopes ->
    anchor-overlay charts) against the real published arrays — what
    city_sender.py:607-617 does per video."""
    from tvc.pipeline.driver import persist_rd_results
    from tvc.pipeline.sender import RatePoint

    rng = np.random.RandomState(0)
    points = []
    for i, (bpp, ps, lp) in enumerate(
            [(0.04, 21.0, 0.20), (0.10, 23.0, 0.14), (0.30, 25.0, 0.09),
             (0.70, 27.0, 0.06)]):
        points.append(RatePoint(
            quality=4, threshold=0.3 - 0.05 * i, bpp=bpp,
            psnr_list=list(ps + rng.randn(30) * 0.1),
            lpips_list=list(np.clip(lp + rng.randn(30) * 0.005, 0, 1)),
            fvd=700.0 - 100 * i, d=[1, 1] + [0] * 28))
    out = tmp_path / "out0"
    persist_rd_results(0, points, str(out), bench_264=B264, bench_265=B265)
    assert (out / "points.json").exists()
    assert (out / "psnr_0.npy").exists()
    for name in ("PSNR", "LPIPS", "FVD"):
        assert (out / f"BPP_{name}_idx0.png").exists()
    # the persisted envelope is (2, K) [bpp; metric] with bpp ascending
    env = np.load(out / "psnr_0.npy")
    assert env.shape[0] == 2 and (np.diff(env[0]) >= 0).all()
