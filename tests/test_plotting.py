"""Plot/persistence smoke tests (result_plot.py semantics)."""

import os

import numpy as np

from tvc.utils.plotting import plot


def test_plot_with_and_without_anchors(tmp_path):
    psnr_arr = np.asarray([[0.05, 0.1, 0.2], [24.0, 26.0, 28.0]])
    lpips_arr = np.asarray([[0.05, 0.1, 0.2], [0.2, 0.15, 0.1]])
    fvd_arr = np.asarray([[0.05, 0.1, 0.2], [900.0, 700.0, 500.0]])

    out1 = tmp_path / "noanchor"
    plot(0, psnr_arr, lpips_arr, fvd_arr, str(out1))
    for name in ("PSNR", "LPIPS", "FVD"):
        assert (out1 / f"BPP_{name}_idx0.png").exists()

    # anchor array layout: (videos, 4 [psnr,lpips,fvd,bpp], QPs); bpp>1.2 filtered
    anchors = np.zeros((1, 4, 5))
    anchors[0, 0] = [30, 28, 26, 24, 22]
    anchors[0, 1] = [0.05, 0.1, 0.15, 0.2, 0.25]
    anchors[0, 2] = [300, 500, 700, 900, 1100]
    anchors[0, 3] = [0.8, 0.4, 0.2, 0.1, 2.0]  # last filtered out
    a264 = tmp_path / "bench_264.npy"
    np.save(a264, anchors)
    out2 = tmp_path / "withanchor"
    plot(0, psnr_arr, lpips_arr, fvd_arr, str(out2), bench_264=str(a264))
    assert (out2 / "BPP_PSNR_idx0.png").exists()
