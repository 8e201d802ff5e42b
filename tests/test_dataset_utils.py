"""Dataset prep + colorspace + anchor IO tests (no ffmpeg needed)."""

import os

import numpy as np
import pytest

from tvc.bench.anchors import RawVideoSequence, read_yuv420_rgb, write_yuv420
from tvc.bench.colorspace import rgb2ycbcr, ycbcr2rgb, yuv_420_to_444, yuv_444_to_420
from tvc.utils.dataset import (
    build_dataset_npy,
    center_crop_resize,
    collate_metric_txt,
    pngs_to_video,
    video_to_pngs,
)

RNG = np.random.RandomState(9)


def test_rgb_ycbcr_roundtrip():
    rgb = RNG.rand(8, 8, 3)
    back = ycbcr2rgb(rgb2ycbcr(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-10)


def test_yuv_420_444_shapes():
    y = RNG.rand(16, 16)
    u = RNG.rand(16, 16)
    v = RNG.rand(16, 16)
    y2, u2, v2 = yuv_444_to_420(y, u, v)
    assert u2.shape == (8, 8)
    full = yuv_420_to_444(y2, u2, v2, mode="bilinear")
    assert full.shape == (16, 16, 3)


def test_yuv_file_roundtrip(tmp_path):
    video = RNG.rand(3, 16, 16, 3).astype(np.float32)
    path = str(tmp_path / "v.yuv")
    write_yuv420(video, path)
    seq = RawVideoSequence(np.fromfile(path, dtype=np.uint8), 16, 16)
    assert len(seq) == 3
    back = read_yuv420_rgb(path, 16, 16, 3)
    assert back.shape == (3, 16, 16, 3)
    # chroma subsampling is lossy; luma should be close
    y_orig = rgb2ycbcr(video)[..., 0]
    y_back = rgb2ycbcr(back)[..., 0]
    assert np.abs(y_orig - y_back).mean() < 0.02


def test_center_crop_resize():
    img = (RNG.rand(100, 140, 3) * 255).astype(np.uint8)
    out = center_crop_resize(img, 64)
    assert out.shape == (64, 64, 3)


def test_png_npy_roundtrip(tmp_path):
    video = RNG.rand(2, 32, 32, 3).astype(np.float32)
    paths = video_to_pngs(video, str(tmp_path / "frames"))
    back = pngs_to_video(paths)
    assert back.shape == video.shape
    assert np.abs(back - video).max() < 1 / 255 + 1e-6

    arr = build_dataset_npy([str(tmp_path / "frames")], str(tmp_path / "d.npy"),
                            size=16, num_frames=2)
    assert arr.shape == (1, 2, 3, 16, 16)


def test_collate_metric_txt(tmp_path):
    p = tmp_path / "psnr_lpips_fvd_bpp.txt"
    p.write_text(
        "PSNR: 30.5, LPIPS: [0.12], FVD: 600.0, BPP: 0.06\n"
        "PSNR: 28.1, LPIPS: [0.20], FVD: 900.5, BPP: 0.03\n"
    )
    arr = collate_metric_txt([str(p)])
    assert arr.shape == (1, 4, 2)
    np.testing.assert_allclose(arr[0, 0], [30.5, 28.1])
    np.testing.assert_allclose(arr[0, 3], [0.06, 0.03])
