"""Per-dataset anchor preset tests with a stub codec (no ffmpeg binary in
this environment — the ffmpeg_encode/ffmpeg_decode seams are monkeypatched
with a fake quantizing codec whose filesize shrinks with QP)."""

import os
import zlib

import numpy as np
import pytest

import tvc.bench.anchors as anchors_mod
from tvc.bench.presets import (
    PRESETS,
    average_curves,
    plot_average_curves,
    run_preset,
)

RNG = np.random.RandomState(11)


@pytest.fixture()
def stub_codec(monkeypatch):
    """Fake encoder: quantize the raw planes by (qp+1) and deflate -> .mp4;
    fake decoder: inflate and dequantize back to raw. Lossy like a real
    codec, monotone-ish rate in qp."""

    def enc(raw, mp4, codec, qp, w, h, framerate, pix_fmt):
        data = np.fromfile(raw, np.uint8)
        q = qp + 1
        quant = (data // q).astype(np.uint8)
        payload = zlib.compress(quant.tobytes(), 6)
        with open(mp4, "wb") as f:
            f.write(np.uint16(q).tobytes() + payload)

    def dec(mp4, rec, pix_fmt):
        blob = open(mp4, "rb").read()
        q = int(np.frombuffer(blob[:2], np.uint16)[0])
        quant = np.frombuffer(zlib.decompress(blob[2:]), np.uint8)
        out = np.clip(quant.astype(np.int32) * q + q // 2, 0, 255).astype(np.uint8)
        out.tofile(rec)

    monkeypatch.setattr(anchors_mod, "ffmpeg_encode", enc)
    monkeypatch.setattr(anchors_mod, "ffmpeg_decode", dec)
    return enc, dec


def test_preset_registry_matches_reference_semantics():
    assert PRESETS["city"].width == 128 and PRESETS["city"].pix_fmt == "yuv420p"
    assert PRESETS["city"].num_videos == 24
    assert set(PRESETS["city"].codecs) == {"libx264", "libx265"}
    assert PRESETS["uvg"].num_videos == 7
    assert PRESETS["uvg"].video_names[0] == "YachtRide"
    # SMMNIST: 64x64 gray-plane coding, H.265 only (bench_smm.py:112-130)
    smm = PRESETS["smm"]
    assert (smm.width, smm.height, smm.pix_fmt) == (64, 64, "gray")
    assert smm.codecs == ("libx265",)
    assert smm.num_videos == 64


@pytest.mark.parametrize("name", ["city", "smm"])
def test_run_preset_end_to_end_stub(name, stub_codec, tmp_path):
    preset = PRESETS[name]
    T = 4
    # shrink frame count via a copy of the preset (frozen dataclass)
    import dataclasses

    preset = dataclasses.replace(preset, num_frames=T)
    videos = RNG.rand(2, T, preset.height, preset.width, 3).astype(np.float32)
    out = run_preset(preset, videos, str(tmp_path / "work"), str(tmp_path / "out"),
                     qp_range=[10, 30, 50], require_ffmpeg=False)
    for codec, arr in out.items():
        tag = "264" if "264" in codec else "265"
        assert arr.shape == (2, 4, 3)
        # PSNR decreases and bpp decreases as qp rises (stub quantizer)
        assert arr[0, 0, 0] > arr[0, 0, 2], "psnr should fall with qp"
        assert arr[0, 3, 0] > arr[0, 3, 2], "bpp should fall with qp"
        assert os.path.exists(tmp_path / "out" / f"bench_{name}_{tag}.npy")
        txts = [p for p in os.listdir(tmp_path / "out") if p.endswith(".txt")
                and f"_{tag}_" in p]
        assert len(txts) == 2
        line = open(tmp_path / "out" / txts[0]).readline()
        assert line.startswith("PSNR: ") and "BPP: " in line


def test_run_preset_rejects_wrong_geometry(stub_codec, tmp_path):
    import dataclasses

    preset = dataclasses.replace(PRESETS["city"], num_frames=2)
    videos = RNG.rand(1, 2, 64, 64, 3).astype(np.float32)
    with pytest.raises(ValueError, match="128x128"):
        run_preset(preset, videos, str(tmp_path / "w"), str(tmp_path / "o"),
                   qp_range=[30], require_ffmpeg=False)


def test_average_curves_grid_and_mean():
    # two videos with overlapping bpp ranges; exact linear curves
    b1 = np.array([0.10, 0.50])
    m1 = np.array([10.0, 50.0])   # metric = 100*bpp
    b2 = np.array([0.20, 0.40])
    m2 = np.array([40.0, 80.0])   # metric = 200*bpp
    grid, mean = average_curves([b1, b2], [m1, m2], step=0.1)
    assert np.allclose(grid, [0.1, 0.2, 0.3, 0.4, 0.5])
    # at 0.1/0.5 only video 1 contributes; 0.2-0.4 averages both
    assert np.isclose(mean[0], 10.0)
    assert np.isclose(mean[-1], 50.0)
    assert np.isclose(mean[1], (20.0 + 40.0) / 2)


def test_plot_average_curves_writes_png(tmp_path):
    arr = np.zeros((2, 4, 5))
    arr[:, 0] = np.linspace(40, 20, 5)      # psnr
    arr[:, 1] = np.linspace(0.02, 0.4, 5)   # lpips
    arr[:, 2] = np.linspace(100, 2000, 5)   # fvd
    arr[:, 3] = np.linspace(0.9, 0.05, 5)   # bpp
    png = tmp_path / "avg.png"
    plot_average_curves(str(png), anchors_264=arr, anchors_265=arr * 1.01,
                        ours_bpps=[arr[0, 3]], ours_metrics={"psnr": [arr[0, 0]],
                                                             "lpips": [arr[0, 1]],
                                                             "fvd": [arr[0, 2]]})
    assert png.exists() and png.stat().st_size > 1000
