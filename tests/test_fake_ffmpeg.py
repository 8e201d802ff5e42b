"""Anchor harness through REAL subprocesses with a fake ffmpeg on PATH.

The stub tests in test_anchor_presets.py monkeypatch the python-level
ffmpeg_encode/ffmpeg_decode seams, which never exercises the actual command
lines. This file puts a fake `ffmpeg` executable on PATH and drives
`compress_and_evaluate` end-to-end (VERDICT r3 item 7: no real
libx264/libx265 binary exists in this environment, so the exact ffmpeg
argv and the yuv round-trip file plumbing are validated against the fake).

The fake logs every argv it receives (for command-line assertions, matching
reference benchmark/bench.py:436-441), "encodes" by containerizing the raw
payload with qp-dependent padding (so bpp-from-filesize is qp-monotone), and
"decodes" by unwrapping the container — so the decoded yuv is byte-identical
to the input and the colorspace round-trip is isolated.
"""

import json
import os
import stat
import subprocess
import sys

import numpy as np
import pytest

from tvc.bench import anchors as anchors_mod

FAKE_FFMPEG = r'''#!/usr/bin/env python3
import json, os, sys

args = sys.argv[1:]
with open(os.environ["FAKE_FFMPEG_LOG"], "a") as f:
    f.write(json.dumps(args) + "\n")


def val(flag):
    return args[args.index(flag) + 1]


out = args[-2] if args[-1] == "-y" else args[-1]
inp = val("-i")
if "-c:v" in args:  # encode
    qp = int(val("-crf"))
    data = open(inp, "rb").read()
    pad = b"\x00" * ((52 - qp) * 64)
    with open(out, "wb") as f:
        f.write(b"FAKE" + len(data).to_bytes(8, "little") + data + pad)
else:  # decode
    blob = open(inp, "rb").read()
    assert blob[:4] == b"FAKE", "decode input is not a fake container"
    n = int.from_bytes(blob[4:12], "little")
    open(out, "wb").write(blob[12:12 + n])
'''


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "ffmpeg"
    exe.write_text(FAKE_FFMPEG)
    exe.chmod(exe.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    log = tmp_path / "ffmpeg_argv.jsonl"
    log.write_text("")
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    monkeypatch.setenv("FAKE_FFMPEG_LOG", str(log))
    return log


def test_fake_ffmpeg_on_path(fake_ffmpeg):
    assert anchors_mod.have_ffmpeg()


@pytest.mark.parametrize("codec", ["libx264", "libx265"])
def test_compress_and_evaluate_real_subprocess(fake_ffmpeg, tmp_path, codec):
    rng = np.random.RandomState(0)
    video = rng.rand(4, 32, 48, 3).astype(np.float32)
    arr = anchors_mod.compress_and_evaluate(
        video, str(tmp_path / "work"), codec=codec, qp_range=[10, 30, 50],
        framerate=30)
    assert arr.shape == (4, 3)
    psnr_row, _, _, bpp_row = arr

    # the fake decode returns the encoder's input byte-identically, so any
    # PSNR loss comes from tvc's own yuv420 colorspace round-trip only
    assert np.all(psnr_row > 25.0), psnr_row
    assert np.allclose(psnr_row, psnr_row[0]), "decode should be qp-independent here"
    # bpp from filesize decreases with qp (fake pads inversely with crf)
    assert bpp_row[0] > bpp_row[1] > bpp_row[2] > 0

    # ---- exact command-line assertions (reference bench.py:436-441) ----
    calls = [json.loads(l) for l in open(fake_ffmpeg) if l.strip()]
    encodes = [c for c in calls if "-c:v" in c]
    decodes = [c for c in calls if "-c:v" not in c]
    assert len(encodes) == 3 and len(decodes) == 3

    for qp, argv in zip([10, 30, 50], encodes):
        s = " ".join(argv)
        assert f"-c:v {codec}" in s
        assert f"-crf {qp}" in s
        assert "-preset veryfast" in s
        assert "-tune zerolatency" in s
        assert "-f rawvideo" in s
        assert "-framerate 30" in s
        assert "-video_size 48x32" in s, "WxH order must be width x height"
        assert "-s 48x32" in s
        assert s.count("-pix_fmt yuv420p") == 2  # input AND output pix_fmt
        assert argv[-1] == "-y"
        assert argv[argv.index("-i") + 1].endswith("input.yuv")

    for argv in decodes:
        s = " ".join(argv)
        assert "-pix_fmt yuv420p" in s and "-f rawvideo" in s
        assert argv[argv.index("-i") + 1].endswith(f"_{codec}.mp4")
        assert argv[-2].endswith(".yuv")


def test_yuv_roundtrip_file_sizes(fake_ffmpeg, tmp_path):
    """The written raw yuv420 file must be exactly T*W*H*1.5 bytes and
    survive the encode/decode round-trip bit-exactly (fake codec is
    lossless), isolating tvc's planar IO from the colorspace math."""
    rng = np.random.RandomState(1)
    video = rng.rand(3, 16, 16, 3).astype(np.float32)
    work = tmp_path / "w"
    anchors_mod.compress_and_evaluate(video, str(work), codec="libx264",
                                      qp_range=[20], framerate=25)
    raw = (work / "input.yuv").read_bytes()
    rec = (work / "rec_qp20.yuv").read_bytes()
    assert len(raw) == 3 * 16 * 16 * 3 // 2
    assert raw == rec, "yuv round-trip through the subprocess path not bit-exact"


def test_gray_pix_fmt_subprocess(fake_ffmpeg, tmp_path):
    """SMM preset geometry: gray plane coding (-pix_fmt gray, bench_smm.py:130)."""
    rng = np.random.RandomState(2)
    video = rng.rand(3, 64, 64, 3).astype(np.float32)
    arr = anchors_mod.compress_and_evaluate(
        video, str(tmp_path / "g"), codec="libx265", qp_range=[30],
        pix_fmt="gray")
    # gray plane has no colorspace round-trip, and the fake codec is
    # lossless, so PSNR is infinite — the distinctive signature that the
    # file plumbing was bit-exact
    assert arr.shape == (4, 1) and np.isposinf(arr[0, 0])
    calls = [json.loads(l) for l in open(fake_ffmpeg) if l.strip()]
    assert any("-pix_fmt gray" in " ".join(c) for c in calls)
    raw = (tmp_path / "g" / "input.yuv").read_bytes()
    assert len(raw) == 3 * 64 * 64  # single plane
