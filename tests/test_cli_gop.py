"""CLI-level transmissible GOP protocol test: `tvc gop send` -> payload file
-> `tvc gop receive` in a fresh coder/predictor instance reproduces the
sender's reconstruction byte-identically (the deterministic-regeneration
property, tvc/pipeline/receiver.py)."""

import numpy as np
import pytest

from tvc.cli import main as cli_main

TINY_MODS = [
    "data.image_size=64", "data.num_frames=3", "data.num_frames_cond=2",
    "model.ngf=16", "model.ch_mult=(1,2)", "model.num_res_blocks=1",
    "model.attn_resolutions=(32,)", "model.n_head_channels=8",
    "model.num_classes=20", "sampling.subsample=5",
    "codec.N=32", "codec.M=48", "codec.groups=(8,8,32)",
]


@pytest.mark.heavy
def test_gop_send_receive_byte_identity(tmp_path, capsys):
    video = np.random.RandomState(9).rand(8, 64, 64, 3).astype(np.float32)
    vp = tmp_path / "video.npy"
    np.save(vp, video)
    payload = str(tmp_path / "gop.tvcg.npz")
    sent = str(tmp_path / "sender.npy")
    recv = str(tmp_path / "recv.npy")

    # no LPIPS weights in this environment: send refuses without the
    # explicit uncalibrated opt-in (city_sender.py:302 always loads weights)
    rc = cli_main(["gop", "send", "--video-npy", str(vp), "--payload", payload,
                   "--threshold", "0.5", "--num-frames", "8",
                   "--config-mod", *TINY_MODS, "--output-npy", sent])
    assert rc == 2

    rc = cli_main(["gop", "send", "--video-npy", str(vp), "--payload", payload,
                   "--threshold", "0.5", "--num-frames", "8",
                   "--config-mod", *TINY_MODS, "--output-npy", sent,
                   "--allow-uncalibrated"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[gop send]" in out and "bpp=" in out

    rc = cli_main(["gop", "receive", "--video-npy", str(vp), "--payload", payload,
                   "--config-mod", *TINY_MODS, "--output-npy", recv])
    assert rc == 0

    a, b = np.load(sent), np.load(recv)
    assert a.shape == b.shape == (8, 64, 64, 3)
    assert a.tobytes() == b.tobytes(), "receiver reconstruction not byte-identical"


@pytest.mark.heavy
def test_gop_send_device_gop_receive_byte_identity(tmp_path, capsys):
    """`tvc gop send --device-gop` (the production latency path) emits a
    payload a standard receiver reconstructs BYTE-identically — the sender's
    prediction runs the same jitted sampler executable the receiver runs
    (VERDICT r4 item 1). Each cli_main call builds fresh model/jit instances,
    so this exercises the cross-instance determinism the cross-process
    contract rests on."""
    video = np.random.RandomState(10).rand(8, 64, 64, 3).astype(np.float32)
    vp = tmp_path / "video.npy"
    np.save(vp, video)
    payload = str(tmp_path / "gop_dev.tvcg.npz")
    sent = str(tmp_path / "sender_dev.npy")
    recv = str(tmp_path / "recv_dev.npy")

    rc = cli_main(["gop", "send", "--video-npy", str(vp), "--payload", payload,
                   "--threshold", "0.5", "--num-frames", "8",
                   "--config-mod", *TINY_MODS, "--output-npy", sent,
                   "--device-gop", "--allow-uncalibrated"])
    assert rc == 0
    assert "[gop send]" in capsys.readouterr().out

    rc = cli_main(["gop", "receive", "--video-npy", str(vp), "--payload", payload,
                   "--config-mod", *TINY_MODS, "--output-npy", recv])
    assert rc == 0

    a, b = np.load(sent), np.load(recv)
    assert a.shape == b.shape == (8, 64, 64, 3)
    assert a.tobytes() == b.tobytes(), "receiver reconstruction not byte-identical"


@pytest.mark.heavy
def test_gop_receive_refuses_env_mismatch(tmp_path, capsys, monkeypatch):
    """Sampler-numerics env flags are stamped into the payload; a receiver
    running with different flags must refuse (it would silently regenerate
    different frames)."""
    video = np.random.RandomState(11).rand(6, 64, 64, 3).astype(np.float32)
    vp = tmp_path / "video.npy"
    np.save(vp, video)
    payload = str(tmp_path / "gop_env.tvcg.npz")

    rc = cli_main(["gop", "send", "--video-npy", str(vp), "--payload", payload,
                   "--threshold", "-1", "--num-frames", "6",
                   "--config-mod", *TINY_MODS, "--allow-uncalibrated"])
    assert rc == 0
    capsys.readouterr()

    monkeypatch.setenv("TVC_FUSED_FIR", "1")  # sender ran with the default 0
    rc = cli_main(["gop", "receive", "--video-npy", str(vp),
                   "--payload", payload, "--config-mod", *TINY_MODS])
    assert rc == 2
    assert "env_fused_fir" in capsys.readouterr().err

    monkeypatch.delenv("TVC_FUSED_FIR")
    rc = cli_main(["gop", "receive", "--video-npy", str(vp),
                   "--payload", payload, "--config-mod", *TINY_MODS])
    assert rc == 0
