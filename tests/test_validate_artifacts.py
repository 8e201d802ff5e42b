"""`tvc validate` harness tests (VERDICT r3 item 1).

The harness itself (skip plumbing, report, exit codes) is tested
unconditionally; each real-artifact check runs when its artifact is present
— today that is only the LPIPS linear heads, which SHIP with the reference
(`weights/v0.1/alex.pth`), so that check runs for real in this environment.
The remaining checks are env-gated exactly like
tests/test_metrics.py::test_fvd_golden_zeros_vs_ones:

  TVC_DIFFUSION_CKPT=...  -> check_diffusion_ckpt (eps parity vs torch ref)
  TVC_CODEC_CKPTS=a,b,... -> check_codec_ckpts (roundtrip + torch parity)
  TVC_I3D_CKPT=...        -> check_i3d (FVD golden 151.17)
  TVC_LPIPS_ALEX=...      -> check_lpips full-backbone parity

All of these call the SAME functions the CLI runs, so the suite and
`tvc validate` cannot drift apart.
"""

import json
import os

import numpy as np
import pytest

from tvc.utils import validate as V

REF_LIN = "/root/reference/weights/v0.1/alex.pth"


def test_report_exit_codes_and_json(tmp_path, capsys):
    results = [
        V._result("a", "pass", "ok"),
        V._result("b", "skip", "nothing"),
    ]
    out = tmp_path / "r.json"
    assert V.report(results, str(out)) == 0
    blob = json.load(open(out))
    assert blob["summary"] == {**blob["summary"], "pass": 1, "skip": 1, "fail": 0}

    results.append(V._result("c", "fail", "boom"))
    assert V.report(results) == 1


def test_guard_converts_exceptions_to_fail():
    @V._guard("x")
    def boom():
        raise RuntimeError("kaput")

    r = boom()
    assert r["status"] == "fail" and "kaput" in r["detail"]


def test_all_checks_skip_without_artifacts():
    res = V.run_validation()
    assert [r["status"] for r in res] == ["skip"] * len(res)
    assert V.report(res) == 0  # skips are not failures


@pytest.mark.skipif(not os.path.exists(REF_LIN),
                    reason="reference LPIPS heads not mounted")
def test_lpips_heads_check_runs_on_real_artifact():
    """The one real artifact that exists in this environment: the reference's
    shipped LPIPS linear heads. The check must convert all 5 heads
    bit-exactly."""
    r = V.check_lpips(None, REF_LIN)
    assert r["status"] == "pass", r["detail"]
    assert r["metrics"]["lin_heads"] == 5


def test_lpips_netlin_parity_with_synthetic_backbone(tmp_path):
    """Full net-lin parity path: generate a random torchvision-layout alexnet
    state dict + random heads, run the check — the torch-built trunk oracle
    vs the Flax LPIPS must agree, proving the conversion+distance math for
    when the real torchvision backbone lands."""
    torch = pytest.importorskip("torch")

    g = torch.Generator().manual_seed(0)
    convs = {0: (64, 3, 11), 3: (192, 64, 5), 6: (384, 192, 3),
             8: (256, 384, 3), 10: (256, 256, 3)}
    sd = {}
    for cid, (co, ci, k) in convs.items():
        sd[f"features.{cid}.weight"] = torch.randn((co, ci, k, k), generator=g) * 0.05
        sd[f"features.{cid}.bias"] = torch.randn((co,), generator=g) * 0.05
    alex = tmp_path / "alex_backbone.pth"
    torch.save(sd, alex)
    lin = {f"lin{k}.model.1.weight":
           torch.rand((1, c, 1, 1), generator=g)
           for k, c in enumerate([64, 192, 384, 256, 256])}
    linp = tmp_path / "lin.pth"
    torch.save(lin, linp)

    r = V.check_lpips(str(alex), str(linp))
    assert r["status"] == "pass", r["detail"]
    assert r["metrics"]["netlin_max_rel"] < 1e-4


def test_cli_validate_smoke(capsys):
    from tvc.cli import main as cli_main

    rc = cli_main(["validate", "--lpips-lin", REF_LIN]
                  if os.path.exists(REF_LIN) else ["validate"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[validate]" in out and "skip" in out


# ---- env-gated real-artifact checks (wired to the same functions) ----


@pytest.mark.skipif(not os.environ.get("TVC_DIFFUSION_CKPT"),
                    reason="set TVC_DIFFUSION_CKPT=/path/checkpoint_900000.pt")
def test_real_diffusion_checkpoint():
    r = V.check_diffusion_ckpt(os.environ["TVC_DIFFUSION_CKPT"])
    assert r["status"] == "pass", r["detail"]


@pytest.mark.skipif(not os.environ.get("TVC_CODEC_CKPTS"),
                    reason="set TVC_CODEC_CKPTS=0.pth.tar,...,5.pth.tar")
def test_real_codec_checkpoints():
    r = V.check_codec_ckpts(os.environ["TVC_CODEC_CKPTS"].split(","))
    assert r["status"] == "pass", r["detail"]


@pytest.mark.skipif(not os.environ.get("TVC_I3D_CKPT"),
                    reason="set TVC_I3D_CKPT=/path/to/i3d.pt")
def test_real_i3d_golden():
    r = V.check_i3d(os.environ["TVC_I3D_CKPT"])
    assert r["status"] == "pass", r["detail"]


@pytest.mark.skipif(not os.environ.get("TVC_LPIPS_ALEX"),
                    reason="set TVC_LPIPS_ALEX=/path/torchvision_alexnet.pth")
def test_real_lpips_backbone():
    r = V.check_lpips(os.environ["TVC_LPIPS_ALEX"],
                      REF_LIN if os.path.exists(REF_LIN) else None)
    assert r["status"] == "pass", r["detail"]


# ---- harness end-to-end on SYNTHETIC artifacts in the reference's formats --
# These prove the validation machinery itself (load layout, conversion,
# oracle comparison) works before the real artifacts exist.


def _tiny_cfg():
    from tvc.core.config import Config

    cfg = Config()
    cfg.data.image_size = 16
    cfg.data.num_frames = 2
    cfg.data.num_frames_cond = 1
    cfg.model.ngf = 16
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (8,)
    cfg.model.n_head_channels = 8
    return cfg


@pytest.mark.skipif(not os.path.isdir("/root/reference/models"),
                    reason="reference tree not mounted")
def test_harness_on_synthetic_diffusion_checkpoint(tmp_path):
    """Build a checkpoint in the reference's EXACT on-disk layout — a list
    with [0] = DataParallel state dict ('module.' prefixes) and [-1] = the
    EMAHelper shadow (bare parameter names; see the key-migration comment at
    reference models/ema.py:51-58) — and run check_diffusion_ckpt end to
    end: load, EMA apply, conversion, eps parity vs the reference model."""
    torch = pytest.importorskip("torch")
    import sys

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from models.better.ncsnpp_more import UNetMore_DDPM as RefWrap

    cfg = _tiny_cfg()
    g = torch.Generator().manual_seed(5)

    def randomized():
        m = RefWrap(V.ref_namespace(cfg)).eval()
        sd = {k: torch.randn(v.shape, generator=g) * 0.08
              if v.is_floating_point() else v for k, v in m.state_dict().items()}
        m.load_state_dict(sd)
        return m

    base, ema_src = randomized(), randomized()
    sd0 = {"module." + k: v for k, v in base.state_dict().items()}
    ema_sd = {k: p.data.clone() for k, p in ema_src.named_parameters()
              if p.requires_grad}
    path = tmp_path / "checkpoint_900000.pt"
    torch.save([sd0, {"step": 900000}, ema_sd], path)

    r = V.check_diffusion_ckpt(str(path), cfg=cfg, tol=1e-4)
    assert r["status"] == "pass", r["detail"]
    assert r["metrics"]["eps_max_rel"] < 1e-4
    # EMA weights (not the raw sd) must be what's compared: if the harness
    # had loaded states[0] on one side only, parity would fail loudly since
    # base and ema_src are different random draws


@pytest.mark.skipif(not os.path.isdir("/root/reference/models"),
                    reason="reference tree not mounted")
def test_synthetic_i3d_state_dict_loads_and_calibrates(tmp_path):
    """A random-weight state dict in the reference pytorch_i3d layout loads
    through the same conversion path check_i3d uses (FVDMetric), flips
    `calibrated`, and produces finite features. The full FVD(0,1)=151.17
    golden is too heavy for this host's CPU (30x224^2 I3D x 16 clips), so
    it stays behind the TVC_I3D_CKPT gate for the real weights."""
    torch = pytest.importorskip("torch")
    import sys

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from models.fvd.pytorch_i3d import InceptionI3d as RefI3D

    from tvc.metrics.fvd import FVDMetric

    m = RefI3D(400, in_channels=3)
    g = torch.Generator().manual_seed(6)

    def rand_like(k, v):
        if not v.is_floating_point():
            return v
        if "running_var" in k:  # BN variances must stay positive
            return torch.rand(v.shape, generator=g) + 0.5
        return torch.randn(v.shape, generator=g) * 0.05

    sd = {k: rand_like(k, v) for k, v in m.state_dict().items()}
    path = tmp_path / "i3d.pt"
    torch.save(sd, path)

    metric = FVDMetric(torch.load(path, map_location="cpu"))
    assert metric.calibrated
    feats = metric.features(np.random.RandomState(0).rand(1, 10, 64, 64, 3)
                            .astype(np.float32))
    assert feats.shape == (1, 400) and np.isfinite(feats).all()


def test_harness_on_synthetic_codec_checkpoint(tmp_path):
    """A .pth.tar in the reference TestModel key layout (the same synthetic
    generator the conversion tests use) runs check_codec_ckpts end to end:
    load, CDF freeze, real compress->decompress byte-identity, bpp/PSNR."""
    torch = pytest.importorskip("torch")

    from tests.test_convert import _synthetic_elic_sd
    from tvc.core.config import CodecConfig

    groups = (4, 4, 4, 4, 8)
    sd = _synthetic_elic_sd(N=16, M=24, groups=groups)
    path = tmp_path / "0.pth.tar"
    torch.save(sd, path)

    cfg = CodecConfig(N=16, M=24, groups=groups)
    r = V.check_codec_ckpts([str(path)], codec_cfg=cfg)
    assert r["status"] == "pass", r["detail"]
    assert "byte-identical" in r["detail"]
    assert r["metrics"]["q0_bpp"] > 0


def test_judge_rd_point_pass_and_fail():
    """check_rd_point's numeric criterion (VERDICT r4 item 4): a healthy
    point passes; bpp out of walk range, weak PSNR, or bad LPIPS each fail."""
    ok, d = V.judge_rd_point(bpp=0.06, psnr=23.7, lpips=0.12)
    assert ok, d
    # single-video noise within 2 sigma still passes
    ok, _ = V.judge_rd_point(bpp=0.25, psnr=19.0, lpips=0.17)
    assert ok
    # bpp outside the walk's own operating range (reference breaks at 1.0)
    ok, d = V.judge_rd_point(bpp=1.3, psnr=30.0, lpips=0.05)
    assert not ok and "bpp" in d
    ok, d = V.judge_rd_point(bpp=0.0, psnr=30.0, lpips=0.05)
    assert not ok
    # quality regressions beyond 2 sigma fail
    ok, d = V.judge_rd_point(bpp=0.06, psnr=18.0, lpips=0.12)
    assert not ok and "PSNR" in d
    ok, d = V.judge_rd_point(bpp=0.06, psnr=23.7, lpips=0.20)
    assert not ok and "LPIPS" in d


def test_judge_bpp_monotone_pass_and_fail():
    ok, _ = V.judge_bpp_monotone([0.1, 0.2, 0.3, 0.6, 1.1, 2.0])
    assert ok
    # adjacent noise within the 0.8 slack passes
    ok, _ = V.judge_bpp_monotone([0.10, 0.09, 0.12])
    assert ok
    # swapped checkpoint order (q5 first) FAILS
    ok, d = V.judge_bpp_monotone([2.0, 0.1, 0.2])
    assert not ok and "codec-ckpts" in d
    ok, _ = V.judge_bpp_monotone([0.3])
    assert ok  # single point: nothing to judge


@pytest.mark.skipif(not os.path.isdir("/root/reference/models"),
                    reason="reference tree not mounted")
def test_bf16_drift_uncalibrated_is_skip(tmp_path):
    """Without a calibrated LPIPS the bf16 check judges nothing: it must
    report skip (informational), never pass (VERDICT r4 weak item 5)."""
    torch = pytest.importorskip("torch")
    import sys

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from models.better.ncsnpp_more import UNetMore_DDPM as RefWrap

    cfg = _tiny_cfg()
    cfg.model.num_classes = 10
    cfg.sampling.subsample = 3
    m = RefWrap(V.ref_namespace(cfg)).eval()
    g = torch.Generator().manual_seed(6)
    sd = {k: torch.randn(v.shape, generator=g) * 0.08
          if v.is_floating_point() else v for k, v in m.state_dict().items()}
    ema_sd = {k: v.clone() for k, v in sd.items()}
    pt = tmp_path / "ckpt.pt"
    torch.save([{"module." + k: v for k, v in sd.items()}, {"step": 1}, ema_sd], pt)

    r = V.check_bf16_drift(str(pt), cfg=cfg, lpips_metric=None)
    assert r["status"] == "skip", r
    assert "informational" in r["detail"]
    assert np.isfinite(r["metrics"]["endpoint_mean_abs_drift"])


REF_LIN_VGG = "/root/reference/weights/v0.1/vgg.pth"
REF_LIN_SQUEEZE = "/root/reference/weights/v0.1/squeeze.pth"


@pytest.mark.skipif(not os.path.exists(REF_LIN_VGG),
                    reason="reference vgg LPIPS heads not mounted")
def test_lpips_vgg_heads_check_runs_on_real_artifact():
    """The reference also ships vgg linear heads (weights/v0.1/vgg.pth,
    models/dist_model.py model_path default) — all 5 convert bit-exactly
    (VERDICT r4 item 3b)."""
    r = V.check_lpips(None, REF_LIN_VGG, net_type="vgg")
    assert r["status"] == "pass", r["detail"]
    assert r["name"] == "lpips-vgg"
    assert r["metrics"]["lin_heads"] == 5


@pytest.mark.skipif(not os.path.exists(REF_LIN_SQUEEZE),
                    reason="reference squeeze LPIPS heads not mounted")
def test_lpips_squeeze_heads_check_runs_on_real_artifact():
    """squeeze ships SEVEN heads (lin0..lin6) — the check derives the count
    from the architecture and validates all of them bit-exactly."""
    r = V.check_lpips(None, REF_LIN_SQUEEZE, net_type="squeeze")
    assert r["status"] == "pass", r["detail"]
    assert r["metrics"]["lin_heads"] == 7


@pytest.mark.skipif(not os.path.exists(REF_LIN_VGG),
                    reason="reference vgg LPIPS heads not mounted")
def test_lpips_head_count_mismatch_fails():
    """Feeding the 5-head vgg file to the 7-head squeeze architecture must
    FAIL (missing heads), not silently pass on a prefix."""
    r = V.check_lpips(None, REF_LIN_VGG, net_type="squeeze")
    assert r["status"] == "fail"
    assert "lin5" in r["detail"]


@pytest.mark.skipif(not os.path.exists(REF_LIN_SQUEEZE),
                    reason="reference squeeze LPIPS heads not mounted")
def test_lpips_extra_heads_fail():
    """The 7-head squeeze file fed to the 5-head alex architecture must FAIL
    (a prefix match would green-light the wrong artifact)."""
    r = V.check_lpips(None, REF_LIN_SQUEEZE, net_type="alex")
    assert r["status"] == "fail"
    assert "extra heads" in r["detail"]
