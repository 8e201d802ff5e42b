"""Whole-GOP-on-device program tests (tiny models, CPU).

Invariants + trajectory parity against the host loop (run_gop) with the same
PRNGKey — the fused program mirrors its key-split order exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvc.core.config import Config
from tvc.metrics.lpips import LPIPSMetric
from tvc.models.codec.coding import ELICCoder
from tvc.models.codec.elic import ELICModel
from tvc.pipeline.fused_gop import FusedGOPSender
from tvc.pipeline.predictor import FramePredictor
from tvc.pipeline.sender import Sender, run_gop

RNG = np.random.RandomState(3)
T_TOTAL = 10


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


@pytest.fixture(scope="module")
def fused_setup():
    cfg = tiny_cfg()
    predictor = FramePredictor.create(cfg, jax.random.PRNGKey(0))
    model = ELICModel(N=32, M=48, groups=(8, 8, 32))
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    coder = ELICCoder(model, variables)
    lp = LPIPSMetric.create()
    sender = FusedGOPSender(cfg=cfg, predictor=predictor, coder=coder,
                            lpips=lp, num_frames_total=T_TOTAL)
    video = RNG.rand(T_TOTAL, 64, 64, 3).astype(np.float32)
    return cfg, predictor, coder, lp, sender, video


def test_accept_all(fused_setup):
    """threshold=inf accepts every prediction: d = [1,1,0,...], only the
    initial pair is transmitted."""
    cfg, _, _, _, sender, video = fused_setup
    out = sender.run(video, jax.random.PRNGKey(7), threshold=np.inf)
    d = np.asarray(out["d"])
    assert d.tolist() == [1, 1] + [0] * (T_TOTAL - 2)
    assert float(out["bits"]) > 0
    # ceil((10-2)/3) = 3 updates
    assert int(out["n_updates"]) == 3
    acc = np.asarray(out["accepts"])
    assert acc[:3].tolist() == [3, 3, 2]  # last update clamped by frames left
    x = np.asarray(out["x_ge"])
    assert x.shape == (T_TOTAL, 64, 64, 3)
    assert np.isfinite(x).all()


def test_reject_all_falls_back(fused_setup):
    """threshold=-inf rejects every prediction: every frame transmitted."""
    cfg, _, _, _, sender, video = fused_setup
    out = sender.run(video, jax.random.PRNGKey(7), threshold=-np.inf)
    d = np.asarray(out["d"])
    assert d.tolist() == [1] * T_TOTAL
    assert int(out["n_updates"]) == (T_TOTAL - 2) // 2
    assert float(out["bits"]) > 0


def test_forced_accepts_pattern(fused_setup):
    cfg, _, _, _, sender, video = fused_setup
    out = sender.run(video, jax.random.PRNGKey(7), threshold=np.inf,
                     forced_accepts=[0, 3, 0, 3])
    d = np.asarray(out["d"])
    # 2 init + fallback 2 + gen 3 + fallback 2 + gen 1(clamp 3->valid)
    assert d.tolist() == [1, 1, 1, 1, 0, 0, 0, 1, 1, 0]


def test_matches_host_loop_trajectory(fused_setup):
    """Same key + threshold=inf: fused x_ge matches the host run_gop
    (exact=False fused codec) frame-for-frame within tolerance."""
    cfg, predictor, coder, lp, sender, video = fused_setup
    key = jax.random.PRNGKey(21)
    out = sender.run(video, key, threshold=np.inf)
    host_sender = Sender(threshold=np.inf, cfg=cfg, predictor=predictor, lpips=lp)
    gop = run_gop(host_sender, coder, video, key, T_TOTAL, cfg.codec.patch)
    assert np.asarray(out["d"]).tolist() == [int(v) for v in gop.d[0]]
    fused_x = np.asarray(out["x_ge"])
    np.testing.assert_allclose(fused_x, gop.x_ge[0], atol=2e-3)
    # likelihood-estimate bits are the entropy-estimation bpp
    # (Network.py:534-640). Under RANDOM-INIT params the two legitimately
    # deviate in BOTH directions: the real coder rounds predicted scales UP
    # to the 64-entry table (cheaper than the raw-scale likelihood when
    # residuals are heavy-tailed, as they are under random weights) and
    # bypass-codes extreme outliers at capped cost, while near-boundary
    # scales pay a table-quantization premium. Measured here: est/real
    # ~1.19. The CALIBRATED bound lives where it is measurable —
    # test_entropy.py::test_gaussian_rate_estimate_calibrated_on_table_scales
    # asserts <6% with scales on table entries. This band just pins the
    # estimate to the right scale.
    est, real = float(out["bits"]), float(gop.bits)
    assert 0.6 < est / real < 1.5, (est, real)


def test_rate_sweep_fused_path(fused_setup):
    """rate_sweep(fused=...) produces RatePoints through the device program."""
    from tvc.pipeline.sender import rate_sweep

    cfg, predictor, coder, lp, sender, video = fused_setup
    points = rate_sweep(
        cfg, video, {0: coder}, predictor, lp, fvd_metric=None,
        qualities=(0,), thresholds=[np.inf], num_frames_total=T_TOTAL,
        bpp_stop=np.inf, verbose=False, fused=sender)
    assert len(points) == 1
    p = points[0]
    assert p.d == [1, 1] + [0] * (T_TOTAL - 2)
    assert p.bpp > 0 and np.isfinite(p.lpips_list).all()


@pytest.mark.heavy
def test_run_sharded_on_mesh(fused_setup):
    """Chains shard over the mesh data axis (8 virtual CPU devices)."""
    from tvc.parallel.mesh import make_mesh

    cfg, _, _, _, sender, video = fused_setup
    mesh = make_mesh(cfg.mesh)
    dp = mesh.shape["data"]
    B = dp  # one chain per data-axis slot
    videos = np.stack([video] * B)
    keys = jnp.stack([jax.random.PRNGKey(100 + i) for i in range(B)])
    thresholds = np.full((B,), np.inf, np.float32)
    with mesh:
        out = sender.run_sharded(mesh, videos, keys, thresholds)
    d = np.asarray(out["d"])
    assert d.shape == (B, T_TOTAL)
    assert (d == ([1, 1] + [0] * (T_TOTAL - 2))).all()


@pytest.mark.heavy
def test_batched_matches_single(fused_setup):
    cfg, _, _, _, sender, video = fused_setup
    videos = np.stack([video, video[::-1].copy()])
    keys = jnp.stack([jax.random.PRNGKey(5), jax.random.PRNGKey(6)])
    thresholds = np.asarray([np.inf, -np.inf], np.float32)
    out = sender.run_batched(videos, keys, thresholds)
    d = np.asarray(out["d"])
    assert d.shape == (2, T_TOTAL)
    assert d[0].tolist() == [1, 1] + [0] * (T_TOTAL - 2)
    assert d[1].tolist() == [1] * T_TOTAL
    # lane 0 must equal the single-chain run with the same key
    single = sender.run(video, jax.random.PRNGKey(5), threshold=np.inf)
    np.testing.assert_allclose(np.asarray(out["x_ge"])[0],
                               np.asarray(single["x_ge"]), atol=1e-4)


def test_replicated_params_cache_identity(fused_setup):
    """run_sharded's replicated-params cache is identity-keyed with STRONG
    references (VERDICT r4 item 5): same trees hit, an equal-but-distinct
    tree misses (fresh replication), and cached source trees cannot be
    GC'd out from under their entry (so a recycled id() can never alias)."""
    import copy
    import gc
    import weakref

    from jax.sharding import NamedSharding, PartitionSpec as P

    from tvc.parallel.mesh import make_mesh

    cfg, predictor, coder, lp, sender, _ = fused_setup
    mesh = make_mesh(cfg.mesh)
    repl = NamedSharding(mesh, P())
    pv, cv = predictor.variables, coder.variables

    lv = {"x": np.ones((2,), np.float32)}
    i0, rep0, _ = sender._replicated_params(mesh, pv, cv, lv, repl)
    i1, rep1, _ = sender._replicated_params(mesh, pv, cv, lv, repl)
    assert i0 == i1 and rep0 is rep1  # identity hit

    # structurally equal but distinct tree -> MISS (fresh replication)
    lv2 = copy.deepcopy(lv)
    i2, rep2, _ = sender._replicated_params(mesh, pv, cv, lv2, repl)
    assert i2 != i0 and rep2 is not rep0

    # the cache keeps its source trees alive: dropping our reference must
    # not free the tree's leaves (id recycling would otherwise be possible);
    # weakref the numpy leaf (dicts aren't weakref-able)
    ref = weakref.ref(lv2["x"])
    del lv2
    gc.collect()
    assert ref() is not None

    # the no-LPIPS sentinel is stable across calls (ADVICE r4: a fresh {}
    # per call would re-replicate + recompile every time)
    assert sender._empty_lp is sender._empty_lp
    sender._param_entries.clear()
