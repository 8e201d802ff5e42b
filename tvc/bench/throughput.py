"""Throughput harness: frames/s/chip for the end-to-end pipeline.

Measures the two cost centers of the sender (SURVEY.md §3):
1. one diffusion prediction cycle — a full subsampled-DDPM sampling sweep of
   the 262M-parameter UNet producing 5 frames (>99% of FLOPs);
2. one keyframe pair through the ELIC codec. BOTH codec paths are timed and
   logged: `exact` (the transmissible bitstream path — host-CPU
   entropy-parameter programs + host rANS, what a real receiver decodes) and
   `fused` (single-device-program simulation). The GOP headline uses the
   exact path, matching the reference's real-bitstream semantics
   (Network.py:336-441 runs rANS encode+decode inside its sweep).

The reference's worst case is ~240 s per 30-frame video (~0.125 frames/s):
<=5 generation cycles x 100 DDPM steps plus keyframe codings (BASELINE.md).
The same GOP model here: t_gop = 5 * t_cycle + 3 * t_keyframe_pair
(initial pair + up to two fallback pairs), fps = 30 * batch / t_gop.

Timing methodology: every measured call ends in a host fetch (np.asarray) —
on the axon remote backend `block_until_ready` can return before the compute
finishes, so device-side timing alone under-reports.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tvc.core.config import Config


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


@dataclasses.dataclass
class BenchResult:
    t_unet_step: float
    t_cycle: float
    t_keyframe_pair: float        # exact transmissible path (GOP headline)
    fps_gop: float
    n_sample_steps: int
    compile_time: float
    t_keyframe_pair_fused: float = 0.0  # fused device-simulation path
    # lockstep-batched serving path (tvc/pipeline/batched.py): B GOP chains
    # share every sampler sweep, amortizing the weight streaming that bounds
    # the B=1 latency path
    throughput_batch: int = 0
    t_cycle_batched: float = 0.0
    t_keyframes_batched: float = 0.0
    fps_throughput: float = 0.0
    # whole-GOP-on-device program (tvc/pipeline/fused_gop.py): one device call
    # encodes a full 30-frame GOP (sampling + LPIPS decisions + fallback
    # keyframes); wall is normalized to the 100-step budget
    t_fused_gop: float = 0.0      # wall for the forced worst-case trajectory
    fused_gop_cycles: int = 0     # sampler sweeps in that trajectory
    fps_fused_gop: float = 0.0
    # device-resident REAL GOP: same trajectory, exact transmissible
    # keyframe streams (host rANS), predictions device-resident, one scalar
    # fetch per cycle — the honest end-to-end transmissible wall
    t_device_gop: float = 0.0
    fps_device_gop: float = 0.0
    # same-window sampler-serial bound + variance band (VERDICT r4 item 2):
    # the bound's t_cycle is sampled adjacent to the GOP reps so sampler
    # drift doesn't masquerade as GOP overhead
    fps_device_gop_bound: float = 0.0
    device_gop_overhead_ms: float = 0.0
    t_device_gop_min: float = 0.0
    t_device_gop_max: float = 0.0
    # accept-all trajectory (prediction succeeds every cycle: 6 sweeps + the
    # initial keyframe pair only) — the typical-success-case latency, vs the
    # worst-case headline above
    t_device_gop_acceptall: float = 0.0
    fps_device_gop_acceptall: float = 0.0


def bench_pipeline(
    subsample: Optional[int] = None,
    dtype=jnp.bfloat16,
    include_codec: bool = True,
    batch: int = 1,
    seed: int = 0,
    throughput_batch: int = 8,
    fused_gop: bool = True,
    precision_schedule: str = "",
) -> BenchResult:
    from tvc.pipeline.predictor import FramePredictor

    cfg = Config()
    if subsample is not None:
        cfg.sampling.subsample = subsample
    n_steps = cfg.sampling.subsample

    _log("building flagship predictor (fast init)")
    if precision_schedule:
        # mixed f32/bf16 schedule needs f32 master params (the first K
        # steps run through the f32 UNet over the same variables)
        cfg.sampling.precision_schedule = precision_schedule
        _log(f"precision schedule: {precision_schedule} (f32 masters)")
        predictor = FramePredictor.create(cfg, jax.random.PRNGKey(seed),
                                          dtype=dtype, fast_init=True)
    else:
        predictor = FramePredictor.create(cfg, jax.random.PRNGKey(seed), dtype=dtype,
                                          fast_init=True, params_dtype=dtype)
    size = cfg.data.image_size
    c = cfg.data.channels
    cond = jnp.zeros((batch, size, size, c * cfg.data.num_frames_cond), dtype)

    # codec compile runs in a worker thread concurrently with the sampler
    # compile — the GIL is released while XLA compiles, so the (slow) remote
    # compile service processes both in parallel. The worker ONLY compiles:
    # timing reps run serially in the main thread afterwards, because the
    # codec's device calls contend with the sampler for the single chip and
    # inflate t_pair by ~2x when timed concurrently.
    codec_result = {}

    def codec_worker():
        try:
            from tvc.models.codec.coding import ELICCoder
            from tvc.models.codec.elic import ELICModel
            from tvc.pipeline.keyframe import code_frames
            from tvc.utils.fastinit import fast_init

            _log("codec: building full-size ELIC coder (host-side init)")
            model = ELICModel()
            variables = fast_init(model, jnp.zeros((1, 128, 128, 3)), seed=3)
            coder = ELICCoder(model, variables)
            frames = np.random.RandomState(0).rand(2, 128, 128, 3).astype(np.float32)
            t0 = time.time()
            code_frames(coder, frames, exact=True)   # compile exact-path stages
            code_frames(coder, frames, exact=False)  # compile fused program
            _log(f"codec: compiled+ran in {time.time() - t0:.1f}s")
            codec_result["coder"] = coder
            codec_result["frames"] = frames
        except Exception as e:  # pragma: no cover
            codec_result["error"] = repr(e)
            _log(f"codec worker failed: {e!r}")

    worker = None
    if include_codec:
        import threading

        worker = threading.Thread(target=codec_worker)
        worker.start()

    _log(f"compiling {n_steps}-step sampler")
    t0 = time.time()
    np.asarray(predictor.generate(jax.random.PRNGKey(1), cond))  # compile + fetch
    compile_time = time.time() - t0
    _log(f"sampler compiled+ran in {compile_time:.1f}s")

    reps = 3
    t0 = time.time()
    for i in range(reps):
        np.asarray(predictor.generate(jax.random.PRNGKey(2 + i), cond))
    t_cycle = (time.time() - t0) / reps
    t_step = t_cycle / (n_steps + 1)  # +1: final denoise step
    _log(f"steady cycle: {t_cycle:.3f}s ({t_step * 1e3:.2f} ms/step)")

    t_pair = t_pair_fused = 0.0
    if worker is not None:
        worker.join()
        if "coder" in codec_result:
            from tvc.pipeline.keyframe import code_frames

            coder = codec_result["coder"]
            frames = codec_result["frames"]

            def time_pair(exact: bool) -> float:
                times = []
                for _ in range(5):
                    t0 = time.time()
                    code_frames(coder, frames, exact=exact)
                    times.append(time.time() - t0)
                return float(np.median(times))

            t_pair = time_pair(exact=True)
            t_pair_fused = time_pair(exact=False)
            _log(f"codec: keyframe pair exact={t_pair:.3f}s "
                 f"fused={t_pair_fused:.3f}s (medians of 5; GOP model uses "
                 f"the exact transmissible path)")

    # scale a measured cycle to the reference's 100-step budget if subsampled;
    # the fixed per-call dispatch overhead (remote-tunnel RTT on axon) must
    # not be multiplied by the step-count ratio
    t_step_clean = t_step
    if n_steps < 100:
        noop = jax.jit(lambda x: x + 1.0)
        operand = jnp.zeros((8, 128))
        np.asarray(noop(operand))  # compile
        t0 = time.time()
        for _ in range(5):
            np.asarray(noop(operand))
        t_dispatch = (time.time() - t0) / 5
        _log(f"dispatch overhead: {t_dispatch * 1e3:.1f} ms/call")
        t_cycle_100 = t_dispatch + max(t_cycle - t_dispatch, 0.0) * (
            101 / (n_steps + 1)
        )
        # Fetch-free per-step time for normalizing subsampled GOP walls: the
        # measured t_cycle above includes the full ~1 MB output fetch, which
        # the GOP paths never pay per cycle — multiplying it by the
        # step-count ratio would charge 90 phantom fetch-shares per sweep
        # (visible as quick-mode fps collapsing vs full mode). Completion is
        # forced with a tiny-slice fetch (~one RTT, cancelled by t_dispatch);
        # ONE discarded warm call first — the tiny-slice eager ops compile
        # on their first execution (seconds on a remote-compile backend).
        out = predictor.generate(jax.random.PRNGKey(60), cond)
        np.asarray(out[0, 0, :1, :1, 0])
        t0 = time.time()
        for i in range(2):
            out = predictor.generate(jax.random.PRNGKey(61 + i), cond)
            np.asarray(out[0, 0, :1, :1, 0])
        tc_nf = (time.time() - t0) / 2
        t_step_clean = max(tc_nf - t_dispatch, 0.0) / (n_steps + 1)
        _log(f"fetch-free step: {t_step_clean * 1e3:.2f} ms "
             f"(vs {t_step * 1e3:.2f} ms incl. output fetch)")
    else:
        t_cycle_100 = t_cycle * (101 / (n_steps + 1))
    t_gop = 5 * t_cycle_100 + 3 * t_pair
    fps = 30.0 * batch / t_gop
    _log(f"GOP model: 5x{t_cycle_100:.2f}s + 3x{t_pair:.2f}s -> {fps:.3f} frames/s/chip")

    # ---- lockstep-batched serving throughput (B worst-case chains/chip) ----
    tb = throughput_batch if batch == 1 else 0
    t_cycle_b = t_kf_b = fps_tp = 0.0
    if tb > 1:
        _log(f"compiling batched (B={tb}) sampler for the serving path")
        cond_b = jnp.zeros((tb, size, size, c * cfg.data.num_frames_cond), dtype)
        t0 = time.time()
        np.asarray(predictor.generate(jax.random.PRNGKey(11), cond_b))
        _log(f"batched sampler compiled+ran in {time.time() - t0:.1f}s")
        t0 = time.time()
        for i in range(3):
            np.asarray(predictor.generate(jax.random.PRNGKey(12 + i), cond_b))
        t_cycle_b = (time.time() - t0) / 3
        if n_steps < 100:
            t_cycle_b = t_dispatch + max(t_cycle_b - t_dispatch, 0.0) * (101 / (n_steps + 1))
        else:
            t_cycle_b = t_cycle_b * (101 / (n_steps + 1))
        if include_codec and "coder" in codec_result:
            from tvc.pipeline.keyframe import code_frames as _cf

            frames_b = np.random.RandomState(1).rand(2 * tb, 128, 128, 3).astype(np.float32)
            _cf(codec_result["coder"], frames_b, exact=True)  # compile batch-2B stages
            times = []
            for _ in range(3):
                t0 = time.time()
                _cf(codec_result["coder"], frames_b, exact=True)
                times.append(time.time() - t0)
            t_kf_b = float(np.median(times))
        fps_tp = 30.0 * tb / (5 * t_cycle_b + 3 * t_kf_b)
        _log(f"batched GOP model (B={tb}): 5x{t_cycle_b:.2f}s + 3x{t_kf_b:.2f}s "
             f"-> {fps_tp:.3f} frames/s/chip throughput")

    # ---- whole-GOP-on-device program: one call = one full GOP ----
    # Forced trajectory [5,0,5,0,5,5,5]: 7 sampler sweeps + 2 fallback pairs
    # + the initial pair = 31>=30 frames — strictly MORE work than the
    # 5-cycle+3-pair GOP model above, measured as real wall-clock of a single
    # device program (no per-cycle host round-trip or frame fetch; only the
    # final scalars force completion).
    t_fused = fps_fused = 0.0
    n_cycles = 7
    if fused_gop and batch == 1 and include_codec and "coder" in codec_result:
        from tvc.metrics.lpips import LPIPSMetric
        from tvc.pipeline.fused_gop import FusedGOPSender

        _log("building whole-GOP-on-device program (fused_gop)")
        lp = LPIPSMetric.create()
        fsender = FusedGOPSender(cfg=cfg, predictor=predictor,
                                 coder=codec_result["coder"], lpips=lp,
                                 num_frames_total=30)
        video = np.random.RandomState(5).rand(30, size, size, c).astype(np.float32)
        forced = [5, 0, 5, 0, 5, 5, 5]
        t0 = time.time()
        out = fsender.run(video, jax.random.PRNGKey(31), 0.1,
                          forced_accepts=forced)
        float(out["bits"])  # scalar fetch forces completion
        _log(f"fused GOP compiled+ran in {time.time() - t0:.1f}s")
        times = []
        for i in range(3):
            t0 = time.time()
            out = fsender.run(video, jax.random.PRNGKey(32 + i), 0.1,
                              forced_accepts=forced)
            fetched = (float(out["bits"]), int(out["n_updates"]))
            times.append(time.time() - t0)
        assert fetched[1] == n_cycles, fetched
        t_fused = float(np.median(times))
        if n_steps < 100:  # normalize each sweep to the 100-step budget
            t_fused += n_cycles * (101 - (n_steps + 1)) * t_step_clean
        fps_fused = 30.0 / t_fused
        _log(f"fused whole-GOP wall ({n_cycles} sweeps + 3 pairs, 100-step "
             f"normalized): {t_fused:.2f}s -> {fps_fused:.3f} frames/s/chip")

    # ---- device-resident REAL GOP (exact transmissible codec) ----
    # The same forced worst-case trajectory as the fused section, but through
    # DeviceGOPRunner: real host-rANS keyframes (receiver-decodable streams),
    # predictions resident on device, ONE scalar fetch per cycle. This is the
    # honest end-to-end wall of the transmissible path (the 5-cycle+3-pair
    # GOP model above undercounts: each fallback costs a rejected sampler
    # sweep in addition to the pair).
    t_dev_gop = fps_dev_gop = 0.0
    fps_dev_bound = dev_overhead_ms = 0.0
    t_dev_min = t_dev_max = 0.0
    t_dev_aa = fps_dev_aa = 0.0
    if fused_gop and batch == 1 and include_codec and "coder" in codec_result:
        from tvc.pipeline.sender import DeviceGOPRunner

        _log("building device-resident GOP runner (exact codec)")
        runner = DeviceGOPRunner(cfg, predictor, lpips=lp, num_frames_total=30)
        forced = [5, 0, 5, 0, 5, 5, 5]
        # uint8 ground-truth transport (the dataset's native format,
        # city_sender.py:487): 1/4 the host->device bytes on the
        # bandwidth-limited link; converted to [0,1] float on device
        video_u8 = np.clip(video * 255.0, 0, 255).round().astype(np.uint8)
        t0 = time.time()
        out = runner.run(codec_result["coder"], video_u8, jax.random.PRNGKey(41),
                         0.1, forced_accepts=forced)
        _log(f"device GOP compiled+ran in {time.time() - t0:.1f}s")

        def time_cycles(n=2):
            """Fresh t_cycle sample adjacent to the GOP reps: run-to-run
            drift of the sampler itself (observed 0.477-0.511 s on axon)
            must not masquerade as GOP overhead — the bound is only honest
            when numerator and denominator share a measurement window
            (VERDICT r4 item 2). Completion is forced with a TINY fetch
            (not the full ~1 MB 5-frame output): the GOP loop never fetches
            predictions synchronously, so a full-output fetch would make
            the 'bound' pessimistic by the transfer time per cycle. One
            discarded warm call first — the sample right after a GOP run
            otherwise absorbs its still-draining async chunk copies."""
            out = predictor.generate(jax.random.PRNGKey(70), cond)
            np.asarray(out[0, 0, :1, :1, 0])
            t0 = time.time()
            for i in range(n):
                out = predictor.generate(jax.random.PRNGKey(71 + i), cond)
                np.asarray(out[0, 0, :1, :1, 0])
            tc = (time.time() - t0) / n
            if n_steps < 100:
                return t_dispatch + max(tc - t_dispatch, 0.0) * (101 / (n_steps + 1))
            return tc * (101 / (n_steps + 1))

        times = []
        cyc = [time_cycles()]
        for i in range(3):
            t0 = time.time()
            out = runner.run(codec_result["coder"], video_u8,
                             jax.random.PRNGKey(42 + i), 0.1,
                             forced_accepts=forced)
            times.append(time.time() - t0)
        cyc.append(time_cycles())
        assert out.n_updates == n_cycles, out.n_updates
        norm = (n_cycles * (101 - (n_steps + 1)) * t_step_clean) \
            if n_steps < 100 else 0.0
        t_dev_gop = float(np.median(times)) + norm
        t_dev_min = float(np.min(times)) + norm
        t_dev_max = float(np.max(times)) + norm
        fps_dev_gop = 30.0 / t_dev_gop
        # Hard bound for this trajectory: the 7 sampler sweeps are serially
        # dependent (autoregressive conditioning), so even a zero-cost codec
        # and zero host round-trips cannot beat 30/(7*t_cycle), with t_cycle
        # sampled in the SAME window as the GOP reps. The MIN of the two
        # sandwich samples is the bound's estimator — contamination
        # (straggling async work, host jitter) only ever inflates a sample,
        # and an inflated t_cycle would understate the bound (reporting
        # negative overhead). Overhead = measured wall above that floor.
        t_cycle_now = float(np.min(cyc))
        fps_dev_bound = 30.0 / (n_cycles * t_cycle_now)
        dev_overhead_ms = (t_dev_gop - n_cycles * t_cycle_now) * 1e3
        _log(f"device-resident REAL GOP ({n_cycles} sweeps + 3 exact pairs, "
             f"100-step normalized): {t_dev_gop:.2f}s "
             f"[{t_dev_min:.2f}..{t_dev_max:.2f}] -> {fps_dev_gop:.3f} "
             f"frames/s/chip (same-window sampler-serial bound "
             f"{fps_dev_bound:.2f} at t_cycle={t_cycle_now:.3f}s "
             f"[{cyc[0]:.3f},{cyc[1]:.3f}]; non-sampler overhead "
             f"{dev_overhead_ms:.0f} ms/GOP)")

        # accept-all trajectory: every prediction clears the threshold —
        # 6 sweeps (counts 2->7->...->27->30, tail clamped to 3) and ONLY
        # the initial keyframe pair. The typical-success-case latency.
        aa_cycles = 6
        # one warm run: the tail cycle scores k=3 frames — a slice/metric
        # shape the worst-case trajectory never visits (fresh tiny compiles)
        runner.run(codec_result["coder"], video_u8, jax.random.PRNGKey(45),
                   0.1, forced_accepts=[5] * aa_cycles)
        times_aa = []
        for i in range(3):
            t0 = time.time()
            out = runner.run(codec_result["coder"], video_u8,
                             jax.random.PRNGKey(46 + i), 0.1,
                             forced_accepts=[5] * aa_cycles)
            times_aa.append(time.time() - t0)
        assert out.n_updates == aa_cycles, out.n_updates
        norm_aa = (aa_cycles * (101 - (n_steps + 1)) * t_step_clean) \
            if n_steps < 100 else 0.0
        t_dev_aa = float(np.median(times_aa)) + norm_aa
        fps_dev_aa = 30.0 / t_dev_aa
        _log(f"device-resident REAL GOP accept-all ({aa_cycles} sweeps + "
             f"1 exact pair): {t_dev_aa:.2f}s -> {fps_dev_aa:.3f} "
             f"frames/s/chip (typical success case)")

    return BenchResult(
        t_device_gop=t_dev_gop,
        fps_device_gop=fps_dev_gop,
        fps_device_gop_bound=fps_dev_bound,
        device_gop_overhead_ms=dev_overhead_ms,
        t_device_gop_min=t_dev_min,
        t_device_gop_max=t_dev_max,
        t_device_gop_acceptall=t_dev_aa,
        fps_device_gop_acceptall=fps_dev_aa,
        t_fused_gop=t_fused,
        fused_gop_cycles=n_cycles if t_fused else 0,
        fps_fused_gop=fps_fused,
        throughput_batch=tb,
        t_cycle_batched=t_cycle_b,
        t_keyframes_batched=t_kf_b,
        fps_throughput=fps_tp,
        t_unet_step=t_step,
        t_cycle=t_cycle_100,
        t_keyframe_pair=t_pair,
        fps_gop=fps,
        n_sample_steps=n_steps,
        compile_time=compile_time,
        t_keyframe_pair_fused=t_pair_fused,
    )
