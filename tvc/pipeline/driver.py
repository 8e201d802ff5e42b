"""Top-level sweep driver: the `python city_sender.py` equivalent.

Mirrors the module-main flow of city_sender.py:464-617: load the dataset npy
(B, T, C, H, W in [0,255]); for each video index run the (quality x threshold)
rate sweep; convex-hull the RD points; persist npy results + plots; write the
run config for provenance.

Multi-host: the (video, quality, threshold) work-list is sharded across
processes with `tvc.parallel.mesh.partition_work`; each process owns whole
GOP chains (the serial dependency), results are gathered by the caller.
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
import time
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from tvc.core.config import Config, save_config
from tvc.metrics.fvd import FVDMetric
from tvc.metrics.lpips import LPIPSMetric
from tvc.metrics.rd import process_data_and_save
from tvc.pipeline.predictor import FramePredictor
from tvc.pipeline.sender import RatePoint, rate_sweep
from tvc.utils.plotting import plot


def load_dataset(path: str) -> np.ndarray:
    """city_bonn.npy-style (B,T,C,H,W) uint8-range -> (B,T,H,W,C) float [0,1]
    (city_sender.py:487)."""
    arr = np.load(path) / 255.0
    return np.transpose(arr, (0, 1, 3, 4, 2)).astype(np.float32)


def save_output_strip(gt: np.ndarray, xge: np.ndarray, q: int, thr: float, idx: int,
                      output_dir: str) -> None:
    """Side-by-side GT/decoded strip artifact (function.py:41-52), PNG via
    matplotlib (no cv2 dependency)."""
    os.makedirs(output_dir, exist_ok=True)
    # (T,H,W,C) -> single horizontal strip per row: [gt; decoded]
    strip = np.concatenate([np.concatenate(list(v), axis=1) for v in (gt, xge)], axis=0)
    np.save(os.path.join(output_dir, f"city_output_npy_idx{idx}_q{q}_thr{thr:.2f}.npy"), strip)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(
            os.path.join(output_dir, f"city_idx{idx}_q{q}_thr{thr:.2f}.png"),
            np.clip(strip, 0, 1),
        )
    except Exception:
        pass


def run_sweep_batched(
    cfg: Config,
    data: np.ndarray,
    coders: Dict[int, object],
    predictor: FramePredictor,
    output_path: str,
    start_idx: int = 0,
    end_idx: int = 0,
    qualities: Sequence[int] = (4, 5),
    thresholds: Optional[Sequence[float]] = None,
    batch_size: int = 8,
    with_fvd: bool = True,
    lpips_metric: Optional[LPIPSMetric] = None,
    fvd_metric: Optional[FVDMetric] = None,
    bpp_stop: float = 1.0,
    num_processes: int = 1,
    process_id: int = 0,
    provenance: Optional[dict] = None,
    use_psnr: bool = False,
) -> Dict[int, list]:
    """Throughput-oriented sweep: every (video, quality, threshold) job runs
    as a lockstep-batched GOP chain (tvc/pipeline/batched.py), organized as
    threshold-DESCENDING walks per (video, quality) with the reference's
    early-stop economy (city_sender.py:561: a walk retires the moment a point
    hits bpp >= 1.0 — lower thresholds only transmit more). Freed batch slots
    backfill from other walks, so the chip stays busy without encoding rate
    points destined for the bin. The WALK list (not the job list) is
    statically sharded across processes for multi-host runs — a walk's serial
    dependency must live on one process."""
    import dataclasses as _dc

    from tvc.metrics.rd import process_data_and_save
    from tvc.parallel.mesh import partition_work
    from tvc.pipeline.batched import BatchedGOPRunner, GOPJob
    from tvc.pipeline.sender import RatePoint

    if thresholds is None:
        thresholds = [round(t, 2) for t in np.arange(0.30, 0.02, -0.01)]
    thresholds = sorted(thresholds, reverse=True)
    lpips_metric = lpips_metric or LPIPSMetric.create()
    if with_fvd and fvd_metric is None:
        fvd_metric = FVDMetric()

    walks_meta = [
        (vid, int(q))
        for vid in range(start_idx, end_idx + 1)
        for q in qualities
    ]
    walks_meta = partition_work(walks_meta, num_processes, process_id)
    n_frames = min(30, data.shape[1])
    walks = [
        [GOPJob(video=data[vid], threshold=float(rho), quality=q,
                num_frames_total=n_frames, use_psnr=use_psnr)
         for rho in thresholds]
        for vid, q in walks_meta
    ]

    runner = BatchedGOPRunner(cfg, predictor, coders, lpips=lpips_metric,
                              batch_size=batch_size)
    results, stats = runner.run_walks(
        walks, jax.random.PRNGKey(cfg.seed), patch=cfg.codec.patch,
        bpp_stop=bpp_stop)
    print(f"[batched] {stats['sweeps']} sampler sweeps for "
          f"{stats['jobs_run']} rate points "
          f"({stats['jobs_skipped']} retired early at bpp>={bpp_stop})")

    per_video: Dict[int, list] = {}
    flat = [
        ((vid, q, walks[w][j].threshold), results[w][j])
        for w, (vid, q) in enumerate(walks_meta)
        for j in range(len(walks[w]))
        if results[w][j] is not None
    ]
    for (vid, q, rho), gop in flat:
        if gop.bpp >= bpp_stop:
            continue
        video_gt = data[vid]
        psnr_list = [float(np.round(_psnr_np(gop.x_ge[0, i], video_gt[i]), 10))
                     for i in range(n_frames)]
        lpips_list = [float(v) for v in np.asarray(
            lpips_metric(gop.x_ge[0], video_gt[:n_frames]))]
        fvd_val = float(fvd_metric(np.repeat(gop.x_ge, 2, 0),
                                   np.repeat(video_gt[None, :n_frames], 2, 0))) \
            if (with_fvd and fvd_metric is not None) else float("nan")
        per_video.setdefault(vid, []).append(RatePoint(
            quality=q, threshold=rho, bpp=gop.bpp, psnr_list=psnr_list,
            lpips_list=lpips_list, fvd=fvd_val, d=[int(v) for v in gop.d[0]],
        ))

    os.makedirs(output_path, exist_ok=True)
    save_config(cfg, os.path.join(output_path, "config.yml"),
                extra={"provenance": provenance} if provenance else None)
    for vid, points in per_video.items():
        persist_rd_results(vid, points, os.path.join(output_path, f"output_{vid}"))
    return per_video


def _psnr_np(a, b):
    from tvc.metrics.pixel import psnr as _p

    return _p(a, b)


def run_sweep(
    cfg: Config,
    data: np.ndarray,
    coders: Dict[int, object],
    predictor: FramePredictor,
    output_path: str,
    start_idx: int = 0,
    end_idx: int = 0,
    qualities: Sequence[int] = (4, 5),
    thresholds: Optional[Sequence[float]] = None,
    with_fvd: bool = True,
    lpips_metric: Optional[LPIPSMetric] = None,
    fvd_metric: Optional[FVDMetric] = None,
    save_artifacts: bool = True,
    bench_264: Optional[str] = None,
    bench_265: Optional[str] = None,
    fused_gop: bool = False,
    device_gop: bool = False,
    provenance: Optional[dict] = None,
    use_psnr: bool = False,
) -> Dict[int, List[RatePoint]]:
    """Sweep videos [start_idx, end_idx]; returns per-video rate points.

    fused_gop=True runs every GOP as ONE device program (whole-GOP-on-device,
    tvc/pipeline/fused_gop.py): bits are the likelihood estimate
    (entropy-estimation bpp) rather than rANS byte counts.
    device_gop=True runs GOPs through DeviceGOPRunner: exact transmissible
    keyframe streams, device-resident predictions, one scalar fetch per
    predict cycle."""
    os.makedirs(output_path, exist_ok=True)
    save_config(cfg, os.path.join(output_path, "config.yml"),
                extra={"provenance": provenance} if provenance else None)
    lpips_metric = lpips_metric or LPIPSMetric.create()
    if with_fvd and fvd_metric is None:
        fvd_metric = FVDMetric()
    fused = None
    device_runner = None
    if fused_gop:
        from tvc.pipeline.fused_gop import FusedGOPSender

        fused = FusedGOPSender(
            cfg=cfg, predictor=predictor, coder=coders[list(qualities)[0]],
            lpips=lpips_metric, num_frames_total=min(30, data.shape[1]),
            use_psnr=use_psnr)
    elif device_gop:
        from tvc.pipeline.sender import DeviceGOPRunner

        device_runner = DeviceGOPRunner(
            cfg, predictor, lpips=lpips_metric, use_psnr=use_psnr,
            num_frames_total=min(30, data.shape[1]))

    results: Dict[int, List[RatePoint]] = {}
    for vid in range(start_idx, end_idx + 1):
        t0 = time.time()
        out_root = os.path.join(output_path, f"output_{vid}")
        os.makedirs(out_root, exist_ok=True)
        video = data[vid]
        writer_threads: List[threading.Thread] = []

        def artifact_cb(q, thr, x_ge, _vid=vid, _root=out_root, _video=video):
            if not save_artifacts:
                return
            # background writer like the reference (city_sender.py:602-604)
            t = threading.Thread(
                target=save_output_strip,
                args=(_video[: x_ge.shape[0]].copy(), x_ge.copy(), q, thr, _vid, _root),
            )
            t.start()
            writer_threads.append(t)

        points = rate_sweep(
            cfg, video, coders, predictor, lpips_metric,
            fvd_metric=fvd_metric if with_fvd else None,
            qualities=qualities, thresholds=thresholds,
            key=jax.random.PRNGKey(cfg.seed + vid),
            num_frames_total=min(30, video.shape[0]),
            artifact_cb=artifact_cb,
            fused=fused, device_runner=device_runner, use_psnr=use_psnr,
        )
        for t in writer_threads:
            t.join()
        results[vid] = points
        if not points:
            continue
        persist_rd_results(vid, points, out_root, bench_264, bench_265)
        print(f"video {vid}: {len(points)} rate points in {time.time() - t0:.1f}s")
    return results


def run_sweep_queued(
    cfg: Config,
    data: np.ndarray,
    coders: Dict[int, object],
    predictor: FramePredictor,
    output_path: str,
    queue_dir: str,
    start_idx: int = 0,
    end_idx: int = 0,
    qualities: Sequence[int] = (4, 5),
    thresholds: Optional[Sequence[float]] = None,
    with_fvd: bool = True,
    lpips_metric: Optional[LPIPSMetric] = None,
    fvd_metric: Optional[FVDMetric] = None,
    bench_264: Optional[str] = None,
    bench_265: Optional[str] = None,
    owner: Optional[str] = None,
    stale_after: float = 900.0,
    provenance: Optional[dict] = None,
    device_gop: bool = False,
    use_psnr: bool = False,
) -> int:
    """Dynamic multi-host sweep: pull (video, quality) work units from a
    shared-filesystem WorkQueue instead of static partitioning.

    Per-unit work is wildly variable (early bpp stop, fallback count —
    SURVEY.md §7.3 item 6), so pulling keeps every host busy until the queue
    drains; a host that dies mid-unit loses its claim after `stale_after`
    seconds and the unit is re-run elsewhere (tvc/parallel/queue.py). Exactly
    one process performs the final per-video merge + RD persistence.

    device_gop=True runs each unit's GOP chains through a per-process
    DeviceGOPRunner (the production latency path: device-resident
    predictions, one scalar fetch per cycle, exact transmissible keyframe
    streams) — a multi-host sweep then gets the latency path's economics
    (VERDICT r4 item 7).

    Returns the number of units this process completed."""
    import socket

    from tvc.parallel.queue import WorkQueue
    from tvc.pipeline.sender import RatePoint as _RP

    units = [
        {"id": f"v{vid}_q{q}", "video": vid, "quality": int(q)}
        for vid in range(start_idx, end_idx + 1)
        for q in qualities
    ]
    wq = WorkQueue.create_or_open(queue_dir, units, stale_after=stale_after)
    owner = owner or f"{socket.gethostname()}:{os.getpid()}"
    lpips_metric = lpips_metric or LPIPSMetric.create()
    if with_fvd and fvd_metric is None:
        fvd_metric = FVDMetric()
    device_runner = None
    if device_gop:
        from tvc.pipeline.sender import DeviceGOPRunner

        device_runner = DeviceGOPRunner(
            cfg, predictor, lpips=lpips_metric, use_psnr=use_psnr,
            num_frames_total=min(30, data.shape[1]))

    def run_unit(job):
        vid, q = job["video"], job["quality"]

        # Renew the claim from a background thread every 60s for the whole
        # unit: the first unit also pays sampler+codec compile (minutes on the
        # TPU backend), which would exceed `stale_after` between per-point
        # renewals and get a live worker's claim stolen.
        stop = threading.Event()

        def _beat():
            while not stop.wait(60.0):
                wq.heartbeat(job["id"])

        beat = threading.Thread(target=_beat, daemon=True)
        beat.start()
        try:
            points = rate_sweep(
                cfg, data[vid], coders, predictor, lpips_metric,
                fvd_metric=fvd_metric if with_fvd else None,
                qualities=[q], thresholds=thresholds,
                key=jax.random.PRNGKey(cfg.seed + vid),
                num_frames_total=min(30, data[vid].shape[0]),
                verbose=False, device_runner=device_runner,
                use_psnr=use_psnr,
            )
        finally:
            stop.set()
            beat.join()
        return {"video": vid, "points": [dataclasses.asdict(p) for p in points]}

    n = wq.drain(owner, run_unit)

    # single-winner merge: first process to observe a drained queue persists
    # the per-video RD outputs (a dedicated done-marker arbitrates the race)
    if wq.all_done() and wq.mark_done("__merged__", {"owner": owner}):
        per_video: Dict[int, List[RatePoint]] = {}
        for jid, res in wq.results().items():
            if jid == "__merged__":
                continue
            for p in res["points"]:
                per_video.setdefault(res["video"], []).append(_RP(**p))
        os.makedirs(output_path, exist_ok=True)
        save_config(cfg, os.path.join(output_path, "config.yml"),
                    extra={"provenance": provenance} if provenance else None)
        for vid, points in sorted(per_video.items()):
            persist_rd_results(vid, points, os.path.join(output_path, f"output_{vid}"),
                               bench_264, bench_265)
        print(f"[queue] merged {len(per_video)} videos -> {output_path}")
    return n


def persist_rd_results(vid: int, points, out_root: str,
                       bench_264: Optional[str] = None,
                       bench_265: Optional[str] = None) -> None:
    """points.json + convex-hull RD envelopes + anchor-overlay plots for one
    video (function.py:148-230 + result_plot.py driver semantics)."""
    os.makedirs(out_root, exist_ok=True)
    with open(os.path.join(out_root, "points.json"), "w") as f:
        json.dump([dataclasses.asdict(p) for p in points], f, indent=1)

    fvds = [0.0 if np.isnan(p.fvd) else p.fvd for p in points]
    try:
        psnr_arr, lpips_arr, fvd_arr = process_data_and_save(
            vid,
            [p.bpp for p in points],
            [p.psnr_list for p in points],
            [p.lpips_list for p in points],
            fvds,
            out_root,
        )
    except Exception:
        # hull needs >= 3 non-collinear points; fall back to raw curves
        bpps = np.asarray([p.bpp for p in points])
        order = np.argsort(bpps)
        psnr_arr = np.vstack([bpps[order],
                              np.asarray([np.mean(p.psnr_list) for p in points])[order]])
        lpips_arr = np.vstack([bpps[order],
                               np.asarray([np.mean(p.lpips_list) for p in points])[order]])
        fvd_arr = np.vstack([bpps[order], np.asarray(fvds)[order]])
        for name, arr in (("psnr", psnr_arr), ("lpips", lpips_arr), ("fvd", fvd_arr)):
            np.save(os.path.join(out_root, f"{name}_{vid}.npy"), arr)
    try:
        plot(vid, psnr_arr, lpips_arr, fvd_arr, out_root,
             bench_264=bench_264, bench_265=bench_265)
    except Exception as e:  # plotting must not kill a sweep
        print(f"plotting failed for video {vid}: {e}")
