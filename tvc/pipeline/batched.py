"""Lockstep-batched GOP encoding: many (video, quality, threshold) jobs per chip.

The reference encodes one GOP chain at a time (city_sender.py:495-607,
batch=1, ~99% of time in the 100-step UNet sweep). GOP chains are serial
*within* a chain but embarrassingly parallel *across* jobs — so tvc steps many
chains in lockstep: one batched sampler call predicts 5 frames for every
active chain, decisions run per-chain on the host, and fallback keyframes are
coded through each job's quality-specific coder. Finished chains are replaced
by masking; the sampler program is compiled once for a fixed batch size
(SURVEY.md §7.3 item 6: keep chips busy under wildly variable per-job work).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tvc.core.config import Config
from tvc.metrics.lpips import LPIPSMetric
from tvc.metrics.pixel import psnr
from tvc.pipeline.keyframe import code_frames
from tvc.pipeline.predictor import FramePredictor
from tvc.pipeline.sender import GOPResult, stack_frames


@dataclasses.dataclass
class GOPJob:
    video: np.ndarray          # (T, H, W, C) ground truth in [0,1]
    threshold: float
    quality: int
    use_psnr: bool = False
    num_frames_total: int = 30


@dataclasses.dataclass
class _ChainState:
    job: GOPJob
    x_ge: np.ndarray           # (t, H, W, C) decoded so far
    d: List[int]
    bits: int
    n_updates: int = 0
    done: bool = False


class BatchedGOPRunner:
    """Runs a list of GOPJobs with batched diffusion predictions."""

    def __init__(self, cfg: Config, predictor: FramePredictor,
                 coders: Dict[int, object], lpips: Optional[LPIPSMetric] = None,
                 batch_size: int = 8):
        self.cfg = cfg
        self.predictor = predictor
        self.coders = coders
        self.lpips = lpips
        self.batch_size = batch_size

    def _decide(self, st: _ChainState, pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
        """Longest acceptable prefix (city_sender.py:353-406), one batched
        metric call over the candidate frames."""
        f = gt.shape[0]
        if f == 0:
            return np.zeros((0,) + pred.shape[1:], pred.dtype)
        if st.job.use_psnr:
            ok = np.asarray([psnr(pred[j], gt[j]) >= st.job.threshold for j in range(f)])
        else:
            d = np.asarray(self.lpips(pred[:f], gt))
            ok = d <= st.job.threshold
        n_acc = f if ok.all() else int(np.argmin(ok))
        if not ok[0]:
            n_acc = 0
        return pred[:n_acc] if n_acc else np.zeros((0,) + pred.shape[1:], pred.dtype)

    def run(self, jobs: Sequence[GOPJob], key: jax.Array,
            patch: int = 64) -> List[GOPResult]:
        """Run independent jobs (no early-stop coupling): each job is its own
        single-point walk."""
        results, _ = self.run_walks([[j] for j in jobs], key, patch=patch,
                                    bpp_stop=None)
        return [w[0] for w in results]

    def run_walks(self, walks: Sequence[Sequence[GOPJob]], key: jax.Array,
                  patch: int = 64, bpp_stop: Optional[float] = 1.0):
        """Threshold-walk scheduling with the reference's early-stop economy
        (city_sender.py:561-562): each walk is a threshold-DESCENDING list of
        jobs sharing (video, quality). A walk's next threshold only starts
        after the previous one finishes, and the moment a point comes back
        with bpp >= bpp_stop the whole walk is retired — lower thresholds
        can only transmit more, so their points are doomed for the [0,1)
        bpp range anyway. Freed batch slots are backfilled from the ready
        queue, so lockstep batching keeps the chip busy without paying for
        rate points destined for the bin.

        Returns (results, stats): results[w][j] is a GOPResult, or None if
        walk w was retired before reaching job j; stats counts sampler
        sweeps + started/skipped jobs (the driver logs them)."""
        cfg = self.cfg
        nc = cfg.data.num_frames_cond
        n_pred = cfg.data.num_frames
        for walk in walks:
            for job in walk:
                assert job.video.shape[0] >= job.num_frames_total, (
                    "video shorter than num_frames_total: chain cannot terminate"
                )
            if bpp_stop is not None and len(walk) > 1:
                # retirement is only sound when transmission is monotone
                # NON-DECREASING along the walk: LPIPS accepts d <= rho, so
                # LOWER rho transmits more (walk descending); PSNR accepts
                # psnr >= rho, so HIGHER rho transmits more (walk ascending)
                thr = [j.threshold for j in walk]
                ok = (all(a >= b for a, b in zip(thr, thr[1:]))
                      if not walk[0].use_psnr
                      else all(a <= b for a, b in zip(thr, thr[1:])))
                assert ok, (
                    "walk thresholds must be ordered least-transmitting "
                    "first (LPIPS: descending; PSNR: ascending) for the "
                    f"bpp early stop to be sound; got {thr} "
                    f"(use_psnr={walk[0].use_psnr})")
        t0 = time.time()
        B = self.batch_size
        size = cfg.data.image_size
        c = cfg.data.channels

        results: List[List[Optional[GOPResult]]] = [[None] * len(w) for w in walks]
        ready: List[tuple] = [(w, 0) for w in range(len(walks)) if walks[w]]
        active: List[tuple] = []  # (w, j, _ChainState)
        sweeps = started = skipped = 0

        def finish(w: int, j: int, st: _ChainState):
            nonlocal skipped
            n = st.job.num_frames_total
            h, wd = st.job.video.shape[1:3]
            bpp = st.bits / h / wd / n
            results[w][j] = GOPResult(
                d=np.asarray(st.d[:n])[None], x_ge=st.x_ge[:n][None],
                bits=st.bits, bpp=bpp, n_updates=st.n_updates,
                wall_time=time.time() - t0,
            )
            if bpp_stop is not None and bpp >= bpp_stop:
                skipped += len(walks[w]) - (j + 1)  # retire the walk
            elif j + 1 < len(walks[w]):
                ready.append((w, j + 1))

        while ready or active:
            # backfill free slots; batch the new chains' initial keyframes
            starts: List[tuple] = []
            while len(active) + len(starts) < B and ready:
                starts.append(ready.pop(0))
            if starts:
                started += len(starts)
                by_q: Dict[int, List[int]] = {}
                for k, (w, j) in enumerate(starts):
                    by_q.setdefault(walks[w][j].quality, []).append(k)
                for q, ks in by_q.items():
                    frames = np.concatenate(
                        [walks[starts[k][0]][starts[k][1]].video[:nc] for k in ks], axis=0)
                    dec, bits = code_frames(self.coders[q], frames, patch,
                                            exact=cfg.codec.exact_streams)
                    for slot, k in enumerate(ks):
                        w, j = starts[k]
                        st = _ChainState(
                            job=walks[w][j], x_ge=dec[slot * nc: (slot + 1) * nc],
                            d=[1] * nc, bits=sum(bits[slot * nc: (slot + 1) * nc]))
                        if st.x_ge.shape[0] >= st.job.num_frames_total:
                            finish(w, j, st)
                        else:
                            active.append((w, j, st))
            if not active:
                continue  # all fresh starts finished on keyframes alone

            # one batched prediction for all active chains (pad to B)
            conds = np.zeros((B, size, size, c * nc), np.float32)
            for slot, (_, _, st) in enumerate(active):
                conds[slot] = stack_frames(st.x_ge[None, -nc:])[0]
            key, sub = jax.random.split(key)
            preds = np.asarray(self.predictor.generate(sub, jnp.asarray(conds)))
            sweeps += 1

            fallback: Dict[int, List[int]] = {}
            for slot, (w, j, st) in enumerate(active):
                idx = st.x_ge.shape[0]
                # decisions only score in-GOP frames (frames past
                # num_frames_total must not influence the result — the
                # reference's videos are exactly T frames)
                gt = st.job.video[idx: min(idx + n_pred, st.job.num_frames_total)]
                acc = self._decide(st, preds[slot, : gt.shape[0]], gt)
                st.n_updates += 1
                if acc.shape[0] > 0:
                    st.x_ge = np.concatenate([st.x_ge, acc], axis=0)
                    st.d.extend([0] * acc.shape[0])
                else:
                    fallback.setdefault(st.job.quality, []).append(slot)
                if st.x_ge.shape[0] >= st.job.num_frames_total:
                    st.done = True

            # Batched fallback keyframe coding per quality. Chains near the
            # video end contribute FEWER than nc frames (the gt slice clamps
            # — the host loop's video_gt[l:l+nc] semantics), so per-chain
            # offsets must come from the actual chunk lengths: fixed-stride
            # k*nc slicing would hand one chain's decoded frames to another
            # whenever a clamped chain isn't last in the batch.
            for q, slots in fallback.items():
                chunks = [active[s][2].job.video[
                    active[s][2].x_ge.shape[0]:
                    min(active[s][2].x_ge.shape[0] + nc,
                        active[s][2].job.num_frames_total)]
                    for s in slots]
                offs = np.concatenate([[0], np.cumsum([ch.shape[0] for ch in chunks])])
                dec, bits = code_frames(self.coders[q],
                                        np.concatenate(chunks, axis=0), patch,
                                        exact=cfg.codec.exact_streams)
                for k, s in enumerate(slots):
                    st = active[s][2]
                    lo, hi = offs[k], offs[k + 1]
                    st.x_ge = np.concatenate([st.x_ge, dec[lo:hi]], axis=0)
                    st.d.extend([1] * (hi - lo))
                    st.bits += sum(bits[lo:hi])
                    if st.x_ge.shape[0] >= st.job.num_frames_total:
                        st.done = True

            still = []
            for (w, j, st) in active:
                if st.done:
                    finish(w, j, st)
                else:
                    still.append((w, j, st))
            active = still

        stats = {"sweeps": sweeps, "jobs_run": started, "jobs_skipped": skipped}
        return results, stats
