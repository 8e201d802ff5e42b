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
        cfg = self.cfg
        nc = cfg.data.num_frames_cond
        n_pred = cfg.data.num_frames
        for job in jobs:
            assert job.video.shape[0] >= job.num_frames_total, (
                "video shorter than num_frames_total: chain cannot terminate"
            )
        t0 = time.time()

        # initial keyframes, batched per quality across jobs
        states: List[_ChainState] = []
        by_q: Dict[int, List[int]] = {}
        for i, job in enumerate(jobs):
            by_q.setdefault(job.quality, []).append(i)
        init_dec: Dict[int, np.ndarray] = {}
        init_bits: Dict[int, List[int]] = {}
        for q, idxs in by_q.items():
            frames = np.concatenate([jobs[i].video[:nc] for i in idxs], axis=0)
            dec, bits = code_frames(self.coders[q], frames, patch,
                                    exact=cfg.codec.exact_streams)
            for slot, i in enumerate(idxs):
                init_dec[i] = dec[slot * nc : (slot + 1) * nc]
                init_bits[i] = bits[slot * nc : (slot + 1) * nc]
        for i, job in enumerate(jobs):
            states.append(_ChainState(job=job, x_ge=init_dec[i], d=[1] * nc,
                                      bits=sum(init_bits[i])))

        B = self.batch_size
        size = cfg.data.image_size
        c = cfg.data.channels

        while any(not s.done for s in states):
            active = [i for i, s in enumerate(states) if not s.done][:B]
            # one batched prediction for all active chains (pad to B)
            conds = np.zeros((B, size, size, c * nc), np.float32)
            for slot, i in enumerate(active):
                conds[slot] = stack_frames(states[i].x_ge[None, -nc:])[0]
            key, sub = jax.random.split(key)
            preds = np.asarray(self.predictor.generate(sub, jnp.asarray(conds)))

            fallback: Dict[int, List[int]] = {}
            for slot, i in enumerate(active):
                st = states[i]
                idx = st.x_ge.shape[0]
                gt = st.job.video[idx : idx + n_pred]
                acc = self._decide(st, preds[slot, : gt.shape[0]], gt)
                st.n_updates += 1
                if acc.shape[0] > 0:
                    st.x_ge = np.concatenate([st.x_ge, acc], axis=0)
                    st.d.extend([0] * acc.shape[0])
                else:
                    fallback.setdefault(st.job.quality, []).append(i)
                if st.x_ge.shape[0] >= st.job.num_frames_total:
                    st.done = True

            # batched fallback keyframe coding per quality
            for q, idxs in fallback.items():
                frames = np.concatenate(
                    [states[i].job.video[states[i].x_ge.shape[0] : states[i].x_ge.shape[0] + nc]
                     for i in idxs], axis=0)
                dec, bits = code_frames(self.coders[q], frames, patch,
                                    exact=cfg.codec.exact_streams)
                for slot, i in enumerate(idxs):
                    st = states[i]
                    st.x_ge = np.concatenate([st.x_ge, dec[slot * nc : (slot + 1) * nc]], axis=0)
                    st.d.extend([1] * nc)
                    st.bits += sum(bits[slot * nc : (slot + 1) * nc])
                    if st.x_ge.shape[0] >= st.job.num_frames_total:
                        st.done = True

        wall = time.time() - t0
        out = []
        for st in states:
            n = st.job.num_frames_total
            h, w = st.job.video.shape[1:3]
            out.append(GOPResult(
                d=np.asarray(st.d[:n])[None], x_ge=st.x_ge[:n][None], bits=st.bits,
                bpp=st.bits / h / w / n, n_updates=st.n_updates, wall_time=wall,
            ))
        return out
