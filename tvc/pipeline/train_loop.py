"""Minimal diffusion training loop driver.

The reference ships training *components* but no in-repo loop (SURVEY.md §0:
the model is trained externally with MCVD; losses/dsm.py + losses/__init__.py
exist at component level). tvc wires those components end-to-end: DSM loss,
optax optimizer with warmup + grad clip, functional EMA, periodic npz
snapshots — over the sharded train step of tvc/parallel/train.py, so the same
loop runs on 1 chip or a mesh.

Data: a (B, T, C, H, W) dataset npy (city_bonn layout); each step samples
random clips of num_frames_cond + num_frames consecutive frames.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tvc.core.config import Config
from tvc.parallel.mesh import data_sharding, make_mesh
from tvc.parallel.train import make_train_step
from tvc.pipeline.sender import stack_frames
from tvc.pipeline.transforms import data_transform
from tvc.utils.checkpoint_io import load_train_state, save_train_state


def clip_batches(data: np.ndarray, cfg: Config, batch_size: int,
                 rng: np.random.RandomState) -> Iterator[Dict[str, np.ndarray]]:
    """Random (cond, target) clip batches from (B,T,H,W,C) [0,1] videos."""
    nc = cfg.data.num_frames_cond
    nf = cfg.data.num_frames
    span = nc + nf
    n_videos, t = data.shape[:2]
    assert t >= span
    while True:
        vid = rng.randint(0, n_videos, batch_size)
        start = rng.randint(0, t - span + 1, batch_size)
        clips = np.stack([data[v, s : s + span] for v, s in zip(vid, start)])
        cond = stack_frames(clips[:, :nc])
        x = stack_frames(clips[:, nc:])
        yield {"x": x.astype(np.float32), "cond": cond.astype(np.float32)}


def train(
    cfg: Config,
    data: np.ndarray,
    num_steps: int = 1000,
    batch_size: int = 8,
    snapshot_freq: int = 500,
    log_freq: int = 50,
    out_dir: Optional[str] = None,
    dtype=jnp.float32,
    resume_from: Optional[str] = None,
) -> Dict[str, float]:
    """Run DSM training; returns final metrics. data: (B,T,H,W,C) in [0,1].

    resume_from: a snapshot path prefix written by a previous run (e.g.
    `out/ckpt_500`); restores params/EMA/optimizer/step and continues until
    `num_steps` total. The reference has no mid-run resume at all (SURVEY.md
    §5 checkpoint/resume: load-only); tvc makes it first-class."""
    mesh = make_mesh(cfg.mesh)
    dp = mesh.shape[cfg.mesh.data_axis]
    if batch_size % dp != 0:
        batch_size = max((batch_size // dp), 1) * dp if batch_size >= dp else dp
        print(f"[train] batch_size rounded to {batch_size} (data axis = {dp})")
    init_fn, step_fn = make_train_step(cfg, mesh, dtype=dtype)
    batches = clip_batches(data, cfg, batch_size, np.random.RandomState(cfg.seed))

    first = next(batches)
    first = {k: np.asarray(data_transform(cfg, jnp.asarray(v))) for k, v in first.items()}
    key = jax.random.PRNGKey(cfg.seed)
    with mesh:
        state, _ = init_fn(key, {k: jnp.asarray(v) for k, v in first.items()})
        start_step = 0
        if resume_from:
            # older snapshots may lack the .opt.npz member; resume with a
            # fresh optimizer state in that case (params/EMA still restored)
            has_opt = os.path.exists(resume_from + ".opt.npz")
            params, ema, start_step, opt = load_train_state(
                resume_from, state.params, state.ema,
                state.opt_state if has_opt else None)
            state = state.replace(params=params, ema=ema,
                                  opt_state=opt if has_opt else state.opt_state,
                                  step=jnp.asarray(start_step, jnp.int32))
            # decorrelate the clip stream and noise keys from the first run
            batches = clip_batches(data, cfg, batch_size,
                                   np.random.RandomState(cfg.seed + start_step))
            key = jax.random.fold_in(key, start_step)
            print(f"[train] resumed from {resume_from} at step {start_step}")
        losses = []
        loss = jnp.nan
        t0 = time.time()
        for step in range(start_step, num_steps):
            batch = next(batches)
            batch = {
                k: jax.device_put(
                    np.asarray(data_transform(cfg, jnp.asarray(v))),
                    data_sharding(mesh, v.ndim),
                )
                for k, v in batch.items()
            }
            key, sub = jax.random.split(key)
            state, loss = step_fn(state, batch, sub)
            if (step + 1) % log_freq == 0 or step == 0:
                loss_v = float(loss)
                losses.append(loss_v)
                print(f"step {step + 1}/{num_steps} loss {loss_v:.4f} "
                      f"({(time.time() - t0) / (step + 1 - start_step):.3f}"
                      "s/step)", flush=True)
            if out_dir and (step + 1) % snapshot_freq == 0:
                save_train_state(os.path.join(out_dir, f"ckpt_{step + 1}"),
                                 state.params, state.ema, step + 1,
                                 opt_state=state.opt_state)
        final_loss = float(loss)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        save_train_state(os.path.join(out_dir, "ckpt_final"),
                         state.params, state.ema, num_steps,
                         opt_state=state.opt_state)
    return {"final_loss": final_loss, "steps": num_steps,
            "wall_time": time.time() - t0}
