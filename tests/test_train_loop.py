"""End-to-end training-loop test (tiny model, 8-device CPU mesh)."""

import os

import numpy as np
import pytest

from tvc.core.config import Config
from tvc.pipeline.train_loop import clip_batches, train


def tiny_train_cfg():
    cfg = Config()
    cfg.data.image_size = 16
    cfg.data.num_frames = 2
    cfg.data.num_frames_cond = 1
    cfg.model.ngf = 8
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (8,)
    cfg.model.n_head_channels = 4
    cfg.model.num_classes = 10
    cfg.optim.warmup = 0
    return cfg


def test_clip_batches_shapes():
    cfg = tiny_train_cfg()
    data = np.random.RandomState(0).rand(2, 8, 16, 16, 3).astype(np.float32)
    it = clip_batches(data, cfg, 4, np.random.RandomState(1))
    b = next(it)
    assert b["x"].shape == (4, 16, 16, 6)      # 2 target frames x 3ch
    assert b["cond"].shape == (4, 16, 16, 3)   # 1 cond frame


@pytest.mark.slow
def test_train_loop_runs_and_snapshots(tmp_path):
    cfg = tiny_train_cfg()
    data = np.random.RandomState(0).rand(2, 8, 16, 16, 3).astype(np.float32)
    metrics = train(cfg, data, num_steps=4, batch_size=8, snapshot_freq=2,
                    log_freq=2, out_dir=str(tmp_path))
    assert np.isfinite(metrics["final_loss"])
    assert os.path.exists(tmp_path / "ckpt_2.params.npz")
    assert os.path.exists(tmp_path / "ckpt_final.ema.npz")
    assert os.path.exists(tmp_path / "ckpt_2.opt.npz")

    # resume from the step-2 snapshot and run to step 4 again
    metrics2 = train(cfg, data, num_steps=4, batch_size=8, snapshot_freq=10,
                     log_freq=2, out_dir=str(tmp_path / "resumed"),
                     resume_from=str(tmp_path / "ckpt_2"))
    assert metrics2["steps"] == 4
    assert np.isfinite(metrics2["final_loss"])
