"""Config tree + override mini-language tests (reference city_sender.py:141-154)."""

import pytest

from tvc.core.config import Config, apply_overrides, config_from_dict, load_config


def test_defaults_match_reference_yaml():
    cfg = Config()
    # configs/mine.yml values
    assert cfg.model.ngf == 192
    assert cfg.model.ch_mult == (1, 1, 2, 3, 4)
    assert cfg.model.attn_resolutions == (8, 16, 32)
    assert cfg.model.num_classes == 1000
    assert cfg.model.sigma_begin == 0.02 and cfg.model.sigma_end == 0.0001
    assert cfg.sampling.subsample == 100
    assert cfg.sampling.denoise and cfg.sampling.clip_before
    assert cfg.data.num_frames == 5 and cfg.data.num_frames_cond == 2
    assert cfg.data.image_size == 128 and cfg.data.rescaled


def test_overrides():
    cfg = Config()
    apply_overrides(cfg, ["model.ngf=64 model.n_head_channels=32", "sampling.subsample=10"])
    assert cfg.model.ngf == 64
    assert cfg.model.n_head_channels == 32
    assert cfg.sampling.subsample == 10
    apply_overrides(cfg, ["model.sigma_dist=cosine"])  # plain string value
    assert cfg.model.sigma_dist == "cosine"
    apply_overrides(cfg, ["model.ch_mult=[1,2,4]"])
    assert cfg.model.ch_mult == (1, 2, 4)
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["nope.key=1"])


def test_config_from_dict_tolerates_unknown_keys():
    cfg = config_from_dict({"model": {"ngf": 32, "vestigial_key": 1}, "junk": {"a": 2}})
    assert cfg.model.ngf == 32


def test_validation_asserts():
    cfg = Config()
    cfg.model.cond_emb = True
    with pytest.raises(AssertionError):
        cfg.validate()
    cfg.data.prob_mask_cond = 0.5
    cfg.validate()

    cfg2 = Config()
    cfg2.model.output_all_frames = True
    cfg2.validate()
    assert cfg2.model.noise_in_cond  # forced (city_sender.py:157-159)


def test_yaml_roundtrip(tmp_path):
    from tvc.core.config import save_config

    cfg = Config()
    cfg.model.ngf = 48
    p = tmp_path / "c.yml"
    save_config(cfg, str(p))
    cfg2 = load_config(str(p))
    assert cfg2.model.ngf == 48
    assert cfg2.model.ch_mult == cfg.model.ch_mult
