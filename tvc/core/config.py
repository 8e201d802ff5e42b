"""Configuration tree for the tvc engine.

Mirrors the capability surface of the reference YAML config
(``/root/reference/configs/mine.yml``) and its three-tier override system
(``city_sender.py:47-223``: argparse CLI + YAML file + ``section.key=value``
mini-language), re-designed as typed dataclasses with a safe literal parser
instead of ``eval``.
"""

from __future__ import annotations

import ast
import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

import yaml


@dataclass
class DataConfig:
    dataset: str = "Cityscapes"
    image_size: int = 128
    channels: int = 3
    logit_transform: bool = False
    uniform_dequantization: bool = False
    gaussian_dequantization: bool = False
    random_flip: bool = True
    rescaled: bool = True
    color_jitter: float = 0.0
    num_frames: int = 5
    num_frames_cond: int = 2
    num_frames_future: int = 0
    prob_mask_cond: float = 0.0
    prob_mask_future: float = 0.0
    prob_mask_sync: bool = False


@dataclass
class ModelConfig:
    # reference: configs/mine.yml `model:` section
    depth: str = "deeper"
    version: str = "DDPM"  # DDPM | DDIM | FPNDM
    gamma: bool = False
    arch: str = "unetmore"  # unetmore | unetmore3d | unetmorepseudo3d | unet
    type: str = "v1"
    time_conditional: bool = True
    dropout: float = 0.0
    sigma_dist: str = "linear"  # linear | cosine | geometric
    sigma_begin: float = 0.02
    sigma_end: float = 0.0001
    num_classes: int = 1000  # T: number of diffusion steps
    ema: bool = True
    ema_rate: float = 0.999
    spec_norm: bool = False
    normalization: str = "InstanceNorm++"
    nonlinearity: str = "swish"
    ngf: int = 192
    ch_mult: Tuple[int, ...] = (1, 1, 2, 3, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (8, 16, 32)
    n_head_channels: int = 192
    conditional: bool = True
    # 'positional' (the reference hardcodes this, ncsnpp_more.py:66) or
    # 'fourier' (GaussianFourierProjection over log noise levels — present
    # in the reference code but unreachable from its configs)
    embedding_type: str = "positional"
    noise_in_cond: bool = False
    output_all_frames: bool = False
    cond_emb: bool = False
    spade: bool = False
    spade_dim: int = 128


@dataclass
class SamplingConfig:
    batch_size: int = 200
    data_init: bool = False
    ckpt_id: int = 0
    final_only: bool = True
    fid: bool = False
    ssim: bool = True
    fvd: bool = True
    denoise: bool = True
    subsample: int = 100
    num_samples4fid: int = 10000
    num_samples4fvd: int = 10000
    inpainting: bool = False
    interpolation: bool = False
    n_interpolations: int = 15
    consistent: bool = True
    step_lr: float = 0.0
    n_steps_each: int = 0
    train: bool = False
    num_frames_pred: int = 28
    clip_before: bool = True
    max_data_iter: int = 1000
    init_prev_t: float = -1.0
    one_frame_at_a_time: bool = False
    preds_per_test: int = 1
    # Mixed-precision sampling hedge (docs/BF16.md): "f32:K" runs the first
    # K (highest-t) sampler steps through an f32 UNet and the remainder in
    # the predictor's compute dtype (bf16 on the throughput path). The
    # high-t steps are where eps-hat rounding is amplified by 1/sqrt(alpha_t)
    # in the x0 estimate (reference models/__init__.py:289-292), so spending
    # f32 there buys most of the fidelity at a fraction of the cost.
    # "" = uniform compute dtype (default).
    precision_schedule: str = ""


@dataclass
class OptimConfig:
    weight_decay: float = 0.0
    optimizer: str = "Adam"
    lr: float = 1e-4
    warmup: int = 5000
    beta1: float = 0.9
    amsgrad: bool = False
    eps: float = 0.0
    grad_clip: float = 1.0


@dataclass
class CodecConfig:
    """ELIC codec hyper-parameters (reference: Network.py:74-170)."""

    N: int = 192  # main channel count
    M: int = 320  # latent channel count
    num_slices: int = 5
    groups: Tuple[int, ...] = (16, 16, 32, 64, 192)  # uneven channel groups
    patch: int = 64  # pad H,W to multiples of this before coding
    # Default (round 3): the TRANSMISSIBLE path. Keyframes are coded through
    # the host-CPU entropy-parameter programs whose streams a separately
    # running receiver decodes bit-exactly — default `tvc sweep` outputs are
    # therefore decodable from TVC1 containers alone. Setting this False
    # (CLI: `--sim-codec`) opts into the fused single-device-program
    # simulation: rate-exact and self-consistent (the reference's own
    # in-process semantics, city_sender.py simulates both ends in one
    # process), faster per keyframe event, but its streams are only
    # guaranteed decodable by the encoder's own compiled programs. The TVC1
    # container path always forces exact=True regardless of this flag
    # (tvc/pipeline/sender.py run_gop keep_streams branch).
    exact_streams: bool = True
    # Where the shared entropy-parameter executables run (coding.py):
    #   "cpu"    — pinned host-CPU programs (right for tunneled/remote
    #              devices where every blocking fetch costs a long RTT);
    #   "device" — the accelerator (production choice on local TPU hosts:
    #              ~0.2 ms dispatch, and the chain's convs take ~1 ms on the
    #              MXU vs ~80 ms on a 2-core cloud-VM CPU). Sender and
    #              receiver must use the same backend.
    entropy_backend: str = "cpu"


@dataclass
class MeshConfig:
    """Device-mesh / parallelism layout (tvc-only; the reference is single-GPU)."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1: all devices
    model_parallel: int = 1


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    codec: CodecConfig = field(default_factory=CodecConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    seed: int = 1234
    # computation dtype for the diffusion UNet ("float32" | "bfloat16")
    compute_dtype: str = "float32"

    # ---- derived quantities ----
    @property
    def n_frames(self) -> int:
        return self.data.num_frames + self.data.num_frames_cond + self.data.num_frames_future

    def validate(self) -> None:
        # reference validation asserts: city_sender.py:157-166
        if self.model.cond_emb:
            assert self.data.prob_mask_cond > 0, "cond_emb requires prob_mask_cond > 0"
        if self.data.prob_mask_sync:
            assert (
                self.data.prob_mask_cond > 0
                and self.data.prob_mask_cond == self.data.prob_mask_future
            ), "prob_mask_sync requires equal nonzero cond/future mask probs"
        if self.model.output_all_frames:
            # reference forces noise_in_cond in this case (city_sender.py:157-159)
            self.model.noise_in_cond = True


_SECTIONS = {
    "data": DataConfig,
    "model": ModelConfig,
    "sampling": SamplingConfig,
    "optim": OptimConfig,
    "codec": CodecConfig,
    "mesh": MeshConfig,
}


def _coerce(cls_field_type: Any, value: Any) -> Any:
    """Coerce a parsed value to a dataclass field's declared type."""
    origin = getattr(cls_field_type, "__origin__", None)
    if origin is tuple:
        return tuple(value)
    if cls_field_type is float and isinstance(value, int):
        return float(value)
    return value


def _apply_section(dc: Any, d: dict) -> Any:
    hints = {f.name: f.type for f in dataclasses.fields(dc)}
    for k, v in d.items():
        if k not in hints:
            # tolerate unknown keys (the reference YAML carries vestigial ones)
            continue
        ft = type(getattr(dc, k))
        if isinstance(getattr(dc, k), tuple):
            v = tuple(v)
        elif ft is float and isinstance(v, int):
            v = float(v)
        setattr(dc, k, v)
    return dc


def config_from_dict(d: dict) -> Config:
    cfg = Config()
    for section, sub in d.items():
        if section in _SECTIONS and isinstance(sub, dict):
            _apply_section(getattr(cfg, section), sub)
        elif hasattr(cfg, section) and not isinstance(sub, dict):
            setattr(cfg, section, sub)
    cfg.validate()
    return cfg


def load_config(path: Optional[str] = None, overrides: Sequence[str] = ()) -> Config:
    """Load a YAML config and apply ``section.key=value`` overrides.

    The override mini-language matches the reference's ``--config_mod``
    (``city_sender.py:141-154``) but parses values with ``ast.literal_eval``
    (falling back to string) instead of ``eval``.
    """
    d: dict = {}
    if path is not None:
        with open(path, "r") as f:
            d = yaml.safe_load(f) or {}
    cfg = config_from_dict(d)
    apply_overrides(cfg, overrides)
    cfg.validate()
    return cfg


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    items: List[str] = []
    for ov in overrides:
        items.extend(s for s in ov.split(" ") if s)
    for item in items:
        key, _, raw = item.partition("=")
        section, _, name = key.partition(".")
        target = getattr(cfg, section, None)
        if target is None or not hasattr(target, name):
            raise KeyError(f"unknown config key: {key}")
        try:
            val = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            val = raw  # plain string
        if isinstance(getattr(target, name), tuple) and isinstance(val, (list, tuple)):
            val = tuple(val)
        if isinstance(getattr(target, name), float) and isinstance(val, int):
            val = float(val)
        setattr(target, name, val)
    return cfg


def config_to_dict(cfg: Config) -> dict:
    return dataclasses.asdict(cfg)


def save_config(cfg: Config, path: str, extra: Optional[dict] = None) -> None:
    """Dump the run config for provenance (city_sender.py:201-205).

    `extra` merges additional top-level provenance keys into the YAML —
    e.g. ``{"provenance": {"calibrated": False, ...}}`` when a sweep was
    forced to run with uncalibrated metric weights (--allow-uncalibrated)."""
    d = config_to_dict(cfg)
    if extra:
        d.update(extra)
    with open(path, "w") as f:
        yaml.safe_dump(d, f, default_flow_style=False)
