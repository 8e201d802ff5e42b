from tvc.losses.dsm import anneal_dsm_score_estimation
from tvc.losses.ema import EMAHelper, ema_update
from tvc.losses.optimizers import get_optimizer, warmup_schedule

__all__ = [
    "anneal_dsm_score_estimation",
    "EMAHelper",
    "ema_update",
    "get_optimizer",
    "warmup_schedule",
]
