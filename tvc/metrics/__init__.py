from tvc.metrics.frechet import compute_stats, frechet_distance
from tvc.metrics.fvd import FVDMetric, preprocess_video
from tvc.metrics.lpips import LPIPS, LPIPSMetric, lpips_video
from tvc.metrics.pixel import per_frame_psnr, psnr, psnr_jax, ssim, ssim_jax
from tvc.metrics.rd import (
    fvd_envelope,
    lpips_envelope,
    process_data_and_save,
    psnr_envelope,
)

__all__ = [
    "compute_stats",
    "frechet_distance",
    "FVDMetric",
    "preprocess_video",
    "LPIPS",
    "LPIPSMetric",
    "lpips_video",
    "per_frame_psnr",
    "psnr",
    "psnr_jax",
    "ssim",
    "ssim_jax",
    "fvd_envelope",
    "lpips_envelope",
    "process_data_and_save",
    "psnr_envelope",
]
