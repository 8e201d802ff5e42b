"""tvc — TPU-native extreme video compression engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`Extreme-Video-Compression-With-Prediction-Using-Pre-trained-Diffusion-Models`
(reference layout documented in SURVEY.md):

- ELIC-style learned image codec (analysis/synthesis transforms, hyperprior,
  space-channel checkerboard context model) for keyframes
- Conditional NCSN++ diffusion model predicting inter frames, sampled with
  DDPM/DDIM/F-PNDM loops compiled as ``jax.lax.scan``
- C++ rANS range coder (compressai-compatible stream layout) driven from the host
- Perceptual-threshold sender state machine + rate-distortion sweep
- PSNR/SSIM/LPIPS/FVD metric stack
- Multi-host sharding of videos/GOPs over a ``jax.sharding.Mesh``

Subpackage map (≅ SURVEY.md §7.1):
    core/      config tree, rng, precision policy
    ops/       FIR resampling, attention, norm/conv primitives (XLA + Pallas)
    models/    ELIC codec + NCSN++ diffusion UNet + metric backbones
    entropy/   factorized bottleneck, Gaussian conditional, C++ rANS
    samplers/  ddpm / ddim / fpndm / langevin as scan loops
    losses/    DSM training loss, optimizer factory, EMA
    pipeline/  sender state machine, keyframe inference, rate sweep
    metrics/   psnr/ssim/lpips/fvd, RD convex-hull envelope
    parallel/  mesh topology, sharding specs, collectives
    utils/     checkpoint conversion, plotting, io
    bench/     anchor + throughput harnesses
"""

__version__ = "0.1.0"
