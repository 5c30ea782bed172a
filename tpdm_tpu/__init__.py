"""TPDM-TPU: a TPU-native framework for Diffusion Time Prediction models.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the TPDM
reference ("Schedule On the Fly: Diffusion Time Prediction for Faster and
Better Image Generation", CVPR 2025, arXiv 2412.01243):

- SD3-medium MMDiT denoiser, CLIP-L/G + T5 text encoders, SD3 VAE — all
  implemented in flax.linen with Pallas flash-attention on the hot path.
- A ~7M-param Time Prediction Module (TPM) that emits Beta(alpha, beta)
  parameters per denoising step; the sampled (or modal) ratio decays the
  per-sample noise level sigma, producing adaptive, self-terminating
  schedules.
- The whole adaptive sampling loop runs inside one `jax.lax.scan` under
  `jit` — no host round-trips — with done-masks standing in for the
  reference's data-dependent early break.
- An RLOO/PPO trainer for the TPM against ImageReward, data-parallel over a
  `jax.sharding.Mesh` with the frozen towers sharded via GSPMD.

Subpackages:
    ops       Core math: Beta distribution, flow/DPM solvers, ref schedules.
    models    MMDiT, TPM, VAE, text encoders (flax.linen).
    pipeline  Adaptive sampler + end-to-end generation pipeline.
    parallel  Mesh construction and sharding rules.
    rewards   ImageReward and other scorers, in JAX.
    train     RLOO trainer, config, callbacks, checkpointing.
    data      Prompt datasets and collators.
    utils     Weight conversion, image post-processing, profiling.
"""

__version__ = "0.1.0"
