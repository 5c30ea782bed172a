"""Training: RLOO (TPM schedule policy), DRaFT (LoRA reward-gradient),
Diffusion-DPO (preference pairs), consistency distillation (LCM-LoRA)."""

from tpdm_tpu.train.config import RLOOConfig
from tpdm_tpu.train.distill import (
    DistillConfig,
    DistillTrainer,
    make_few_step_sampler,
)
from tpdm_tpu.train.draft import DraftConfig, DraftTrainer
from tpdm_tpu.train.rloo import (
    RLOOTrainer,
    TPDMAgent,
    compute_beta_kl_penalty,
    discounted_rewards,
    ppo_loss,
    rloo_advantages,
)

__all__ = [
    "DistillConfig",
    "DistillTrainer",
    "DraftConfig",
    "DraftTrainer",
    "RLOOConfig",
    "RLOOTrainer",
    "TPDMAgent",
    "compute_beta_kl_penalty",
    "discounted_rewards",
    "make_few_step_sampler",
    "ppo_loss",
    "rloo_advantages",
]
