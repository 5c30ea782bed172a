"""Training: RLOO (TPM schedule policy) + DRaFT (LoRA reward-gradient)."""

from tpdm_tpu.train.config import RLOOConfig
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
    "DraftConfig",
    "DraftTrainer",
    "RLOOConfig",
    "RLOOTrainer",
    "TPDMAgent",
    "compute_beta_kl_penalty",
    "discounted_rewards",
    "ppo_loss",
    "rloo_advantages",
]
