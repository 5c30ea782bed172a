"""RLOO training: config, agent protocol, trainer, checkpointing."""

from tpdm_tpu.train.config import RLOOConfig
from tpdm_tpu.train.rloo import (
    RLOOTrainer,
    TPDMAgent,
    compute_beta_kl_penalty,
    discounted_rewards,
    ppo_loss,
    rloo_advantages,
)

__all__ = [
    "RLOOConfig",
    "RLOOTrainer",
    "TPDMAgent",
    "compute_beta_kl_penalty",
    "discounted_rewards",
    "ppo_loss",
    "rloo_advantages",
]
