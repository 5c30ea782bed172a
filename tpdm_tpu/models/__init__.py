"""Model definitions (flax.linen): MMDiT, TPM, VAE, text encoders."""

from tpdm_tpu.models.lora import apply_lora, init_lora, lora_param_count
from tpdm_tpu.models.mmdit import MMDiT, MMDiTConfig
from tpdm_tpu.models.tpm import TimePredictor, reshape_tokens_to_2d

__all__ = [
    "MMDiT",
    "MMDiTConfig",
    "TimePredictor",
    "apply_lora",
    "init_lora",
    "lora_param_count",
    "reshape_tokens_to_2d",
]
