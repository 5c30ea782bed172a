"""Reward models in JAX: ImageReward (training default) and alt scorers.

All scorers implement `score(prompts_ids_or_text, images_uint8) -> np.ndarray`
— the protocol the RLOO trainer consumes (reference wires ImageReward via
configs/models/image_reward.yaml:1-3 and calls reward_model.score per
sample; here scoring is batched on-device).
"""

from tpdm_tpu.rewards.bert import BertMedDecoder, greedy_caption
from tpdm_tpu.rewards.image_reward import ImageRewardModel, convert_blip_decoder

__all__ = [
    "ImageRewardModel",
    "BertMedDecoder",
    "greedy_caption",
    "convert_blip_decoder",
]
