"""ImageReward: BLIP (ViT-L + BERT-med cross-attn) + MLP head, in JAX.

The training reward model (reference wires it via
configs/models/image_reward.yaml; scoring math at
src/reward_models/ImageReward/ImageReward.py:105-142):

    image_embeds = vit(image_224)
    txt = bert(prompt_ids, cross_attend=image_embeds).last_hidden[:, 0]
    r = mlp(txt);  score = (r - mean)/std + 3*std

The reference scores images one at a time in a Python loop
(modeling_sd3_pnt.py:828-842); here the whole batch scores in one jitted
call.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpdm_tpu.rewards.bert import BertMedConfig, BertMedModel
from tpdm_tpu.rewards.vit import ViT, ViTConfig

# normalization constants (ImageReward.py:83-84)
IR_MEAN = 0.16717362830052426
IR_STD = 1.0333394966054072


class RewardMLP(nn.Module):
    """768 -> 1024 -> 128 -> 64 -> 16 -> 1; plain linear stack (the
    reference's activations are commented out, ImageReward.py:48-61)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, width in enumerate((1024, 128, 64, 16, 1)):
            x = nn.Dense(width, dtype=self.dtype, name=f"fc{i}")(x)
        return x


class ImageRewardNet(nn.Module):
    vit_config: ViTConfig
    bert_config: BertMedConfig

    @nn.compact
    def __call__(self, pixels: jax.Array, input_ids: jax.Array, text_mask=None):
        image_embeds = ViT(self.vit_config, name="visual_encoder")(pixels)
        txt = BertMedModel(self.bert_config, name="text_encoder")(
            input_ids,
            attention_mask=text_mask,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=None,
        )
        return RewardMLP(dtype=self.vit_config.dtype, name="mlp")(txt[:, 0])[:, 0]


@dataclasses.dataclass
class ImageRewardModel:
    """score(prompt_ids, images_uint8) -> np.ndarray of reference-normalized
    rewards. Tokenize prompts on host (BertTokenizer, max_length 35,
    ImageReward.py:111-112); pass the ids here.
    """

    net: ImageRewardNet
    params: dict
    image_size: int = 224

    @classmethod
    def create(
        cls,
        params: Optional[dict] = None,
        vit_config: Optional[ViTConfig] = None,
        bert_config: Optional[BertMedConfig] = None,
        seed: int = 0,
    ) -> "ImageRewardModel":
        vit_config = vit_config or ViTConfig.blip_large()
        bert_config = bert_config or BertMedConfig.image_reward()
        net = ImageRewardNet(vit_config, bert_config)
        if params is None:
            params = net.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 3, vit_config.image_size, vit_config.image_size)),
                jnp.zeros((1, 5), jnp.int32),
            )
        model = cls(net=net, params=params, image_size=vit_config.image_size)
        model._score_jit = jax.jit(model._raw_scores)
        return model

    def _raw_scores(self, params, pixels, ids, mask):
        return self.net.apply(params, pixels, ids, mask)

    def _check_ids(self, prompt_ids: np.ndarray) -> None:
        # Out-of-vocab ids hit JAX's default out-of-bounds gather ("fill"),
        # which silently yields NaN embeddings and NaN rewards downstream;
        # fail loudly on host instead (torch would have raised here too).
        vocab = self.net.bert_config.vocab_size
        ids = np.asarray(prompt_ids)
        if ids.size and (ids.min() < 0 or ids.max() >= vocab):
            raise ValueError(
                f"prompt ids out of range for vocab_size={vocab}: "
                f"min={ids.min()}, max={ids.max()} — tokenizer/model mismatch?"
            )

    def score(
        self,
        prompt_ids: np.ndarray,  # (b, n) int
        images: np.ndarray,  # (b, H, W, 3) uint8
        text_mask: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Batched reference-normalized scores: (r-mean)/std + 3*std
        (ImageReward.py:140)."""
        from tpdm_tpu.utils.image import bicubic_resize_center_crop, normalize_clip

        self._check_ids(prompt_ids)
        pixels = normalize_clip(bicubic_resize_center_crop(images, self.image_size))
        mask = (
            jnp.asarray(text_mask)
            if text_mask is not None
            else jnp.ones(prompt_ids.shape, bool)
        )
        r = self._score_jit(
            self.params, jnp.asarray(pixels), jnp.asarray(prompt_ids), mask
        )
        return np.asarray((r - IR_MEAN) / IR_STD + 3 * IR_STD)

    def score_grad(self, params, pixels, ids, mask=None):
        """Differentiable path, (r-mean)/std without the +3σ shift
        (parity: score_gard, ImageReward.py:87-103)."""
        if mask is None:
            mask = jnp.ones(ids.shape, bool)
        r = self.net.apply(params, pixels, ids, mask)
        return (r - IR_MEAN) / IR_STD

    def inference_rank(
        self,
        prompt_ids: np.ndarray,  # (n,) or (1, n) — ONE prompt's token ids
        images: np.ndarray,  # (k, H, W, 3) uint8 — k candidate generations
        text_mask: Optional[np.ndarray] = None,
    ) -> tuple[list, list]:
        """Rank k candidate generations for one prompt.

        Parity with ImageReward.inference_rank (ImageReward.py:144-183), but
        batched (the reference loops the k generations one BLIP forward at a
        time). Returns (ranking, rewards) in the candidates' original order:
        ranking[i] is the 1-based rank of candidate i (1 = best) and
        rewards[i] = (r - mean)/std — the normalization WITHOUT the +3σ
        shift (:179), matching the reference exactly.
        """
        from tpdm_tpu.utils.image import bicubic_resize_center_crop, normalize_clip

        self._check_ids(prompt_ids)
        k = int(np.asarray(images).shape[0])
        ids = np.asarray(prompt_ids).reshape(1, -1).repeat(k, axis=0)
        mask = (
            np.asarray(text_mask).reshape(1, -1).repeat(k, axis=0).astype(bool)
            if text_mask is not None
            else np.ones(ids.shape, bool)
        )
        pixels = normalize_clip(bicubic_resize_center_crop(images, self.image_size))
        r = self._score_jit(
            self.params, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask)
        )
        rewards = (np.asarray(r, np.float64) - IR_MEAN) / IR_STD
        order = np.argsort(-rewards, kind="stable")
        ranking = np.empty(k, dtype=int)
        ranking[order] = np.arange(1, k + 1)
        return ranking.tolist(), rewards.tolist()


# ---------------------------------------------------------------------------
# checkpoint conversion (ImageReward.pt layout: blip.visual_encoder.*,
# blip.text_encoder.*, mlp.layers.*)
# ---------------------------------------------------------------------------


def convert_image_reward(state_dict, vit_depth: int = 24, bert_layers: int = 12, dtype=None) -> dict:
    from tpdm_tpu.utils.convert import _SD, _dense, _ln

    sd = _SD(state_dict, dtype)

    vit: dict = {
        "cls_token": sd("blip.visual_encoder.cls_token"),
        "pos_embed": sd("blip.visual_encoder.pos_embed"),
        "patch_embed": {
            "kernel": sd("blip.visual_encoder.patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": sd("blip.visual_encoder.patch_embed.proj.bias"),
        },
        "norm": _ln(sd, "blip.visual_encoder.norm"),
    }
    for i in range(vit_depth):
        base = f"blip.visual_encoder.blocks.{i}"
        vit[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{base}.norm1"),
            "qkv": _dense(sd, f"{base}.attn.qkv"),
            "proj": _dense(sd, f"{base}.attn.proj"),
            "norm2": _ln(sd, f"{base}.norm2"),
            "fc1": _dense(sd, f"{base}.mlp.fc1"),
            "fc2": _dense(sd, f"{base}.mlp.fc2"),
        }

    bert = _convert_med_bert(sd, "blip.text_encoder", bert_layers)

    mlp = {
        f"fc{j}": _dense(sd, f"mlp.layers.{k}")
        for j, k in enumerate((0, 2, 4, 6, 7))
    }
    return {
        "params": {"visual_encoder": vit, "text_encoder": bert, "mlp": mlp}
    }


def _convert_med_bert(sd, prefix: str, bert_layers: int) -> dict:
    """HF/BLIP med-BERT trunk keys -> BertMedModel param tree. Shared by
    ImageReward's text encoder and the BLIP text decoder (identical
    layout; the decoder only flips the attention mask)."""
    from tpdm_tpu.utils.convert import _dense, _ln

    eb = f"{prefix}.embeddings"
    bert: dict = {
        "word_embeddings": {"embedding": sd(f"{eb}.word_embeddings.weight")},
        "position_embeddings": sd(f"{eb}.position_embeddings.weight"),
        "embeddings_ln": _ln(sd, f"{eb}.LayerNorm"),
    }
    for i in range(bert_layers):
        base = f"{prefix}.encoder.layer.{i}"
        bert[f"layer_{i}"] = {
            "attention_self": {
                "query": _dense(sd, f"{base}.attention.self.query"),
                "key": _dense(sd, f"{base}.attention.self.key"),
                "value": _dense(sd, f"{base}.attention.self.value"),
            },
            "attention_output": _dense(sd, f"{base}.attention.output.dense"),
            "attention_ln": _ln(sd, f"{base}.attention.output.LayerNorm"),
            "cross_self": {
                "query": _dense(sd, f"{base}.crossattention.self.query"),
                "key": _dense(sd, f"{base}.crossattention.self.key"),
                "value": _dense(sd, f"{base}.crossattention.self.value"),
            },
            "cross_output": _dense(sd, f"{base}.crossattention.output.dense"),
            "cross_ln": _ln(sd, f"{base}.crossattention.output.LayerNorm"),
            "intermediate": _dense(sd, f"{base}.intermediate.dense"),
            "output": _dense(sd, f"{base}.output.dense"),
            "output_ln": _ln(sd, f"{base}.output.LayerNorm"),
        }
    return bert


def convert_blip_decoder(
    state_dict, bert_layers: int = 12, prefix: str = "text_decoder",
    dtype=None,
) -> dict:
    """BLIP text-decoder checkpoint -> BertMedDecoder params.

    Layout: `{prefix}.bert.*` is the med trunk (same keys as the
    ImageReward text encoder) and `{prefix}.cls.predictions.*` is the LM
    head (transform.dense / transform.LayerNorm / decoder[+bias]) —
    reference: ImageReward/models/BLIP/med.py BertLMHeadModel +
    blip_pretrain.py:14-43. BLIP ties decoder.weight to the word
    embedding; untied checkpoints carry it explicitly — both load (tied
    ones fall back to the embedding matrix transposed)."""
    from tpdm_tpu.utils.convert import _SD, _dense, _ln

    sd = _SD(state_dict, dtype)
    bert = _convert_med_bert(sd, f"{prefix}.bert", bert_layers)
    head_base = f"{prefix}.cls.predictions"
    if sd.has(f"{head_base}.decoder.weight"):
        decoder = {
            "kernel": sd(f"{head_base}.decoder.weight").T,
            "bias": sd(f"{head_base}.bias"),
        }
    else:  # tied head: vocab projection = word embedding transposed
        decoder = {
            "kernel": bert["word_embeddings"]["embedding"].T,
            "bias": sd(f"{head_base}.bias"),
        }
    cls = {
        "transform": _dense(sd, f"{head_base}.transform.dense"),
        "transform_ln": _ln(sd, f"{head_base}.transform.LayerNorm"),
        "decoder": decoder,
    }
    return {"params": {"bert": bert, "cls": cls}}
