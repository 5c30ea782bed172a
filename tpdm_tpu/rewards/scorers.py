"""Alternative reward scorers behind the common score() protocol.

Re-implements the reference's optional scorers (available but not wired
into training there either):
- CLIPScore — logit-scaled image/text cosine
  (reference: src/reward_models/ImageReward/models/CLIPScore.py:17-77)
- AestheticScore — CLIP image features -> linear MLP head
  (models/AestheticScore.py:20-94, aesthetic_predictor_v2/model.py:12-38)
- PickScore — CLIP-H dual towers, scaled cosine
  (src/reward_models/PickScore/model.py:9-53)

`load_score` dispatches by name like the reference's utils.load_score
(ImageReward/utils.py:133-183).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from tpdm_tpu.rewards.clip_vision import CLIPVisionConfig, CLIPVisionModel
from tpdm_tpu.utils.image import bicubic_resize_center_crop, normalize_clip


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class AestheticMLP(nn.Module):
    """improved-aesthetic-predictor head: 1024/128/64/16/1 with dropouts
    (identity at eval), no activations."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, w in enumerate((1024, 128, 64, 16, 1)):
            x = nn.Dense(w, dtype=self.dtype, name=f"fc{i}")(x)
        return x


@dataclasses.dataclass
class CLIPScoreModel:
    """score = logit_scale · cos(image_proj, text_proj)."""

    vision: CLIPVisionModel
    vision_params: dict
    text: CLIPTextModel
    text_params: dict
    logit_scale: float = 100.0
    image_size: int = 224

    @classmethod
    def create(cls, vision_cfg=None, text_cfg=None, seed=0, **kw):
        vision_cfg = vision_cfg or CLIPVisionConfig.vit_l_14()
        text_cfg = text_cfg or CLIPTextConfig.sd3_clip_l()
        vision = CLIPVisionModel(vision_cfg)
        text = CLIPTextModel(text_cfg)
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        vp = vision.init(
            k1, jnp.zeros((1, 3, vision_cfg.image_size, vision_cfg.image_size))
        )
        tp = text.init(k2, jnp.zeros((1, 5), jnp.int32))
        m = cls(vision, vp, text, tp, image_size=vision_cfg.image_size, **kw)
        m._jit = jax.jit(m._raw)
        return m

    def _raw(self, vp, tp, pixels, ids):
        _, _, img_proj = self.vision.apply(vp, pixels)
        _, _, _, txt_proj = self.text.apply(tp, ids)
        return self.logit_scale * jnp.sum(
            _l2norm(img_proj) * _l2norm(txt_proj), axis=-1
        )

    def score(self, prompt_ids: np.ndarray, images: np.ndarray) -> np.ndarray:
        pixels = normalize_clip(bicubic_resize_center_crop(images, self.image_size))
        return np.asarray(
            self._jit(self.vision_params, self.text_params, jnp.asarray(pixels), jnp.asarray(prompt_ids))
        )


@dataclasses.dataclass
class AestheticScoreModel:
    """MLP over l2-normalized CLIP image features; prompt-independent."""

    vision: CLIPVisionModel
    vision_params: dict
    head: AestheticMLP
    head_params: dict
    image_size: int = 224

    @classmethod
    def create(cls, vision_cfg=None, seed=0):
        vision_cfg = vision_cfg or CLIPVisionConfig.vit_l_14()
        vision = CLIPVisionModel(vision_cfg)
        head = AestheticMLP()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        vp = vision.init(
            k1, jnp.zeros((1, 3, vision_cfg.image_size, vision_cfg.image_size))
        )
        hp = head.init(k2, jnp.zeros((1, vision_cfg.projection_dim)))
        m = cls(vision, vp, head, hp, image_size=vision_cfg.image_size)
        m._jit = jax.jit(m._raw)
        return m

    def _raw(self, vp, hp, pixels):
        _, _, img_proj = self.vision.apply(vp, pixels)
        return self.head.apply(hp, _l2norm(img_proj))[:, 0]

    def score(self, prompt_ids, images: np.ndarray) -> np.ndarray:
        del prompt_ids  # aesthetic score is text-free
        pixels = normalize_clip(bicubic_resize_center_crop(images, self.image_size))
        return np.asarray(self._jit(self.vision_params, self.head_params, jnp.asarray(pixels)))


@dataclasses.dataclass
class PickScoreModel:
    """CLIP-H dual-tower preference score (yuvalkirstain/PickScore_v1)."""

    vision: CLIPVisionModel
    vision_params: dict
    text: CLIPTextModel
    text_params: dict
    logit_scale: float = 100.0
    image_size: int = 224

    @classmethod
    def create(cls, seed=0):
        vision_cfg = CLIPVisionConfig.vit_h_14()
        text_cfg = CLIPTextConfig(
            hidden_size=1024,
            intermediate_size=4096,
            num_hidden_layers=24,
            num_attention_heads=16,
            projection_dim=1024,
            hidden_act="gelu",
        )
        vision = CLIPVisionModel(vision_cfg)
        text = CLIPTextModel(text_cfg)
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        vp = vision.init(
            k1, jnp.zeros((1, 3, vision_cfg.image_size, vision_cfg.image_size))
        )
        tp = text.init(k2, jnp.zeros((1, 5), jnp.int32))
        m = cls(vision, vp, text, tp, image_size=vision_cfg.image_size)
        m._jit = jax.jit(m._raw)
        return m

    _raw = CLIPScoreModel._raw

    def score(self, prompt_ids: np.ndarray, images: np.ndarray) -> np.ndarray:
        pixels = normalize_clip(bicubic_resize_center_crop(images, self.image_size))
        return np.asarray(
            self._jit(self.vision_params, self.text_params, jnp.asarray(pixels), jnp.asarray(prompt_ids))
        )


def load_score(name: str = "ImageReward", **kw):
    """Dispatcher parity with the reference's load_score
    (ImageReward/utils.py:133-183)."""
    from tpdm_tpu.rewards.image_reward import ImageRewardModel

    name = name.lower().replace("-", "_")
    if name in ("imagereward", "image_reward", "imagereward_v1.0"):
        return ImageRewardModel.create(**kw)
    if name in ("clip", "clipscore", "clip_score"):
        return CLIPScoreModel.create(**kw)
    if name in ("aesthetic", "aestheticscore"):
        return AestheticScoreModel.create(**kw)
    if name in ("pickscore", "pick_score"):
        return PickScoreModel.create(**kw)
    if name in ("blip", "blipscore", "blip_score"):
        return BLIPScoreModel.create(**kw)
    if name in ("aesthetic_v2_5", "aesthetic_v25", "siglip_aesthetic"):
        from tpdm_tpu.rewards.siglip import AestheticV25Model

        return AestheticV25Model.create(**kw)
    raise ValueError(f"unknown scorer: {name}")


@dataclasses.dataclass
class BLIPScoreModel:
    """BLIP contrastive (ITC) score: cos(vision_proj(img CLS),
    text_proj(txt CLS)) with l2 norms; text runs WITHOUT cross-attention
    (mode='text'). Parity: reference models/BLIPScore.py:39-69.
    """

    vit: "object"
    vit_params: dict
    bert: "object"
    bert_params: dict
    vision_proj: dict  # {"kernel", "bias"}
    text_proj: dict
    image_size: int = 224

    @classmethod
    def create(cls, vit_cfg=None, bert_cfg=None, embed_dim: int = 256, seed=0):
        import jax.random as jr

        from tpdm_tpu.rewards.bert import BertMedConfig, BertMedModel
        from tpdm_tpu.rewards.vit import ViT, ViTConfig

        vit_cfg = vit_cfg or ViTConfig.blip_large()
        bert_cfg = bert_cfg or BertMedConfig.image_reward()
        vit = ViT(vit_cfg)
        bert = BertMedModel(bert_cfg)
        k1, k2, k3, k4 = jr.split(jr.PRNGKey(seed), 4)
        vp = vit.init(k1, jnp.zeros((1, 3, vit_cfg.image_size, vit_cfg.image_size)))
        bp = bert.init(k2, jnp.zeros((1, 4), jnp.int32))
        vproj = {
            "kernel": jax.random.normal(k3, (vit_cfg.embed_dim, embed_dim)) * 0.02,
            "bias": jnp.zeros((embed_dim,)),
        }
        tproj = {
            "kernel": jax.random.normal(k4, (bert_cfg.hidden_size, embed_dim)) * 0.02,
            "bias": jnp.zeros((embed_dim,)),
        }
        m = cls(vit, vp, bert, bp, vproj, tproj, image_size=vit_cfg.image_size)
        m._jit = jax.jit(m._raw)
        return m

    def _raw(self, vp, bp, vproj, tproj, pixels, ids, mask):
        img_cls = self.vit.apply(vp, pixels)[:, 0]
        img_f = _l2norm(img_cls @ vproj["kernel"] + vproj["bias"])
        txt_cls = self.bert.apply(bp, ids, mask, None, None)[:, 0]
        txt_f = _l2norm(txt_cls @ tproj["kernel"] + tproj["bias"])
        return jnp.sum(img_f * txt_f, axis=-1)

    def score(self, prompt_ids: np.ndarray, images: np.ndarray, text_mask=None) -> np.ndarray:
        pixels = normalize_clip(bicubic_resize_center_crop(images, self.image_size))
        if text_mask is None:
            # BERT pads with id 0 — mask padding like the reference does via
            # the tokenizer's attention_mask (models/BLIPScore.py:55)
            text_mask = np.asarray(prompt_ids) != 0
        return np.asarray(
            self._jit(
                self.vit_params, self.bert_params, self.vision_proj,
                self.text_proj, jnp.asarray(pixels), jnp.asarray(prompt_ids),
                jnp.asarray(text_mask),
            )
        )
