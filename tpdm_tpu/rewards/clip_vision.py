"""CLIP vision transformer with projection (transformers parity).

Shared tower for the alternative scorers the reference ships — CLIPScore
(reference: src/reward_models/ImageReward/models/CLIPScore.py:17-77),
AestheticScore (models/AestheticScore.py:20-94), and PickScore
(src/reward_models/PickScore/model.py:9-53).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def vit_l_14(cls, **kw) -> "CLIPVisionConfig":
        return cls(**kw)

    @classmethod
    def vit_h_14(cls, **kw) -> "CLIPVisionConfig":
        d = dict(
            hidden_size=1280,
            intermediate_size=5120,
            num_hidden_layers=32,
            num_attention_heads=16,
            projection_dim=1024,
            hidden_act="gelu",
        )
        d.update(kw)
        return cls(**d)

    @classmethod
    def toy(cls, **kw) -> "CLIPVisionConfig":
        d = dict(
            hidden_size=24,
            intermediate_size=48,
            num_hidden_layers=2,
            num_attention_heads=3,
            image_size=16,
            patch_size=8,
            projection_dim=20,
        )
        d.update(kw)
        return cls(**d)


class _VisionLayer(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from tpdm_tpu.models.clip_text import _act

        cfg = self.config
        b, n, d = x.shape
        h = cfg.num_attention_heads
        hd = d // h
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name=name
        )

        y = ln("layer_norm1")(x)
        q = nn.Dense(d, dtype=cfg.dtype, name="q_proj")(y)
        k = nn.Dense(d, dtype=cfg.dtype, name="k_proj")(y)
        v = nn.Dense(d, dtype=cfg.dtype, name="v_proj")(y)
        q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * hd**-0.5, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, dtype=cfg.dtype, name="out_proj")(o)

        y = ln("layer_norm2")(x)
        y = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(y)
        y = _act(cfg.hidden_act)(y)
        y = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(y)
        return x + y


class CLIPVisionModel(nn.Module):
    """Returns (last_hidden, pooled, projected)."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jax.Array):
        """pixels: (b, 3, H, W) CLIP-normalized."""
        cfg = self.config
        b = pixels.shape[0]
        p = cfg.patch_size
        x = pixels.transpose(0, 2, 3, 1)
        x = nn.Conv(
            cfg.hidden_size, (p, p), strides=p, padding="VALID", use_bias=False,
            dtype=cfg.dtype, name="patch_embedding",
        )(x)
        x = x.reshape(b, -1, cfg.hidden_size)
        n = x.shape[1]

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n + 1, cfg.hidden_size),
        )
        x = jnp.concatenate(
            [jnp.tile(cls.astype(x.dtype)[None, None], (b, 1, 1)), x], axis=1
        )
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="pre_layrnorm"
        )(x)

        for i in range(cfg.num_hidden_layers):
            x = _VisionLayer(cfg, name=f"layers_{i}")(x)

        pooled = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="post_layernorm"
        )(x[:, 0])
        projected = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
            name="visual_projection",
        )(pooled)
        return x, pooled, projected
