"""timm/BLIP-style Vision Transformer (ImageReward's visual encoder).

Matches the BLIP ViT (reference:
src/reward_models/ImageReward/models/BLIP/vit.py:109-300): conv patchify,
cls token, learned pos embed, pre-norm blocks with fused qkv, final
LayerNorm. Checkpoint keys convert from the BLIP/timm naming
(blocks.{i}.attn.qkv / mlp.fc1 / ...).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def blip_large(cls, **kw) -> "ViTConfig":
        return cls(**kw)

    @classmethod
    def blip_base(cls, **kw) -> "ViTConfig":
        d = dict(embed_dim=768, depth=12, num_heads=12)
        d.update(kw)
        return cls(**d)

    @classmethod
    def toy(cls, **kw) -> "ViTConfig":
        d = dict(image_size=16, patch_size=8, embed_dim=24, depth=2, num_heads=3)
        d.update(kw)
        return cls(**d)


class ViTBlock(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        d = cfg.embed_dim
        h = cfg.num_heads
        hd = d // h
        b, n, _ = x.shape
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name=name
        )

        y = ln("norm1")(x)
        qkv = nn.Dense(3 * d, dtype=cfg.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4), 3)
        q, k, v = q[0], k[0], v[0]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * hd**-0.5, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, dtype=cfg.dtype, name="proj")(o)

        y = ln("norm2")(x)
        y = nn.Dense(int(d * cfg.mlp_ratio), dtype=cfg.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=cfg.dtype, name="fc2")(y)
        return x + y


class ViT(nn.Module):
    """Returns token embeddings (b, 1 + n_patches, embed_dim)."""

    config: ViTConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """pixels: (b, 3, H, W) normalized."""
        cfg = self.config
        b = pixels.shape[0]
        p = cfg.patch_size
        x = pixels.transpose(0, 2, 3, 1)  # NHWC
        x = nn.Conv(
            cfg.embed_dim, (p, p), strides=p, padding="VALID",
            dtype=cfg.dtype, name="patch_embed",
        )(x)
        x = x.reshape(b, -1, cfg.embed_dim)

        n = x.shape[1]
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim)
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n + 1, cfg.embed_dim)
        )
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (b, 1, 1)), x], axis=1)
        x = x + pos.astype(x.dtype)

        for i in range(cfg.depth):
            x = ViTBlock(cfg, name=f"blocks_{i}")(x)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm"
        )(x)
