"""SD1.5 UNet in flax.linen, returning the TPDM four-output contract.

Architecture parity with the reference `CustomizedUNet2DConditionModel`
(reference: src/models/stable_diffusion_v1_5/unet_sd_v1_5.py:71-1318) —
diffusers' SD1.5 UNet forked to also return `t_emb`, `hidden_states_1`
(post-conv_in, :1172-1173) and `hidden_states_2` (post-conv_norm_out/silu,
pre-conv_out, :1304-1309); tuple return at :1316.

Fixed SD1.x topology (3 cross-attn down blocks + plain block, cross-attn
mid, mirrored up path), configurable widths; convs run NHWC internally.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpdm_tpu.models.layers import GroupNorm, sinusoidal_timestep_embedding


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    num_attention_heads: int = 8  # SD1.x: 8 heads of dim C/8
    norm_num_groups: int = 32
    sample_size: int = 64
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def sd15(cls, **kw) -> "UNetConfig":
        return cls(**kw)

    @classmethod
    def toy(cls, **kw) -> "UNetConfig":
        d = dict(
            block_out_channels=(8, 12, 16, 16),
            layers_per_block=1,
            cross_attention_dim=24,
            num_attention_heads=2,
            norm_num_groups=4,
            sample_size=16,
        )
        d.update(kw)
        return cls(**d)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


class ResnetBlockTimeEmb(nn.Module):
    """diffusers ResnetBlock2D with time-embedding injection."""

    out_channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        # diffusers ResnetBlock2D norm eps is 1e-5 (the Transformer2DModel
        # GroupNorm keeps 1e-6) — verified by the full-stack torch oracle
        h = GroupNorm(self.groups, in_ch, eps=1e-5, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, self.out_channels, eps=1e-5, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class _CrossAttnBlock(nn.Module):
    """diffusers BasicTransformerBlock: self-attn, cross-attn, GEGLU ff."""

    dim: int
    heads: int
    ctx_dim: int
    dtype: jnp.dtype = jnp.float32

    def _attn(self, x, y, prefix):
        from tpdm_tpu.ops.attention import joint_attention

        d = self.dim
        h = self.heads
        hd = d // h
        b, n, _ = x.shape
        m = y.shape[1]
        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name=f"{prefix}_to_q")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name=f"{prefix}_to_k")(y)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name=f"{prefix}_to_v")(y)
        q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, h, hd).transpose(0, 2, 1, 3)
        # flash kernel on TPU (the 64x64-latent self-attention is 4096
        # tokens per level-0 layer); fp32 keeps the jnp reference path for
        # exact oracle parity (same pattern as flux.py:170)
        o = joint_attention(
            q, k, v, use_pallas=False if self.dtype == jnp.float32 else None
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, name=f"{prefix}_to_out")(o)

    @nn.compact
    def __call__(self, x: jax.Array, ctx: jax.Array) -> jax.Array:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        n1 = ln("norm1")(x)
        x = x + self._attn(n1, n1, "attn1")
        x = x + self._attn(ln("norm2")(x), ctx, "attn2")
        y = ln("norm3")(x)
        gate = nn.Dense(8 * self.dim, dtype=self.dtype, name="ff_proj")(y)
        a, g = jnp.split(gate, 2, axis=-1)
        y = a * nn.gelu(g, approximate=False)  # GEGLU
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(y)
        return x


class SpatialTransformer(nn.Module):
    """diffusers Transformer2DModel (conv projections, 1 basic block)."""

    dim: int
    heads: int
    ctx_dim: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, ctx: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        res = x
        h = GroupNorm(self.groups, c, name="norm")(x)
        h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(b, hh * ww, self.dim)
        h = _CrossAttnBlock(
            self.dim, self.heads, self.ctx_dim, self.dtype, name="block"
        )(h, ctx)
        h = h.reshape(b, hh, ww, self.dim)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + res


class UNetSD15(nn.Module):
    """Returns (noise_pred, t_emb, h1, h2); NCHW at the public boundary."""

    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (b, 4, 64, 64) NCHW
        timestep: jax.Array,  # (b,) float in [0, 999]
        encoder_hidden_states: jax.Array,  # (b, 77, 768)
    ):
        cfg = self.config
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        ctx = encoder_hidden_states

        t_feat = sinusoidal_timestep_embedding(timestep, ch[0]).astype(cfg.dtype)
        temb = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype, name="time_linear_1")(
            t_feat
        )
        temb = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype, name="time_linear_2")(
            nn.silu(temb)
        )

        x = latents.transpose(0, 2, 3, 1)
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(x)
        h1 = x.transpose(0, 3, 1, 2)  # reference :1172-1173

        skips = [x]
        # down path: 3 cross-attn blocks + 1 plain, downsample between
        for i, out_ch in enumerate(ch):
            is_last = i == len(ch) - 1
            for j in range(cfg.layers_per_block):
                x = ResnetBlockTimeEmb(
                    out_ch, g, cfg.dtype, name=f"down_{i}_resnet_{j}"
                )(x, temb)
                if not is_last:
                    x = SpatialTransformer(
                        out_ch,
                        cfg.num_attention_heads,
                        cfg.cross_attention_dim,
                        g,
                        cfg.dtype,
                        name=f"down_{i}_attn_{j}",
                    )(x, ctx)
                skips.append(x)
            if not is_last:
                x = nn.Conv(
                    out_ch, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                    dtype=cfg.dtype, name=f"down_{i}_downsample",
                )(x)
                skips.append(x)

        # mid
        x = ResnetBlockTimeEmb(ch[-1], g, cfg.dtype, name="mid_resnet_0")(x, temb)
        x = SpatialTransformer(
            ch[-1], cfg.num_attention_heads, cfg.cross_attention_dim, g,
            cfg.dtype, name="mid_attn",
        )(x, ctx)
        x = ResnetBlockTimeEmb(ch[-1], g, cfg.dtype, name="mid_resnet_1")(x, temb)

        # up path (mirror)
        for i, out_ch in enumerate(reversed(ch)):
            is_first = i == 0
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlockTimeEmb(
                    out_ch, g, cfg.dtype, name=f"up_{i}_resnet_{j}"
                )(x, temb)
                if not is_first:
                    x = SpatialTransformer(
                        out_ch,
                        cfg.num_attention_heads,
                        cfg.cross_attention_dim,
                        g,
                        cfg.dtype,
                        name=f"up_{i}_attn_{j}",
                    )(x, ctx)
            if i < len(ch) - 1:
                b_, hh, ww, c_ = x.shape
                x = jax.image.resize(x, (b_, 2 * hh, 2 * ww, c_), "nearest")
                x = nn.Conv(
                    out_ch, (3, 3), padding=1, dtype=cfg.dtype,
                    name=f"up_{i}_upsample",
                )(x)

        x = GroupNorm(g, ch[0], eps=1e-5, name="conv_norm_out")(x)
        x = nn.silu(x)
        h2 = x.transpose(0, 3, 1, 2)  # reference :1304-1309
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype, name="conv_out")(x)
        # The TPM conditions on the PRE-MLP 320-dim sinusoidal t_emb, not the
        # 1280-dim internal embedding (reference unet_sd_v1_5.py:929,1316;
        # the SD1.5 TPM's AdaGroupNorm is built with input_dim = 320,
        # modeling_sd_v1_5.py:100).
        return x.transpose(0, 3, 1, 2), t_feat, h1, h2
