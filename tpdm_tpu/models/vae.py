"""SD3 VAE (AutoencoderKL) in flax.linen, NHWC on TPU.

Architecture parity with diffusers `AutoencoderKL` as configured for SD3
(block_out_channels (128, 256, 512, 512), 2 layers/block, GN(32, eps 1e-6),
16 latent channels, no quant convs). The reference loads it pretrained and
uses decode for rollout images (reference:
src/models/stable_diffusion_3/modeling_sd3_pnt.py:144-146,629-655); encode
is included for completeness (img2img, training-data pipelines).

Public API is NCHW at the boundary (reference latent layout (b, 16, h, w));
convs run NHWC internally — the native TPU conv layout.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpdm_tpu.models.layers import GroupNorm


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Autoencoder geometry/weights config (diffusers AutoencoderKL
    layout; reference consumes it via the diffusers dependency)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 1.5305
    shift_factor: float = 0.0609
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def sd3(cls, **kw) -> "VAEConfig":
        return cls(**kw)

    @classmethod
    def sd15(cls, **kw) -> "VAEConfig":
        d = dict(
            latent_channels=4,
            scaling_factor=0.18215,
            shift_factor=0.0,
        )
        d.update(kw)
        return cls(**d)

    @classmethod
    def sdxl(cls, **kw) -> "VAEConfig":
        """SDXL's AutoencoderKL: same 4-channel topology as SD1.5 but a
        different scaling factor (diffusers sdxl vae/config.json:
        scaling_factor=0.13025). Wiring a real SDXL VAE with the SD3
        default (1.5305, 0.0609) or sd15() (0.18215) decodes silently
        wrong — use this preset for SDXLPipeline/serving."""
        d = dict(
            latent_channels=4,
            scaling_factor=0.13025,
            shift_factor=0.0,
        )
        d.update(kw)
        return cls(**d)

    @classmethod
    def toy(cls, **kw) -> "VAEConfig":
        d = dict(
            latent_channels=4,
            block_out_channels=(8, 16),
            norm_num_groups=4,
            layers_per_block=1,
        )
        d.update(kw)
        return cls(**d)


def vae_scale_factor(config: VAEConfig) -> int:
    """Image pixels per latent cell: every down/up block after the first
    changes resolution 2x (diffusers AutoencoderKL convention — SD VAEs'
    4 blocks -> 8; the toy test config's 2 blocks -> 2)."""
    return 2 ** (len(config.block_out_channels) - 1)


class ResnetBlock(nn.Module):
    """diffusers ResnetBlock2D: GN -> silu -> conv, twice, plus shortcut."""

    out_channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_channels = x.shape[-1]
        h = GroupNorm(self.groups, in_channels, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(self.groups, self.out_channels, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention with residual (VAE mid block)."""

    channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from tpdm_tpu.ops.attention import joint_attention

        b, hgt, wid, c = x.shape
        h = GroupNorm(self.groups, c, name="group_norm")(x)
        h = h.reshape(b, hgt * wid, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(h)
        # One 512-wide head over h*w tokens (16k at 1024px): the flash
        # kernel never materializes the (n, n) scores — the jnp path
        # would write a 1GB fp32 score tensor per image at 1024px, so
        # unlike flux/unet_sd15 the fp32 case must NOT force the
        # reference on TPU (auto dispatch keeps the reference on CPU,
        # where the oracle tests run, and the kernel on TPU for every
        # dtype; the dispatcher's VMEM model sizes/streams d=512).
        o = joint_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return x + o.reshape(b, hgt, wid, c)


class MidBlock(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResnetBlock(self.channels, self.groups, self.dtype, name="resnets_0")(x)
        x = VAEAttention(self.channels, self.groups, self.dtype, name="attentions_0")(x)
        return ResnetBlock(self.channels, self.groups, self.dtype, name="resnets_1")(x)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        ch = list(reversed(cfg.block_out_channels))  # e.g. [512, 512, 256, 128]
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(z)
        x = MidBlock(ch[0], cfg.norm_num_groups, cfg.dtype, name="mid_block")(x)
        for i, out_ch in enumerate(ch):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(
                    out_ch, cfg.norm_num_groups, cfg.dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(x)
            if i < len(ch) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
                x = nn.Conv(
                    out_ch, (3, 3), padding=1, dtype=cfg.dtype,
                    name=f"up_blocks_{i}_upsamplers_0",
                )(x)
        x = GroupNorm(cfg.norm_num_groups, ch[-1], name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype, name="conv_out"
        )(x)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        ch = list(cfg.block_out_channels)
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(x)
        for i, out_ch in enumerate(ch):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(
                    out_ch, cfg.norm_num_groups, cfg.dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(x)
            if i < len(ch) - 1:
                # diffusers Downsample2D pads (0, 1, 0, 1) then stride-2 VALID
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    out_ch, (3, 3), strides=2, padding="VALID", dtype=cfg.dtype,
                    name=f"down_blocks_{i}_downsamplers_0",
                )(x)
        x = MidBlock(ch[-1], cfg.norm_num_groups, cfg.dtype, name="mid_block")(x)
        x = GroupNorm(cfg.norm_num_groups, ch[-1], name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=cfg.dtype, name="conv_out"
        )(x)


class VAE(nn.Module):
    """decode(z) and encode(img); NCHW at the public boundary."""

    config: VAEConfig

    def setup(self):
        self.decoder = Decoder(self.config)
        self.encoder = Encoder(self.config)

    def decode(self, z: jax.Array) -> jax.Array:
        """(b, latent_c, h, w) raw latents -> (b, 3, 8h, 8w) in [-1, 1]ish.

        Note: apply the scaling/shift transform BEFORE calling (the pipeline
        does `z/scaling + shift`, modeling_sd3_pnt.py:631).
        """
        x = self.decoder(z.transpose(0, 2, 3, 1))
        return x.transpose(0, 3, 1, 2)

    def encode(self, img: jax.Array) -> tuple[jax.Array, jax.Array]:
        """(b, 3, H, W) -> (mean, logvar), each (b, latent_c, H/8, W/8)."""
        out = self.encoder(img.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        mean, logvar = jnp.split(out, 2, axis=1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def __call__(self, z: jax.Array, img: jax.Array = None) -> jax.Array:
        """Decode z; pass `img` too (only) when initializing, so both the
        decoder and encoder parameter trees get created."""
        out = self.decode(z)
        if img is not None:
            self.encode(img)
        return out


# ---------------------------------------------------------------------------
# The production decode fast path (bf16 compute, fp32 GroupNorm statistics)
# ---------------------------------------------------------------------------


def fast_decode_vae(vae: VAE) -> VAE:
    """bf16 twin of a VAE module over the SAME parameter tree structure.

    bf16 convs/matmuls are the 475->102 ms decode win on v5e (docs/PERF.md
    "VAE decode"); numerical safety comes from GroupNorm computing its
    statistics in fp32 regardless of module dtype (models/layers.py)."""
    return VAE(dataclasses.replace(vae.config, dtype=jnp.bfloat16))


def fast_decode_params(params):
    """Cast fp32 leaves to bf16 (weights live bf16 on-chip for the decode)."""
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )


def make_fast_decode(vae: VAE, params=None, jit: bool = True):
    """(decode_fn, bf16_params): THE decode code path shared by bench.py and
    the training reward (`train/builders.py build_image_reward_fn`) — one
    implementation so the RL rollout critical path gets the same bf16+fp32-GN
    configuration the benchmark measures (round-2 VERDICT item 3).

    decode_fn(params, z): raw (b, c, h, w) latents -> fp32 images in
    [-1, 1]ish, applying the `z / scaling + shift` un-scaling the reference
    applies before decode (modeling_sd3_pnt.py:629-631).
    """
    cfg = vae.config
    bvae = fast_decode_vae(vae)

    def decode(p, z):
        z = z.astype(jnp.bfloat16) / cfg.scaling_factor + cfg.shift_factor
        return bvae.apply(p, z, method="decode").astype(jnp.float32)

    fn = jax.jit(decode) if jit else decode
    bparams = None if params is None else fast_decode_params(params)
    return fn, bparams
