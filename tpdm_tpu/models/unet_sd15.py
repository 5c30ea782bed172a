"""SD1.x / SDXL UNet in flax.linen, returning the TPDM four-output contract.

Architecture parity with the reference `CustomizedUNet2DConditionModel`
(reference: src/models/stable_diffusion_v1_5/unet_sd_v1_5.py:71-1318) —
diffusers' SD1.5 UNet forked to also return `t_emb`, `hidden_states_1`
(post-conv_in, :1172-1173) and `hidden_states_2` (post-conv_norm_out/silu,
pre-conv_out, :1304-1309); tuple return at :1316.

The same module covers the SDXL-base topology (beyond-reference family):
per-level transformer depth (``transformer_layers_per_block``), per-level
head counts via ``attention_head_dim``, and the SDXL "text_time" addition
embedding (pooled text + six sinusoid-embedded size/crop ids added into
the time embedding). Defaults keep the SD1.5 wiring bit-identical; convs
run NHWC internally.
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
    # None -> SD1.x wiring: one transformer layer at every level except the
    # last. SDXL-base uses (0, 2, 10) (diffusers transformer_layers_per_block,
    # with 0 marking the attention-free DownBlock2D/UpBlock2D level).
    transformer_layers_per_block: Optional[Tuple[int, ...]] = None
    mid_transformer_layers: int = 1
    # None -> fixed `num_attention_heads` everywhere (SD1.x: 8 heads of
    # dim C/8). Set (e.g. 64 for SDXL) to derive heads = channels // dim.
    attention_head_dim: Optional[int] = None
    # SDXL "text_time" conditioning: pooled text (addition_pooled_dim) +
    # num_time_ids sinusoid embeddings of addition_time_embed_dim each,
    # projected into the time embedding.
    addition_embed: bool = False
    addition_time_embed_dim: int = 256
    addition_pooled_dim: int = 1280
    num_time_ids: int = 6
    # GSPMD anchor mesh (SD15Agent/SDXLAgent.shard set it): without
    # explicit constraints the SPMD partitioner ping-pongs the token-
    # stream residual adds inside _CrossAttnBlock between batch-sharded
    # and hidden-sharded layouts — one "Involuntary full
    # rematerialization" per transformer block on tensor>1 meshes (same
    # bug class, and same fix, as FluxConfig.act_mesh in models/flux.py).
    act_mesh: Optional[object] = None  # jax.sharding.Mesh (hashable)
    act_batch_axes: Tuple[str, ...] = ("data", "fsdp")
    # DeepCache-style deep-feature caching (arXiv 2312.00858; the UNet
    # analogue of MMDiTConfig.cache_front_blocks): "record" forwards also
    # return the up-path feature at the shallow/deep boundary; "reuse"
    # forwards run only the outermost `cache_shallow_levels` down levels,
    # substitute the cached deep feature, and finish the matching shallow
    # up levels. Shallow layers keep full time conditioning; everything at
    # or below level `cache_shallow_levels` (incl. mid) is skipped. For
    # SDXL (0,2,10) topology the shallow level is attention-free, so reuse
    # steps skip every transformer in the network.
    cache_shallow_levels: int = 1

    @classmethod
    def sd15(cls, **kw) -> "UNetConfig":
        return cls(**kw)

    @classmethod
    def sdxl(cls, **kw) -> "UNetConfig":
        """SDXL-base 2.6B topology (diffusers unet/config.json)."""
        d = dict(
            block_out_channels=(320, 640, 1280),
            layers_per_block=2,
            cross_attention_dim=2048,
            attention_head_dim=64,
            transformer_layers_per_block=(0, 2, 10),
            mid_transformer_layers=10,
            sample_size=128,
            addition_embed=True,
        )
        d.update(kw)
        return cls(**d)

    @classmethod
    def sdxl_refiner(cls, **kw) -> "UNetConfig":
        """SDXL-refiner 2.3B topology (diffusers
        stable-diffusion-xl-refiner-1.0 unet/config.json): four levels with
        attention-free ends (DownBlock2D, CrossAttn, CrossAttn, DownBlock2D),
        uniform transformer depth 4, bigG-only cross-attention (1280), and
        FIVE time_ids — [orig_h, orig_w, crop_top, crop_left,
        aesthetic_score] (requires_aesthetics_score=True; the sixth
        target-size pair of the base model is replaced by the scalar
        aesthetic score, projection_class_embeddings_input_dim
        2560 = 1280 pooled + 5*256)."""
        d = dict(
            block_out_channels=(384, 768, 1536, 1536),
            layers_per_block=2,
            cross_attention_dim=1280,
            attention_head_dim=64,
            transformer_layers_per_block=(0, 4, 4, 0),
            mid_transformer_layers=4,
            sample_size=128,
            addition_embed=True,
            num_time_ids=5,
        )
        d.update(kw)
        return cls(**d)

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

    @classmethod
    def toy_xl(cls, **kw) -> "UNetConfig":
        """Tiny SDXL-topology config for tests: attention-free first level,
        depth-2 transformers above, text_time addition embedding."""
        d = dict(
            block_out_channels=(8, 12, 16),
            layers_per_block=1,
            cross_attention_dim=24,
            attention_head_dim=4,
            transformer_layers_per_block=(0, 1, 2),
            mid_transformer_layers=2,
            norm_num_groups=4,
            sample_size=16,
            addition_embed=True,
            addition_time_embed_dim=8,
            addition_pooled_dim=12,
        )
        d.update(kw)
        return cls(**d)

    @classmethod
    def toy_refiner(cls, **kw) -> "UNetConfig":
        """Tiny refiner-topology config for tests: attention-free FIRST AND
        LAST levels (the refiner's (0,4,4,0) wiring), bigG-only context,
        five time_ids with the aesthetic-score column."""
        d = dict(
            block_out_channels=(8, 12, 16, 16),
            layers_per_block=1,
            cross_attention_dim=20,
            attention_head_dim=4,
            transformer_layers_per_block=(0, 1, 1, 0),
            mid_transformer_layers=1,
            norm_num_groups=4,
            sample_size=16,
            addition_embed=True,
            addition_time_embed_dim=8,
            addition_pooled_dim=12,
            num_time_ids=5,
        )
        d.update(kw)
        return cls(**d)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def depths(self) -> Tuple[int, ...]:
        """Per-level transformer depth on the down path (reversed for up)."""
        if self.transformer_layers_per_block is not None:
            return self.transformer_layers_per_block
        n = len(self.block_out_channels)
        return tuple(1 for _ in range(n - 1)) + (0,)

    def heads_for(self, out_ch: int) -> int:
        if self.attention_head_dim is None:
            return self.num_attention_heads
        return out_ch // self.attention_head_dim


def deepcache_feature_shape(
    cfg: UNetConfig, batch: int, latent_hw: Optional[Tuple[int, int]] = None
) -> Tuple[int, int, int, int]:
    """NHWC shape of the DeepCache boundary feature a "record" forward
    returns: the up-path activation where the deep subnetwork rejoins the
    shallow levels (resolution of level cache_shallow_levels-1, channel
    width of level cache_shallow_levels)."""
    s = cfg.cache_shallow_levels
    h, w = latent_hw if latent_hw is not None else (cfg.sample_size,) * 2
    return (batch, h // (2 ** (s - 1)), w // (2 ** (s - 1)),
            cfg.block_out_channels[s])


class ResnetBlockTimeEmb(nn.Module):
    """diffusers ResnetBlock2D with time-embedding injection."""

    out_channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32
    act_mesh: Optional[object] = None
    act_batch_axes: Tuple[str, ...] = ("data", "fsdp")

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        # The (b, temb) vector is this block's modulation input: pin it to
        # batch-only sharding or GSPMD flip-flops it between batch- and
        # hidden-sharded layouts once per resnet (see UNetConfig.act_mesh).
        temb = _anchor(self.act_mesh, self.act_batch_axes, temb)
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


def _anchor(mesh, batch_axes, t: jax.Array) -> jax.Array:
    """Pin a (b, ...) activation to batch-only sharding (hidden dims
    replicated) on ``mesh``; identity when no mesh is set. Kills the
    per-block involuntary reshard of the transformer token stream under
    GSPMD on tensor>1 meshes (see UNetConfig.act_mesh; the FLUX analogue
    is models/flux.py _anchor)."""
    if mesh is None:
        return t
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(a for a in batch_axes if a in mesh.axis_names)
    spec = P(axes if axes else None, *([None] * (t.ndim - 1)))
    return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, spec))


class _CrossAttnBlock(nn.Module):
    """diffusers BasicTransformerBlock: self-attn, cross-attn, GEGLU ff."""

    dim: int
    heads: int
    ctx_dim: int
    dtype: jnp.dtype = jnp.float32
    act_mesh: Optional[object] = None
    act_batch_axes: Tuple[str, ...] = ("data", "fsdp")

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
        anchor = lambda t: _anchor(self.act_mesh, self.act_batch_axes, t)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        n1 = ln("norm1")(x)
        x = anchor(x + self._attn(n1, n1, "attn1"))
        x = anchor(x + self._attn(ln("norm2")(x), ctx, "attn2"))
        y = ln("norm3")(x)
        gate = nn.Dense(8 * self.dim, dtype=self.dtype, name="ff_proj")(y)
        a, g = jnp.split(gate, 2, axis=-1)
        y = a * nn.gelu(g, approximate=False)  # GEGLU
        x = anchor(x + nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(y))
        return x


class SpatialTransformer(nn.Module):
    """diffusers Transformer2DModel (conv projections, `depth` basic blocks).

    SDXL's use_linear_projection=True proj_in/proj_out are 1x1 convs in
    NHWC (identical math); the converter reshapes Linear weights into the
    (1,1,in,out) kernel.
    """

    dim: int
    heads: int
    ctx_dim: int
    groups: int
    dtype: jnp.dtype = jnp.float32
    depth: int = 1
    act_mesh: Optional[object] = None
    act_batch_axes: Tuple[str, ...] = ("data", "fsdp")

    @nn.compact
    def __call__(self, x: jax.Array, ctx: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        res = x
        h = GroupNorm(self.groups, c, name="norm")(x)
        h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = _anchor(self.act_mesh, self.act_batch_axes,
                    h.reshape(b, hh * ww, self.dim))
        for k in range(self.depth):
            # depth-1 keeps the historical "block" param name (SD1.x ckpts)
            name = "block" if self.depth == 1 else f"block_{k}"
            h = _CrossAttnBlock(
                self.dim, self.heads, self.ctx_dim, self.dtype,
                act_mesh=self.act_mesh, act_batch_axes=self.act_batch_axes,
                name=name,
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
        added_cond: Optional[dict] = None,  # SDXL: {"text_embeds", "time_ids"}
        cache: Optional[jax.Array] = None,  # NHWC deep feature (DeepCache)
        cache_mode: Optional[str] = None,  # None | "record" | "reuse"
    ):
        """cache_mode=None returns the reference 4-tuple. "record"/"reuse"
        return a 5-tuple (noise_pred, t_emb, h1, h2, cache): "record" runs
        the full UNet and also emits the up-path feature where the deep
        subnetwork rejoins the shallow levels; "reuse" substitutes that
        cached feature for the whole deep subnetwork (mid + every level >=
        config.cache_shallow_levels). See UNetConfig.cache_shallow_levels.
        """
        cfg = self.config
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        ctx = encoder_hidden_states
        depths = cfg.depths
        if cache_mode is not None:
            if not 1 <= cfg.cache_shallow_levels < len(ch):
                raise ValueError(
                    "cache_shallow_levels must be in [1, num_levels): got "
                    f"{cfg.cache_shallow_levels} of {len(ch)}"
                )
            if cache_mode == "reuse" and cache is None:
                raise ValueError("cache_mode='reuse' needs a cache")

        t_feat = sinusoidal_timestep_embedding(timestep, ch[0]).astype(cfg.dtype)
        temb = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype, name="time_linear_1")(
            t_feat
        )
        temb = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype, name="time_linear_2")(
            nn.silu(temb)
        )
        if cfg.addition_embed:
            # SDXL "text_time": concat([pooled_text, sinusoid(time_ids)])
            # through a 2-layer MLP, summed into the time embedding
            # (diffusers UNet2DConditionModel.get_aug_embed / add_embedding).
            if added_cond is None:
                raise ValueError(
                    "config.addition_embed is on: pass added_cond="
                    '{"text_embeds": (b, pooled), "time_ids": (b, 6)}'
                )
            pooled = added_cond["text_embeds"]
            time_ids = jnp.asarray(added_cond["time_ids"], jnp.float32)
            b = pooled.shape[0]
            t6 = sinusoidal_timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim
            ).reshape(b, cfg.num_time_ids * cfg.addition_time_embed_dim)
            add = jnp.concatenate(
                [pooled.astype(cfg.dtype), t6.astype(cfg.dtype)], axis=-1
            )
            aug = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype, name="add_linear_1")(add)
            aug = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype, name="add_linear_2")(
                nn.silu(aug)
            )
            temb = temb + aug
        temb = _anchor(cfg.act_mesh, cfg.act_batch_axes, temb)

        x = latents.transpose(0, 2, 3, 1)
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(x)
        h1 = x.transpose(0, 3, 1, 2)  # reference :1172-1173

        skips = [x]
        shallow = cfg.cache_shallow_levels
        # down path: per-level transformer depth (SD1.x: 1,1,1,0;
        # SDXL: 0,2,10), downsample between levels. In reuse mode only the
        # shallow levels run (their skips feed the shallow up levels; the
        # trailing downsample of level shallow-1 feeds only the skipped
        # deep subnetwork, so it is skipped too).
        n_down = shallow if cache_mode == "reuse" else len(ch)
        for i, out_ch in enumerate(ch[:n_down]):
            is_last = i == len(ch) - 1
            for j in range(cfg.layers_per_block):
                x = ResnetBlockTimeEmb(
                    out_ch, g, cfg.dtype, act_mesh=cfg.act_mesh,
                    act_batch_axes=cfg.act_batch_axes,
                    name=f"down_{i}_resnet_{j}",
                )(x, temb)
                if depths[i] > 0:
                    x = SpatialTransformer(
                        out_ch,
                        cfg.heads_for(out_ch),
                        cfg.cross_attention_dim,
                        g,
                        cfg.dtype,
                        depth=depths[i],
                        act_mesh=cfg.act_mesh,
                        act_batch_axes=cfg.act_batch_axes,
                        name=f"down_{i}_attn_{j}",
                    )(x, ctx)
                skips.append(x)
            if not is_last and not (
                cache_mode == "reuse" and i == shallow - 1
            ):
                x = nn.Conv(
                    out_ch, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                    dtype=cfg.dtype, name=f"down_{i}_downsample",
                )(x)
                skips.append(x)

        if cache_mode == "reuse":
            x = cache.astype(cfg.dtype)
        else:
            # mid
            x = ResnetBlockTimeEmb(
                ch[-1], g, cfg.dtype, act_mesh=cfg.act_mesh,
                act_batch_axes=cfg.act_batch_axes, name="mid_resnet_0",
            )(x, temb)
            x = SpatialTransformer(
                ch[-1], cfg.heads_for(ch[-1]), cfg.cross_attention_dim, g,
                cfg.dtype, depth=cfg.mid_transformer_layers,
                act_mesh=cfg.act_mesh, act_batch_axes=cfg.act_batch_axes,
                name="mid_attn",
            )(x, ctx)
            x = ResnetBlockTimeEmb(
                ch[-1], g, cfg.dtype, act_mesh=cfg.act_mesh,
                act_batch_axes=cfg.act_batch_axes, name="mid_resnet_1",
            )(x, temb)

        # up path (mirror; depths reversed). In reuse mode only the shallow
        # up levels run, starting from the cached boundary feature.
        up_start = (len(ch) - shallow) if cache_mode == "reuse" else 0
        rev_ch = tuple(reversed(ch))
        for i in range(up_start, len(ch)):
            out_ch = rev_ch[i]
            depth_i = depths[len(ch) - 1 - i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlockTimeEmb(
                    out_ch, g, cfg.dtype, act_mesh=cfg.act_mesh,
                    act_batch_axes=cfg.act_batch_axes,
                    name=f"up_{i}_resnet_{j}",
                )(x, temb)
                if depth_i > 0:
                    x = SpatialTransformer(
                        out_ch,
                        cfg.heads_for(out_ch),
                        cfg.cross_attention_dim,
                        g,
                        cfg.dtype,
                        depth=depth_i,
                        act_mesh=cfg.act_mesh,
                        act_batch_axes=cfg.act_batch_axes,
                        name=f"up_{i}_attn_{j}",
                    )(x, ctx)
            if i < len(ch) - 1:
                b_, hh, ww, c_ = x.shape
                x = jax.image.resize(x, (b_, 2 * hh, 2 * ww, c_), "nearest")
                x = nn.Conv(
                    out_ch, (3, 3), padding=1, dtype=cfg.dtype,
                    name=f"up_{i}_upsample",
                )(x)
            if cache_mode == "record" and i == len(ch) - 1 - shallow:
                cache = x  # deep subnetwork's output at the rejoin boundary

        x = GroupNorm(g, ch[0], eps=1e-5, name="conv_norm_out")(x)
        x = nn.silu(x)
        h2 = x.transpose(0, 3, 1, 2)  # reference :1304-1309
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype, name="conv_out")(x)
        # The TPM conditions on the PRE-MLP 320-dim sinusoidal t_emb, not the
        # 1280-dim internal embedding (reference unet_sd_v1_5.py:929,1316;
        # the SD1.5 TPM's AdaGroupNorm is built with input_dim = 320,
        # modeling_sd_v1_5.py:100).
        if cache_mode is not None:
            return x.transpose(0, 3, 1, 2), t_feat, h1, h2, cache
        return x.transpose(0, 3, 1, 2), t_feat, h1, h2
