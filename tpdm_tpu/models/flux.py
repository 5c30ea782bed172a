"""FLUX-class flow-matching backbone (double/single-stream DiT with RoPE).

The reference names TPM-on-FLUX as a capability (checkpoint subdir `flux`,
reference: gradio_sd3_inference.py:23-28 and README.md:37-42) but ships no
FLUX code; this is a from-scratch JAX implementation of the FLUX.1
architecture family (guidance-distilled "dev" variant): packed 2x2 latents,
joint text+image double-stream blocks, fused single-stream blocks, 3-axis
RoPE, modulation from timestep+pooled-text (+guidance) vectors.

TPM grafting contract (our design, mirroring the SD3 fork's choice of
taps): h1 = image tokens after img_in + first double block's input norm
site (post-embedding), h2 = image tokens entering the final projection;
both (b, n_img, hidden) — reshape with `reshape_tokens_to_2d` for the TPM.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpdm_tpu.models.layers import (
    RMSNorm,
    _layer_norm_fp32,
    sinusoidal_timestep_embedding,
)
from tpdm_tpu.ops.attention import joint_attention


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64  # packed 2x2x16 latents
    hidden_size: int = 3072
    num_heads: int = 24
    depth_double: int = 19
    depth_single: int = 38
    txt_dim: int = 4096
    vec_dim: int = 768
    mlp_ratio: float = 4.0
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: int = 10000
    guidance_embed: bool = True  # "dev"; False for "schnell"
    dtype: jnp.dtype = jnp.bfloat16
    # Stored-int8 matmuls (ops/quant.py): W8A8-dynamic for the block
    # qkv/proj/MLP matmuls, weight-only int8 for the modulation
    # projections (fp activations — their outputs gate every residual).
    # This is what makes a 12B FLUX-class model FIT on one 16 GB v5e
    # chip: ~23.8 GB bf16 -> ~12 GB stored-int8 (quant_bits=4: ~6 GB
    # weight-only group-int4, fp compute). Off by default.
    quant_matmuls: bool = False
    quant_bits: int = 8
    # GSPMD anchor mesh (FluxAgent.shard sets it): without explicit
    # constraints the SPMD partitioner ping-pongs the per-block modulation
    # broadcasts between batch-sharded {devices=[4,1,1,2]} and
    # hidden-sharded {devices=[1,1,2,4]} layouts — one "Involuntary full
    # rematerialization" (= allgather + reshard) PER BLOCK on tensor>1
    # meshes. Pinning the modulation vectors and the img/txt residual
    # streams to batch-only sharding (hidden replicated) anchors the
    # propagation; same bug class as parallel/sharding.py's _MODULATION
    # carve-out, now applied to the activations.
    act_mesh: Optional[object] = None  # jax.sharding.Mesh (hashable)
    act_batch_axes: Tuple[str, ...] = ("data", "fsdp")
    # Residual block caching (Δ-DiT-style, arXiv 2406.01125 — same design
    # as MMDiTConfig.cache_front_blocks): "record" forwards return
    # Δ = img_after_all_blocks − img_after_front_double_blocks; "reuse"
    # forwards run only the first `cache_front_blocks` DOUBLE blocks and
    # substitute Δ for the remaining doubles + every single block (the txt
    # stream is consumed only by blocks, so img-Δ alone suffices).
    cache_front_blocks: int = 4

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def flux_dev(cls, **kw) -> "FluxConfig":
        return cls(**kw)

    @classmethod
    def toy(cls, **kw) -> "FluxConfig":
        d = dict(
            in_channels=16,
            hidden_size=48,
            num_heads=4,
            depth_double=2,
            depth_single=2,
            txt_dim=32,
            vec_dim=24,
            axes_dim=(4, 4, 4),
            dtype=jnp.float32,
        )
        d.update(kw)
        return cls(**d)


def rope_freqs(ids: jax.Array, axes_dim: Tuple[int, ...], theta: int):
    """ids (b, n, n_axes) -> (cos, sin) of shape (b, n, sum(axes_dim)//2).

    Per-axis rotary frequencies, concatenated (BFL convention).
    """
    comps_cos, comps_sin = [], []
    for i, dim in enumerate(axes_dim):
        half = dim // 2
        omega = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
        angles = ids[..., i].astype(jnp.float32)[..., None] * omega  # (b,n,half)
        comps_cos.append(jnp.cos(angles))
        comps_sin.append(jnp.sin(angles))
    return jnp.concatenate(comps_cos, -1), jnp.concatenate(comps_sin, -1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x (b, h, n, d) with d = 2*len(cos[-1]); rotate interleaved pairs."""
    x32 = x.astype(jnp.float32)
    x_even = x32[..., 0::2]
    x_odd = x32[..., 1::2]
    c = cos[:, None]  # (b, 1, n, d/2)
    s = sin[:, None]
    out_even = x_even * c - x_odd * s
    out_odd = x_even * s + x_odd * c
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


class MLPEmbed(nn.Module):
    """in -> silu -> out MLP used for time/vector/guidance embeds."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="in_layer")(x)
        x = nn.silu(x)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out_layer")(x)


class Modulation(nn.Module):
    """vec -> n_mod * hidden modulation parameters.

    With `quant` on, the projection stores int8 weights but computes in
    fp (w8_matmul): at (b, d) @ (d, n_mod*d) the matmul is pure weight
    streaming, and the outputs scale/shift/gate every residual — the one
    place activation quantization is not worth its risk. The modulation
    projections are ~27% of FLUX-dev's parameters, so skipping them
    entirely would leave the model too big for one 16 GB chip.
    """

    hidden: int
    n_mod: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False
    bits: int = 8

    @nn.compact
    def __call__(self, vec):
        from tpdm_tpu.ops.quant import DenseMaybeQuant

        out = DenseMaybeQuant(
            self.n_mod * self.hidden, quant=self.quant, act_quant=False,
            bits=self.bits, dtype=self.dtype, name="lin",
        )(nn.silu(vec))
        return jnp.split(out, self.n_mod, axis=-1)


def _anchor(cfg: FluxConfig, t: jax.Array) -> jax.Array:
    """Pin a (b, ...) activation to batch-only sharding (hidden dims
    replicated) on cfg.act_mesh; identity when no mesh is set. See the
    FluxConfig.act_mesh note — this kills the per-block involuntary
    reshard of the modulation tensors under GSPMD."""
    if cfg.act_mesh is None:
        return t
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(
        a for a in cfg.act_batch_axes if a in cfg.act_mesh.axis_names
    )
    spec = P(axes if axes else None, *([None] * (t.ndim - 1)))
    return jax.lax.with_sharding_constraint(
        t, NamedSharding(cfg.act_mesh, spec)
    )


def _anchor_all(cfg: FluxConfig, ts) -> tuple:
    return tuple(_anchor(cfg, t) for t in ts)


class DoubleStreamBlock(nn.Module):
    config: FluxConfig

    @nn.compact
    def __call__(self, img, txt, vec, cos, sin):
        from tpdm_tpu.ops.quant import DenseMaybeQuant

        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_heads
        hd = cfg.head_dim
        b, n_img, _ = img.shape
        n_txt = txt.shape[1]
        mlp_dim = int(d * cfg.mlp_ratio)
        dense = lambda feats, name: DenseMaybeQuant(
            feats, quant=cfg.quant_matmuls, bits=cfg.quant_bits,
            dtype=cfg.dtype, name=name,
        )

        im_shift1, im_scale1, im_gate1, im_shift2, im_scale2, im_gate2 = _anchor_all(
            cfg,
            Modulation(
                d, 6, cfg.dtype, cfg.quant_matmuls, cfg.quant_bits,
                name="img_mod",
            )(vec),
        )
        tx_shift1, tx_scale1, tx_gate1, tx_shift2, tx_scale2, tx_gate2 = _anchor_all(
            cfg,
            Modulation(
                d, 6, cfg.dtype, cfg.quant_matmuls, cfg.quant_bits,
                name="txt_mod",
            )(vec),
        )

        def qkv(x, prefix):
            q = dense(d, f"{prefix}_to_q")(x)
            k = dense(d, f"{prefix}_to_k")(x)
            v = dense(d, f"{prefix}_to_v")(x)
            heads = lambda t: t.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)
            q, k, v = heads(q), heads(k), heads(v)
            q = RMSNorm(hd, name=f"{prefix}_norm_q")(q)
            k = RMSNorm(hd, name=f"{prefix}_norm_k")(k)
            return q, k, v

        img_n = _layer_norm_fp32(img) * (1 + im_scale1[:, None]) + im_shift1[:, None]
        txt_n = _layer_norm_fp32(txt) * (1 + tx_scale1[:, None]) + tx_shift1[:, None]
        iq, ik, iv = qkv(img_n, "img_attn")
        tq, tk, tv = qkv(txt_n, "txt_attn")

        # FLUX sequence order: [txt, img]
        q = jnp.concatenate([tq, iq], axis=2)
        k = jnp.concatenate([tk, ik], axis=2)
        v = jnp.concatenate([tv, iv], axis=2)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        o = joint_attention(q, k, v, use_pallas=False if cfg.dtype == jnp.float32 else None)
        o = o.transpose(0, 2, 1, 3).reshape(b, n_txt + n_img, d)
        txt_o, img_o = o[:, :n_txt], o[:, n_txt:]

        img = img + im_gate1[:, None] * dense(d, "img_attn_proj")(img_o)
        txt = txt + tx_gate1[:, None] * dense(d, "txt_attn_proj")(txt_o)

        img_n = _layer_norm_fp32(img) * (1 + im_scale2[:, None]) + im_shift2[:, None]
        y = dense(mlp_dim, "img_mlp_0")(img_n)
        y = nn.gelu(y, approximate=True)
        img = img + im_gate2[:, None] * dense(d, "img_mlp_2")(y)

        txt_n = _layer_norm_fp32(txt) * (1 + tx_scale2[:, None]) + tx_shift2[:, None]
        y = dense(mlp_dim, "txt_mlp_0")(txt_n)
        y = nn.gelu(y, approximate=True)
        txt = txt + tx_gate2[:, None] * dense(d, "txt_mlp_2")(y)
        return _anchor(cfg, img), _anchor(cfg, txt)


class SingleStreamBlock(nn.Module):
    config: FluxConfig

    @nn.compact
    def __call__(self, x, vec, cos, sin):
        from tpdm_tpu.ops.quant import DenseMaybeQuant

        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_heads
        hd = cfg.head_dim
        b, n, _ = x.shape
        mlp_dim = int(d * cfg.mlp_ratio)

        shift, scale, gate = _anchor_all(
            cfg,
            Modulation(
                d, 3, cfg.dtype, cfg.quant_matmuls, cfg.quant_bits,
                name="modulation",
            )(vec),
        )
        x_n = _layer_norm_fp32(x) * (1 + scale[:, None]) + shift[:, None]

        fused = DenseMaybeQuant(
            3 * d + mlp_dim, quant=cfg.quant_matmuls, bits=cfg.quant_bits,
            dtype=cfg.dtype, name="linear1",
        )(x_n)
        qkv_part, mlp_part = fused[..., : 3 * d], fused[..., 3 * d :]
        q, k, v = jnp.split(qkv_part, 3, axis=-1)
        heads = lambda t: t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        q, k, v = heads(q), heads(k), heads(v)
        q = RMSNorm(hd, name="norm_q")(q)
        k = RMSNorm(hd, name="norm_k")(k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        o = joint_attention(q, k, v, use_pallas=False if cfg.dtype == jnp.float32 else None)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)

        mlp_act = nn.gelu(mlp_part, approximate=True)
        out = DenseMaybeQuant(
            d, quant=cfg.quant_matmuls, bits=cfg.quant_bits,
            dtype=cfg.dtype, name="linear2",
        )(jnp.concatenate([o, mlp_act], axis=-1))
        return _anchor(cfg, x + gate[:, None] * out)


class Flux(nn.Module):
    """Returns (velocity_tokens, vec, h1, h2) — the TPDM contract in packed
    token space: velocity (b, n_img, in_channels); unpack with
    `unpack_latents`."""

    config: FluxConfig

    @nn.compact
    def __call__(
        self,
        img_tokens: jax.Array,  # (b, n_img, in_channels) packed latents
        img_ids: jax.Array,  # (b, n_img, 3)
        txt_tokens: jax.Array,  # (b, n_txt, txt_dim)
        txt_ids: jax.Array,  # (b, n_txt, 3)
        timestep: jax.Array,  # (b,) in [0, 1]
        pooled: jax.Array,  # (b, vec_dim)
        guidance: Optional[jax.Array] = None,  # (b,) guidance scale
        delta: Optional[jax.Array] = None,  # (b, n_img, hidden) cached Δ
        cache_mode: Optional[str] = None,  # None | "record" | "reuse"
    ):
        cfg = self.config
        d = cfg.hidden_size
        if cache_mode is not None:
            if not 1 <= cfg.cache_front_blocks <= cfg.depth_double:
                raise ValueError(
                    "cache_front_blocks must be in [1, depth_double]: got "
                    f"{cfg.cache_front_blocks} of {cfg.depth_double}"
                )
            if cache_mode == "reuse" and delta is None:
                raise ValueError("cache_mode='reuse' needs a delta")

        img = nn.Dense(d, dtype=cfg.dtype, name="img_in")(img_tokens)
        h1 = img
        txt = nn.Dense(d, dtype=cfg.dtype, name="txt_in")(txt_tokens)

        t_feat = sinusoidal_timestep_embedding(
            timestep * 1000.0, 256, flip_sin_to_cos=True
        )
        vec = MLPEmbed(d, cfg.dtype, name="time_in")(t_feat.astype(pooled.dtype))
        if cfg.guidance_embed:
            if guidance is None:
                guidance = jnp.full(timestep.shape, 3.5)
            g_feat = sinusoidal_timestep_embedding(guidance * 1000.0, 256)
            vec = vec + MLPEmbed(d, cfg.dtype, name="guidance_in")(
                g_feat.astype(pooled.dtype)
            )
        vec = vec + MLPEmbed(d, cfg.dtype, name="vector_in")(pooled)
        vec = _anchor(cfg, vec)
        img = _anchor(cfg, img)
        txt = _anchor(cfg, txt)

        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        cos, sin = rope_freqs(ids, cfg.axes_dim, cfg.theta)

        img_front = None
        n_double = (
            cfg.cache_front_blocks if cache_mode == "reuse" else cfg.depth_double
        )
        for i in range(n_double):
            img, txt = DoubleStreamBlock(cfg, name=f"double_blocks_{i}")(
                img, txt, vec, cos, sin
            )
            if cache_mode == "record" and i == cfg.cache_front_blocks - 1:
                img_front = img

        if cache_mode == "reuse":
            img = _anchor(cfg, img + delta.astype(img.dtype))
        else:
            x = jnp.concatenate([txt, img], axis=1)
            for i in range(cfg.depth_single):
                x = SingleStreamBlock(cfg, name=f"single_blocks_{i}")(
                    x, vec, cos, sin
                )
            img = x[:, txt.shape[1] :]
            if cache_mode == "record":
                delta = (img - img_front).astype(cfg.dtype)

        # final layer: AdaLN-continuous style modulation then projection
        shift, scale = Modulation(
            d, 2, cfg.dtype, cfg.quant_matmuls, cfg.quant_bits, name="final_mod"
        )(vec)
        img_n = _layer_norm_fp32(img) * (1 + scale[:, None]) + shift[:, None]
        h2 = img_n
        velocity = nn.Dense(cfg.in_channels, dtype=cfg.dtype, name="final_proj")(img_n)
        if cache_mode is not None:
            return velocity, vec, h1, h2, delta
        return velocity, vec, h1, h2


def pack_latents(latents: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(b, c, h, w) NCHW -> packed tokens (b, (h/2)(w/2), 4c) + img_ids."""
    b, c, h, w = latents.shape
    gh, gw = h // 2, w // 2
    x = latents.reshape(b, c, gh, 2, gw, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * 4)
    ys = jnp.repeat(jnp.arange(gh), gw)
    xs = jnp.tile(jnp.arange(gw), gh)
    ids = jnp.stack([jnp.zeros_like(ys), ys, xs], axis=-1).astype(jnp.float32)
    return x, jnp.tile(ids[None], (b, 1, 1))


def unpack_latents(tokens: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of pack_latents: (b, n, 4c) -> (b, c, h, w)."""
    b, n, c4 = tokens.shape
    c = c4 // 4
    gh, gw = h // 2, w // 2
    x = tokens.reshape(b, gh, gw, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)
