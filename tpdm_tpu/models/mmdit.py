"""SD3 MMDiT denoiser in flax.linen, TPU-native.

Architecture parity with the reference `CustomSD3Transformer2DModel`
(reference: src/models/stable_diffusion_3/transformer_sd3.py:67-409), which
is SD3-medium's MMDiT forked to additionally return `temb`,
`hidden_states_1` (post-PatchEmbed tokens, :334-335) and `hidden_states_2`
(post-final-AdaLN, pre-proj_out, :372-373) for the Time Prediction Module.
Supports SD3.5's dual-attention layers and qk RMSNorm (:104-107).

TPU-native choices: patchify/unpatchify as reshape+matmul (MXU), Pallas
flash attention over the joint sequence, fp32 norm statistics with bf16
matmuls, and optional per-block rematerialization (`remat=True`) standing in
for the reference's torch gradient checkpointing (:340-358).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpdm_tpu.models.layers import (
    AdaLayerNormContinuous,
    AdaLayerNormZero,
    AdaLayerNormZeroX,
    CombinedTimestepTextEmbed,
    FeedForward,
    PatchEmbed,
    RMSNorm,
    _layer_norm_fp32,
)
from tpdm_tpu.ops.attention import joint_attention


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    """SD3-family MMDiT hyperparameters (defaults = SD3-medium)."""

    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 96
    dual_attention_layers: Tuple[int, ...] = ()
    qk_norm: Optional[str] = None  # None | "rms_norm" (SD3.5)
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: Optional[bool] = None  # None = auto (TPU yes, CPU no)
    quant_matmuls: bool = False  # W8A8-dynamic int8 for qkv/out/FF matmuls
    quant_bits: int = 8  # 4 = group-int4 weight-only (capacity mode)
    # Sequence parallelism (2048px+ long-context generation, SURVEY §5):
    # when seq_mesh is set, every attention call routes through
    # parallel/sp_attention.make_ring_attention with the joint-token axis
    # sharded over mesh axis `seq_axis`, and the image-token activations
    # between blocks are sharding-constrained to stay distributed. The
    # parameter tree is IDENTICAL to the unsharded model — the same
    # weights serve both paths.
    seq_mesh: Optional[object] = None  # jax.sharding.Mesh (hashable)
    seq_axis: str = "seq"
    seq_batch_axes: Tuple[str, ...] = ("data", "fsdp")
    # Residual block caching (Δ-DiT-style training-free acceleration,
    # arXiv 2406.01125): on "record" forwards the model runs all blocks
    # and returns Δ = x_after_all_blocks − x_after_front_blocks; on
    # "reuse" forwards only the first `cache_front_blocks` blocks run and
    # the cached Δ stands in for the skipped back group. Adjacent
    # timesteps' deep features change slowly, so reusing Δ every other
    # step trades a small approximation for skipping most of the network.
    cache_front_blocks: int = 4

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def sd3_medium(cls, **kw) -> "MMDiTConfig":
        return cls(**kw)

    @classmethod
    def sd35_medium(cls, **kw) -> "MMDiTConfig":
        defaults = dict(
            num_layers=24,
            num_attention_heads=24,
            dual_attention_layers=tuple(range(13)),
            qk_norm="rms_norm",
            pos_embed_max_size=384,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def sd35_large(cls, **kw) -> "MMDiTConfig":
        defaults = dict(
            num_layers=38,
            num_attention_heads=38,
            caption_projection_dim=2432,
            qk_norm="rms_norm",
            pos_embed_max_size=192,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def toy(cls, **kw) -> "MMDiTConfig":
        """Tiny config for tests: 2 layers, 8x8 latents, 64-dim."""
        defaults = dict(
            sample_size=8,
            num_layers=2,
            attention_head_dim=16,
            num_attention_heads=4,
            joint_attention_dim=32,
            caption_projection_dim=64,
            pooled_projection_dim=48,
            pos_embed_max_size=12,
            dtype=jnp.float32,
        )
        defaults.update(kw)
        return cls(**defaults)


def _use_pallas(cfg) -> bool:
    if cfg.use_pallas is not None:
        return cfg.use_pallas
    return jax.default_backend() not in ("cpu", "gpu")


def _seq_pad_unit(cfg) -> int:
    """Token-axis alignment for the ring path: each device's shard must
    be 128-aligned for the Pallas kernel; the jnp reference path only
    needs divisibility by the ring size."""
    import math

    n_dev = cfg.seq_mesh.shape[cfg.seq_axis]
    return math.lcm(128, n_dev) if _use_pallas(cfg) else n_dev


def _ring_attention(cfg, q, k, v, n_valid: int):
    """Sequence-parallel attention: token axis sharded over cfg.seq_mesh.

    q/k/v: (b, h, n, d) where positions >= n_valid are exact-zero pad
    rows (appended with jnp.pad below) — the ring's (m, l) correction
    masks them without touching the kernel.
    """
    from tpdm_tpu.parallel.sp_attention import make_ring_attention

    ring = make_ring_attention(
        cfg.seq_mesh,
        axis=cfg.seq_axis,
        batch_axes=cfg.seq_batch_axes,
        use_pallas=_use_pallas(cfg),
        kv_len=n_valid if n_valid < q.shape[2] else None,
    )
    return ring(q, k, v)


def _seq_constraint(cfg, x):
    """Keep (b, n, dim) token activations sharded along the seq axis
    between blocks so dense/FF layers stay token-parallel (no gather
    between attention calls). No-op when the token count does not tile
    the ring."""
    if cfg.seq_mesh is None or x.shape[1] % cfg.seq_mesh.shape[cfg.seq_axis]:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = tuple(
        a for a in cfg.seq_batch_axes if a in cfg.seq_mesh.axis_names
    )
    spec = P(batch if batch else None, cfg.seq_axis, None)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(cfg.seq_mesh, spec)
    )


class JointAttention(nn.Module):
    """MMDiT joint attention: separate image/text qkv, shared softmax.

    diffusers `Attention` + `JointAttnProcessor2_0`: image tokens first in
    the concatenated sequence; the last block (context_pre_only) computes
    context q/k/v but has no context output projection.
    """

    config: MMDiTConfig
    context_pre_only: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, ctx: jax.Array):
        cfg = self.config
        h, d = cfg.num_attention_heads, cfg.attention_head_dim
        b, n_img, _ = x.shape
        n_ctx = ctx.shape[1]
        from tpdm_tpu.ops.quant import DenseMaybeQuant

        dense = lambda name: DenseMaybeQuant(
            h * d, quant=cfg.quant_matmuls, bits=cfg.quant_bits,
            dtype=cfg.dtype, name=name,
        )

        def heads(t):  # (b, n, h*d) -> (b, h, n, d)
            return t.reshape(b, -1, h, d).transpose(0, 2, 1, 3)

        q = heads(dense("to_q")(x))
        k = heads(dense("to_k")(x))
        v = heads(dense("to_v")(x))
        if cfg.qk_norm == "rms_norm":
            q = RMSNorm(d, name="norm_q")(q)
            k = RMSNorm(d, name="norm_k")(k)

        qc = heads(dense("add_q_proj")(ctx))
        kc = heads(dense("add_k_proj")(ctx))
        vc = heads(dense("add_v_proj")(ctx))
        if cfg.qk_norm == "rms_norm":
            qc = RMSNorm(d, name="norm_added_q")(qc)
            kc = RMSNorm(d, name="norm_added_k")(kc)

        # Pad the (small) context q/k/v to land the joint length on a 128
        # multiple: the flash kernel then skips its three full-sequence pad
        # copies per layer (~27MB each at 1024px); the 51 pad kv columns are
        # masked via kv_len inside the kernel, pad q rows are sliced away.
        # Sequence-parallel mode additionally needs the padded length to
        # tile the ring (every device owns an equal, aligned token shard).
        n_tok = n_img + n_ctx
        unit = _seq_pad_unit(cfg) if cfg.seq_mesh is not None else 128
        pad = -n_tok % unit
        if pad:
            zeros = ((0, 0), (0, 0), (0, pad), (0, 0))
            qc, kc, vc = (jnp.pad(t, zeros) for t in (qc, kc, vc))
        q = jnp.concatenate([q, qc], axis=2)
        k = jnp.concatenate([k, kc], axis=2)
        v = jnp.concatenate([v, vc], axis=2)

        if cfg.seq_mesh is not None:
            o = _ring_attention(cfg, q, k, v, n_tok)
        else:
            o = joint_attention(
                q, k, v, kv_len=n_tok if pad else None,
                use_pallas=cfg.use_pallas,
            )
        o = o.transpose(0, 2, 1, 3).reshape(b, n_tok + pad, h * d)
        o_img, o_ctx = o[:, :n_img], o[:, n_img:n_tok]

        o_img = DenseMaybeQuant(
            cfg.inner_dim, quant=cfg.quant_matmuls, bits=cfg.quant_bits,
            dtype=cfg.dtype, name="to_out",
        )(o_img)
        if self.context_pre_only:
            return o_img, None
        o_ctx = DenseMaybeQuant(
            cfg.inner_dim, quant=cfg.quant_matmuls, bits=cfg.quant_bits,
            dtype=cfg.dtype, name="to_add_out",
        )(o_ctx)
        return o_img, o_ctx


class SelfAttention(nn.Module):
    """Image-only self-attention for SD3.5 dual-attention layers."""

    config: MMDiTConfig

    @nn.compact
    def __call__(self, x: jax.Array):
        cfg = self.config
        h, d = cfg.num_attention_heads, cfg.attention_head_dim
        b = x.shape[0]

        def heads(t):
            return t.reshape(b, -1, h, d).transpose(0, 2, 1, 3)

        from tpdm_tpu.ops.quant import DenseMaybeQuant

        dense = lambda name: DenseMaybeQuant(
            h * d, quant=cfg.quant_matmuls, bits=cfg.quant_bits,
            dtype=cfg.dtype, name=name,
        )
        q = heads(dense("to_q")(x))
        k = heads(dense("to_k")(x))
        v = heads(dense("to_v")(x))
        if cfg.qk_norm == "rms_norm":
            q = RMSNorm(d, name="norm_q")(q)
            k = RMSNorm(d, name="norm_k")(k)
        if cfg.seq_mesh is not None:
            n_img = q.shape[2]
            pad = -n_img % _seq_pad_unit(cfg)
            if pad:
                zeros = ((0, 0), (0, 0), (0, pad), (0, 0))
                q, k, v = (jnp.pad(t, zeros) for t in (q, k, v))
            o = _ring_attention(cfg, q, k, v, n_img)[:, :, :n_img]
        else:
            o = joint_attention(q, k, v, use_pallas=cfg.use_pallas)
        o = o.transpose(0, 2, 1, 3).reshape(b, -1, h * d)
        return DenseMaybeQuant(
            cfg.inner_dim, quant=cfg.quant_matmuls, bits=cfg.quant_bits,
            dtype=cfg.dtype, name="to_out",
        )(o)


class JointBlock(nn.Module):
    """One MMDiT dual-stream block (diffusers `JointTransformerBlock`)."""

    config: MMDiTConfig
    context_pre_only: bool = False
    use_dual_attention: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, ctx: jax.Array, temb: jax.Array):
        cfg = self.config
        dim = cfg.inner_dim

        if self.use_dual_attention:
            (
                norm_x,
                gate_msa,
                shift_mlp,
                scale_mlp,
                gate_mlp,
                norm_x2,
                gate_msa2,
            ) = AdaLayerNormZeroX(dim, dtype=cfg.dtype, name="norm1")(x, temb)
        else:
            norm_x, gate_msa, shift_mlp, scale_mlp, gate_mlp = AdaLayerNormZero(
                dim, dtype=cfg.dtype, name="norm1"
            )(x, temb)

        if self.context_pre_only:
            norm_ctx = AdaLayerNormContinuous(
                dim, dtype=cfg.dtype, name="norm1_context"
            )(ctx, temb)
        else:
            (
                norm_ctx,
                c_gate_msa,
                c_shift_mlp,
                c_scale_mlp,
                c_gate_mlp,
            ) = AdaLayerNormZero(dim, dtype=cfg.dtype, name="norm1_context")(ctx, temb)

        attn_out, ctx_attn_out = JointAttention(
            cfg, context_pre_only=self.context_pre_only, name="attn"
        )(norm_x, norm_ctx)
        x = x + gate_msa[:, None] * attn_out

        if self.use_dual_attention:
            attn2_out = SelfAttention(cfg, name="attn2")(norm_x2)
            x = x + gate_msa2[:, None] * attn2_out

        norm_x = _layer_norm_fp32(x)
        norm_x = norm_x * (1.0 + scale_mlp[:, None]) + shift_mlp[:, None]
        x = x + gate_mlp[:, None] * FeedForward(
            dim, dtype=cfg.dtype, quant=cfg.quant_matmuls,
            quant_bits=cfg.quant_bits, name="ff",
        )(norm_x)

        if self.context_pre_only:
            return x, ctx
        ctx = ctx + c_gate_msa[:, None] * ctx_attn_out
        norm_ctx = _layer_norm_fp32(ctx)
        norm_ctx = norm_ctx * (1.0 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        ctx = ctx + c_gate_mlp[:, None] * FeedForward(
            dim, dtype=cfg.dtype, quant=cfg.quant_matmuls,
            quant_bits=cfg.quant_bits, name="ff_context",
        )(norm_ctx)
        return x, ctx


class MMDiT(nn.Module):
    """The SD3 denoiser. Returns (velocity, temb, h1_tokens, h2_tokens).

    forward contract parity: reference transformer_sd3.py:299-409 (tuple
    return at :402). h1/h2 are token-sequence activations (b, n, inner_dim);
    the caller reshapes them to 2D for the TPM
    (see `tpdm_tpu.models.tpm.reshape_tokens_to_2d`).
    """

    config: MMDiTConfig
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (b, c, h, w) NCHW
        timestep: jax.Array,  # (b,) continuous, sigma*1000
        encoder_hidden_states: jax.Array,  # (b, n_txt, joint_attention_dim)
        pooled_projections: jax.Array,  # (b, pooled_projection_dim)
        delta: Optional[jax.Array] = None,  # (b, n_img, inner) cached Δ
        cache_mode: Optional[str] = None,  # None | "record" | "reuse"
    ):
        """cache_mode=None returns the reference 4-tuple. "record"/"reuse"
        return a 5-tuple (velocity, temb, h1, h2, delta): "record" runs the
        full network and emits Δ over the back block group; "reuse" runs only
        ``config.cache_front_blocks`` blocks and substitutes the given Δ for
        the rest (the context stream is consumed only by blocks, so no ctx
        cache is needed). Param tree is IDENTICAL across modes — "reuse"
        simply never touches the back blocks' weights.
        """
        cfg = self.config
        if cache_mode is not None:
            if not 1 <= cfg.cache_front_blocks < cfg.num_layers:
                raise ValueError(
                    "cache_front_blocks must be in [1, num_layers): got "
                    f"{cfg.cache_front_blocks} of {cfg.num_layers}"
                )
            if cache_mode == "reuse" and delta is None:
                raise ValueError("cache_mode='reuse' needs a delta")
        b, c, height, width = latents.shape
        p = cfg.patch_size

        x = PatchEmbed(
            patch_size=p,
            embed_dim=cfg.inner_dim,
            pos_embed_max_size=cfg.pos_embed_max_size,
            base_size=cfg.sample_size // p,
            dtype=cfg.dtype,
            name="pos_embed",
        )(latents)
        h1 = x
        temb = CombinedTimestepTextEmbed(
            cfg.inner_dim, dtype=cfg.dtype, name="time_text_embed"
        )(timestep, pooled_projections)
        ctx = nn.Dense(
            cfg.caption_projection_dim, dtype=cfg.dtype, name="context_embedder"
        )(encoder_hidden_states)

        block_cls = nn.remat(JointBlock) if self.remat else JointBlock
        x = _seq_constraint(cfg, x)
        x_front = None
        n_run = (
            cfg.cache_front_blocks if cache_mode == "reuse" else cfg.num_layers
        )
        for i in range(n_run):
            x, ctx = block_cls(
                cfg,
                context_pre_only=(i == cfg.num_layers - 1),
                use_dual_attention=(i in cfg.dual_attention_layers),
                name=f"transformer_blocks_{i}",
            )(x, ctx, temb)
            x = _seq_constraint(cfg, x)
            if cache_mode == "record" and i == cfg.cache_front_blocks - 1:
                x_front = x
        if cache_mode == "record":
            delta = (x - x_front).astype(cfg.dtype)
        elif cache_mode == "reuse":
            x = _seq_constraint(cfg, x + delta.astype(x.dtype))

        x = AdaLayerNormContinuous(cfg.inner_dim, dtype=cfg.dtype, name="norm_out")(
            x, temb
        )
        h2 = x
        x = nn.Dense(p * p * cfg.out_channels, dtype=cfg.dtype, name="proj_out")(x)

        # Unpatchify: (b, gh*gw, p*p*c_out) -> (b, c_out, h, w); einsum
        # nhwpqc->nchpwq parity with transformer_sd3.py:381-399.
        gh, gw = height // p, width // p
        x = x.reshape(b, gh, gw, p, p, cfg.out_channels)
        x = x.transpose(0, 5, 1, 3, 2, 4)  # n c h p w q
        velocity = x.reshape(b, cfg.out_channels, gh * p, gw * p)

        if cache_mode is not None:
            return velocity, temb, h1, h2, delta
        return velocity, temb, h1, h2
