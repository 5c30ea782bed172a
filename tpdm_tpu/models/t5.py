"""T5 v1.1 encoder (SD3's text_encoder_3, T5-XXL).

transformers `T5EncoderModel` architecture in flax.linen: RMSNorm, no
biases, gated-GELU MLP, relative position bias computed once in layer 0 and
shared by all layers. The reference loads it pretrained
(reference: src/models/stable_diffusion_3/modeling_sd3_pnt.py:169-175) and
takes last_hidden_state as the 256-token prompt embedding (:227).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    # Weight-only stored-int quantization of the block matmuls
    # (ops/quant.py, fp activations — encoder fidelity feeds every
    # downstream image). T5-XXL's 9.5 GB bf16 either squats on HBM or
    # streams host->device per cold-prompt encode (pipeline.py memory
    # policy); int8 halves that, int4 quarters it.
    quant_matmuls: bool = False
    quant_bits: int = 8

    @classmethod
    def t5_xxl(cls, **kw) -> "T5Config":
        return cls(**kw)

    @classmethod
    def toy(cls, **kw) -> "T5Config":
        d = dict(
            vocab_size=120, d_model=32, d_kv=8, d_ff=48, num_layers=2, num_heads=4
        )
        d.update(kw)
        return cls(**d)


class T5LayerNorm(nn.Module):
    """RMS norm without mean subtraction, weight-only (T5 style)."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return x * w


def t5_relative_position_bucket(
    relative_position: jax.Array, num_buckets: int = 32, max_distance: int = 128
) -> jax.Array:
    """Bidirectional bucket mapping (transformers T5Attention parity)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, position_bias):
        cfg = self.config
        b, n, _ = x.shape
        h, dk = cfg.num_heads, cfg.d_kv
        inner = h * dk
        from tpdm_tpu.ops.quant import DenseMaybeQuant

        dense = lambda name: DenseMaybeQuant(
            inner, quant=cfg.quant_matmuls, act_quant=False,
            bits=cfg.quant_bits, use_bias=False, dtype=cfg.dtype, name=name,
        )
        heads = lambda t: t.reshape(b, n, h, dk).transpose(0, 2, 1, 3)

        q = heads(dense("q")(x))
        k = heads(dense("k")(x))
        v = heads(dense("v")(x))

        if position_bias is None:
            rel = (
                jnp.arange(n)[None, :] - jnp.arange(n)[:, None]
            )  # memory - query
            buckets = t5_relative_position_bucket(
                rel,
                cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance,
            )
            table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, h),
            )
            position_bias = table[buckets].transpose(2, 0, 1)[None]  # (1,h,n,n)

        # T5 does NOT scale by sqrt(d_kv)
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        s = s + position_bias.astype(jnp.float32)
        if mask is not None:
            s = jnp.where(mask[:, None, None, :], s, -1e9)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return (
            DenseMaybeQuant(
                cfg.d_model, quant=cfg.quant_matmuls, act_quant=False,
                bits=cfg.quant_bits, use_bias=False, dtype=cfg.dtype,
                name="o",
            )(o),
            position_bias,
        )


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, position_bias):
        cfg = self.config
        y = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, cfg.dtype, name="ln_attn")(x)
        att, position_bias = T5Attention(
            cfg, self.has_relative_bias, name="attention"
        )(y, mask, position_bias)
        x = x + att

        from tpdm_tpu.ops.quant import DenseMaybeQuant

        y = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, cfg.dtype, name="ln_mlp")(x)
        qdense = lambda feats, name: DenseMaybeQuant(
            feats, quant=cfg.quant_matmuls, act_quant=False,
            bits=cfg.quant_bits, use_bias=False, dtype=cfg.dtype, name=name,
        )
        wi0 = qdense(cfg.d_ff, "wi_0")(y)
        wi1 = qdense(cfg.d_ff, "wi_1")(y)
        y = nn.gelu(wi0, approximate=True) * wi1  # gated-GELU (T5 v1.1)
        y = qdense(cfg.d_model, "wo")(y)
        return x + y, position_bias


class T5Encoder(nn.Module):
    """Returns last_hidden_state (b, n, d_model)."""

    config: T5Config

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask=None):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype, name="shared")(
            input_ids
        )
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(
                cfg, has_relative_bias=(i == 0), name=f"block_{i}"
            )(x, attention_mask, position_bias)
        return T5LayerNorm(
            cfg.d_model, cfg.layer_norm_epsilon, cfg.dtype, name="final_layer_norm"
        )(x)
