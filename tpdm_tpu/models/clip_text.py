"""CLIP text encoder with projection (SD3's text_encoder / text_encoder_2).

Implements the transformers `CLIPTextModelWithProjection` architecture in
flax.linen — the reference loads these from pretrained weights
(reference: src/models/stable_diffusion_3/modeling_sd3_pnt.py:163-168) and
consumes the penultimate hidden state for sequence embeds plus the
projected EOS pooled output (:269-274). Parity is tested against tiny
random transformers torch models; weights convert via
tpdm_tpu.utils.convert.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_NEG_INF = -3.4e38


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # CLIP-L; CLIP-G uses "gelu"
    projection_dim: int = 768
    eos_token_id: int = 49407
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def sd3_clip_l(cls, **kw) -> "CLIPTextConfig":
        return cls(**kw)

    @classmethod
    def sd3_clip_g(cls, **kw) -> "CLIPTextConfig":
        d = dict(
            hidden_size=1280,
            intermediate_size=5120,
            num_hidden_layers=32,
            num_attention_heads=20,
            hidden_act="gelu",
            projection_dim=1280,
        )
        d.update(kw)
        return cls(**d)

    @classmethod
    def toy(cls, **kw) -> "CLIPTextConfig":
        d = dict(
            vocab_size=99,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=16,
            projection_dim=24,
            eos_token_id=98,
        )
        d.update(kw)
        return cls(**d)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "gelu_new":
        return lambda x: nn.gelu(x, approximate=True)
    raise ValueError(f"unknown act {name}")


class CLIPAttention(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        cfg = self.config
        b, n, d = x.shape
        h = cfg.num_attention_heads
        hd = d // h
        dense = lambda name: nn.Dense(d, dtype=cfg.dtype, name=name)

        q = dense("q_proj")(x).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        k = dense("k_proj")(x).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        v = dense("v_proj")(x).reshape(b, n, h, hd).transpose(0, 2, 1, 3)

        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        s = jnp.where(causal_mask[None, None], s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        return dense("out_proj")(o)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        cfg = self.config
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name=name
        )
        x = x + CLIPAttention(cfg, name="self_attn")(ln("layer_norm1")(x), causal_mask)
        y = ln("layer_norm2")(x)
        y = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(y)
        y = _act(cfg.hidden_act)(y)
        y = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(y)
        return x + y


class CLIPTextModel(nn.Module):
    """Returns (penultimate_hidden, final_hidden, pooled, projected).

    - penultimate_hidden: hidden_states[-2], what SD3 feeds the MMDiT
      (clip_skip=None path, modeling_sd3_pnt.py:271-272).
    - projected: text_projection(EOS-pooled final LN output) — the pooled
      embedding (b, projection_dim).
    """

    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        cfg = self.config
        b, n = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype, name="token_embedding"
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        x = tok + pos[None, :n].astype(tok.dtype)

        causal = jnp.tril(jnp.ones((n, n), bool))
        penultimate = None
        for i in range(cfg.num_hidden_layers):
            if i == cfg.num_hidden_layers - 1:
                penultimate = x
            x = CLIPLayer(cfg, name=f"layers_{i}")(x, causal)

        final = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="final_layer_norm"
        )(x)

        # EOS pooling: position of the first eos_token_id per row
        # (transformers CLIPTextModel pooled_output semantics).
        is_eos = (input_ids == cfg.eos_token_id).astype(jnp.int32)
        eos_idx = jnp.argmax(is_eos, axis=1)
        pooled = final[jnp.arange(b), eos_idx]
        projected = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=cfg.dtype, name="text_projection"
        )(pooled)
        return penultimate, final, pooled, projected
