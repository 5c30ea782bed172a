"""BERT "med" text encoder with per-layer cross-attention (BLIP/ImageReward).

Matches the BLIP med architecture (reference:
src/reward_models/ImageReward/models/BLIP/med.py:44-947): HF-BERT layout —
post-norm residuals, eps 1e-12 — with bidirectional self-attention plus a
cross-attention sublayer in every block attending to the image tokens.
Checkpoint keys convert from the HF/BLIP naming
(encoder.layer.{i}.attention.self.query / crossattention / intermediate /
output / embeddings.*).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertMedConfig:
    vocab_size: int = 30524  # bert-base + 2 BLIP special tokens
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    encoder_width: int = 1024  # image-token width (ViT-L)
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def image_reward(cls, **kw) -> "BertMedConfig":
        return cls(**kw)

    @classmethod
    def toy(cls, **kw) -> "BertMedConfig":
        d = dict(
            vocab_size=50,
            hidden_size=24,
            num_hidden_layers=2,
            num_attention_heads=3,
            intermediate_size=40,
            max_position_embeddings=16,
            encoder_width=24,
        )
        d.update(kw)
        return cls(**d)


class _Attention(nn.Module):
    """q from x; k/v from y (self-attn when y is x). HF post-norm layout.

    causal=True applies the decoder's lower-triangular mask on top of any
    padding mask (BLIP med.py BertSelfAttention with is_decoder=True)."""

    config: BertMedConfig
    kv_width: int
    causal: bool = False

    @nn.compact
    def __call__(self, x, y, mask: Optional[jax.Array]):
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_attention_heads
        hd = d // h
        b, n, _ = x.shape
        m = y.shape[1]

        q = nn.Dense(d, dtype=cfg.dtype, name="query")(x)
        k = nn.Dense(d, dtype=cfg.dtype, name="key")(y)
        v = nn.Dense(d, dtype=cfg.dtype, name="value")(y)
        q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, h, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * hd**-0.5
        if mask is not None:
            s = jnp.where(mask[:, None, None, :], s, -1e9)
        if self.causal:
            tri = jnp.tril(jnp.ones((n, m), bool))
            s = jnp.where(tri[None, None], s, -1e9)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return o.transpose(0, 2, 1, 3).reshape(b, n, d)


class BertMedLayer(nn.Module):
    config: BertMedConfig
    causal: bool = False

    @nn.compact
    def __call__(self, x, image_embeds, text_mask, image_mask):
        cfg = self.config
        d = cfg.hidden_size
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name=name
        )

        att = _Attention(
            cfg, d, causal=self.causal, name="attention_self"
        )(x, x, text_mask)
        att = nn.Dense(d, dtype=cfg.dtype, name="attention_output")(att)
        x = ln("attention_ln")(x + att)

        if image_embeds is not None:
            cross = _Attention(cfg, cfg.encoder_width, name="cross_self")(
                x, image_embeds, image_mask
            )
            cross = nn.Dense(d, dtype=cfg.dtype, name="cross_output")(cross)
            x = ln("cross_ln")(x + cross)

        y = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=cfg.dtype, name="output")(y)
        return ln("output_ln")(x + y)


class BertMedModel(nn.Module):
    """Returns last_hidden_state (b, n, hidden).

    is_decoder=True switches every self-attention to the causal decoder
    mask — the BLIP text-decoder mode (med.py BertLMHeadModel's trunk,
    mode="text"/is_decoder, used by BLIP's captioner; ImageReward's
    `score` never exercises it, blip_pretrain.py:14-43 ships it). The
    parameter tree is identical to the encoder's — BLIP shares the
    trunk and flips the mask."""

    config: BertMedConfig
    is_decoder: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        encoder_hidden_states: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
    ):
        cfg = self.config
        b, n = input_ids.shape
        x = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype, name="word_embeddings"
        )(input_ids)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        x = x + pos[None, :n].astype(x.dtype)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="embeddings_ln"
        )(x)

        for i in range(cfg.num_hidden_layers):
            x = BertMedLayer(cfg, causal=self.is_decoder, name=f"layer_{i}")(
                x, encoder_hidden_states, attention_mask, encoder_attention_mask
            )
        return x


class BertLMHead(nn.Module):
    """HF BertOnlyMLMHead: transform (dense + gelu + LN) then the vocab
    projection — the decoder head BLIP's captioner puts on the med trunk
    (med.py BertLMHeadModel.cls; checkpoint keys
    cls.predictions.transform.dense / .LayerNorm / cls.predictions.decoder)."""

    config: BertMedConfig

    @nn.compact
    def __call__(self, hidden: jax.Array) -> jax.Array:
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="transform")(hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="transform_ln"
        )(x)
        return nn.Dense(cfg.vocab_size, dtype=cfg.dtype, name="decoder")(x)


class BertMedDecoder(nn.Module):
    """Causal med trunk + LM head: (ids, image_embeds) -> vocab logits.

    The full BLIP text-decoder the reference vendors but never runs from
    ImageReward (med.py decoder path + blip_pretrain.py:14-43's
    text_decoder); here it completes the framework's BLIP stack so a
    captioning head can load converted BLIP weights."""

    config: BertMedConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        encoder_hidden_states: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
    ):
        x = BertMedModel(self.config, is_decoder=True, name="bert")(
            input_ids, attention_mask, encoder_hidden_states,
            encoder_attention_mask,
        )
        return BertLMHead(self.config, name="cls")(x)


def greedy_caption(
    decoder: BertMedDecoder,
    params,
    image_embeds: jax.Array,
    bos_id: int,
    sep_id: int,
    max_len: int = 20,
    pad_id: int = 0,
):
    """Greedy BLIP captioning over the causal decoder (the generate()
    path of med.py's BertLMHeadModel, greedy beam=1 case): start from
    [bos], append argmax tokens, stop per-sample at sep_id. Fixed-shape
    scan — ONE compiled program for any batch; finished rows pad.

    Returns (b, max_len) int32 token ids (bos included, pad after sep).
    """
    b = image_embeds.shape[0]
    ids0 = jnp.full((b, max_len), pad_id, jnp.int32)
    ids0 = ids0.at[:, 0].set(bos_id)

    def step(carry, i):
        ids, done = carry
        logits = decoder.apply(
            params, ids, ids != pad_id, image_embeds, None
        )
        nxt = jnp.argmax(logits[:, i - 1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad_id, nxt)
        ids = ids.at[:, i].set(nxt)
        done = done | (nxt == sep_id)
        return (ids, done), None

    (ids, _), _ = jax.lax.scan(
        step,
        (ids0, jnp.zeros((b,), bool)),
        jnp.arange(1, max_len),
    )
    return ids
