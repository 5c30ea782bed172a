"""SD3 prompt encoding: CLIP-L + CLIP-G + T5 -> MMDiT conditioning tensors.

Exact assembly parity with the reference `encode_prompt`
(reference: src/models/stable_diffusion_3/modeling_sd3_pnt.py:288-420):

    clip = concat([clip_l_penultimate, clip_g_penultimate], dim=-1)  # (b,77,2048)
    clip = pad_last_dim(clip, t5_width)                              # (b,77,4096)
    prompt_embeds = concat([clip, t5_last_hidden], dim=-2)           # (b,333,4096)
    pooled = concat([clip_l_projected, clip_g_projected], dim=-1)    # (b,2048)

Tokenization happens on host (tokenizers need vocab assets); this module
takes input ids. The `pre_process` mode of the reference (ctor flag at
:162) — shipping precomputed embeds instead of raw text — maps to simply
calling this once offline and caching.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class PromptEmbeds(NamedTuple):
    prompt_embeds: jax.Array  # (b, 77 + t5_len, 4096)
    pooled_prompt_embeds: jax.Array  # (b, 2048)


class SD3TextEncoders:
    """Bundles the three encoder applies + the assembly logic."""

    def __init__(
        self,
        clip_l_model,
        clip_l_params,
        clip_g_model,
        clip_g_params,
        t5_model=None,
        t5_params=None,
        t5_width: int = 4096,
    ):
        self.clip_l = (clip_l_model, clip_l_params)
        self.clip_g = (clip_g_model, clip_g_params)
        self.t5 = (t5_model, t5_params)
        self.t5_width = t5_width
        self._encode = jax.jit(self._encode_impl)

    def _encode_impl(
        self,
        clip_ids: jax.Array,  # (b, 77) shared by both CLIP towers
        t5_ids: Optional[jax.Array],  # (b, 256) or None (T5 dropped)
    ) -> PromptEmbeds:
        lm, lp = self.clip_l
        gm, gp = self.clip_g
        pen_l, _, _, proj_l = lm.apply(lp, clip_ids)
        pen_g, _, _, proj_g = gm.apply(gp, clip_ids)

        clip_embeds = jnp.concatenate([pen_l, pen_g], axis=-1)
        pad = self.t5_width - clip_embeds.shape[-1]
        clip_embeds = jnp.pad(clip_embeds, ((0, 0), (0, 0), (0, pad)))

        tm, tp = self.t5
        if t5_ids is not None and tm is not None:
            t5_embeds = tm.apply(tp, t5_ids)
        else:
            # reference behavior when T5 is dropped: zeros of t5 length
            b = clip_ids.shape[0]
            t5_embeds = jnp.zeros((b, 256, self.t5_width), clip_embeds.dtype)

        prompt_embeds = jnp.concatenate([clip_embeds, t5_embeds], axis=-2)
        pooled = jnp.concatenate([proj_l, proj_g], axis=-1)
        return PromptEmbeds(prompt_embeds, pooled)

    def encode(self, clip_ids, t5_ids=None) -> PromptEmbeds:
        return self._encode(jnp.asarray(clip_ids), None if t5_ids is None else jnp.asarray(t5_ids))


class SDXLTextEncoders:
    """SDXL prompt encoding: CLIP-L + CLIP-bigG (the same two towers SD3
    uses, minus T5) -> UNet conditioning.

        prompt_embeds = concat([clip_l_penultimate, clip_g_penultimate], -1)
                        # (b, 77, 768+1280 = 2048)
        pooled        = clip_g_projected                      # (b, 1280)

    diffusers StableDiffusionXLPipeline.encode_prompt semantics: both
    towers contribute penultimate hidden states (clip_skip=None), only
    text_encoder_2's projected EOS embedding is pooled. Beyond-reference
    family (the reference has no SDXL); tokenization happens on host.
    """

    def __init__(self, clip_l_model, clip_l_params, clip_g_model, clip_g_params):
        self.clip_l = (clip_l_model, clip_l_params)
        self.clip_g = (clip_g_model, clip_g_params)
        self._encode = jax.jit(self._encode_impl)
        self._encode_g = jax.jit(self._encode_refiner_impl)

    def _encode_impl(self, clip_ids: jax.Array, clip_g_ids: jax.Array) -> PromptEmbeds:
        lm, lp = self.clip_l
        gm, gp = self.clip_g
        pen_l, _, _, _ = lm.apply(lp, clip_ids)
        pen_g, _, _, proj_g = gm.apply(gp, clip_g_ids)
        prompt_embeds = jnp.concatenate([pen_l, pen_g], axis=-1)
        return PromptEmbeds(prompt_embeds, proj_g)

    def encode(self, clip_ids, clip_g_ids=None) -> PromptEmbeds:
        """clip_g_ids: optional per-tower ids for the bigG tower —
        diffusers SDXL tokenizes per tower (tokenizer_2 pads with id 0,
        not 49407) and supports a distinct prompt_2, so host tokenization
        can supply different ids per tower. Defaults to clip_ids (one
        prompt, shared tokenizer) for backward compatibility."""
        clip_ids = jnp.asarray(clip_ids)
        g = clip_ids if clip_g_ids is None else jnp.asarray(clip_g_ids)
        return self._encode(clip_ids, g)

    def _encode_refiner_impl(self, clip_g_ids: jax.Array) -> PromptEmbeds:
        gm, gp = self.clip_g
        pen_g, _, _, proj_g = gm.apply(gp, clip_g_ids)
        return PromptEmbeds(pen_g, proj_g)

    def encode_refiner(self, clip_g_ids) -> PromptEmbeds:
        """SDXL-REFINER prompt encoding: bigG tower only — prompt_embeds is
        its penultimate hidden state (b, 77, 1280), pooled its projected
        EOS embedding (diffusers StableDiffusionXLImg2ImgPipeline
        encode_prompt when text_encoder is None: the refiner has no CLIP-L
        tower, cross_attention_dim=1280)."""
        return self._encode_g(jnp.asarray(clip_g_ids))
