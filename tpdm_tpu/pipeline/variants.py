"""Generation pipelines for the SD1.5 and FLUX model families.

User-facing counterparts of the SD3 `TPDMPipeline`: adaptive-schedule
generation with deterministic (predict) schedules, VAE decode of the last
valid latent, and realized step counts — the surface the reference exposes
through `SD15PredictNextTimeStepModel.forward`
(reference: src/models/stable_diffusion_v1_5/modeling_sd_v1_5.py:623-925)
and names for FLUX.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpdm_tpu.utils.image import postprocess_images


class VariantResult(NamedTuple):
    images: np.ndarray
    num_steps: int
    last_valid_index: np.ndarray
    schedule: np.ndarray  # times (SD1.5) or sigmas (FLUX), (b, T)


class SD15Pipeline:
    """SD1.5 adaptive generation: agent rollout (predict) + VAE decode."""

    def __init__(self, agent, vae=None, vae_params=None, text_encoder=None, text_params=None):
        self.agent = agent
        self.vae = vae
        self.vae_params = vae_params
        self.text_encoder = text_encoder
        self.text_params = text_params
        self._decode = None
        if vae is not None:
            cfg = vae.config
            self._decode = jax.jit(
                lambda p, z: vae.apply(
                    p, z.astype(jnp.float32) / cfg.scaling_factor + cfg.shift_factor
                )
            )

    def generate(
        self,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        clip_ids: Optional[np.ndarray] = None,
        negative_clip_ids: Optional[np.ndarray] = None,
        seed: int = 0,
        tpm_params=None,
    ) -> VariantResult:
        if prompt_embeds is None:
            if self.text_encoder is None:
                raise ValueError("need prompt_embeds or a text encoder")
            # SD1.5 conditions on the FINAL hidden state (clip_skip=None)
            prompt_embeds = self.text_encoder.apply(
                self.text_params, jnp.asarray(clip_ids)
            )[1]
            negative_prompt_embeds = self.text_encoder.apply(
                self.text_params, jnp.asarray(negative_clip_ids)
            )[1]
        if (
            negative_prompt_embeds is None
            and self.agent.guidance_scale is not None
            and self.agent.guidance_scale > 1
        ):
            raise ValueError(
                "classifier-free guidance is on (guidance_scale="
                f"{self.agent.guidance_scale}); pass negative_prompt_embeds "
                "or negative_clip_ids (the reference encodes an empty prompt)"
            )
        batch = {
            "prompt_embeds": prompt_embeds,
            "negative_prompt_embeds": negative_prompt_embeds,
        }
        if tpm_params is None:
            tpm_params = self.agent.init_tpm_params(jax.random.PRNGKey(0))
        out = self.agent.sample(
            tpm_params, batch, jax.random.PRNGKey(seed), predict=True
        )
        if self._decode is not None:
            images = postprocess_images(self._decode(self.vae_params, out.final_latents))
        else:
            images = np.asarray(out.final_latents)
        return VariantResult(
            images=images,
            num_steps=int(out.num_steps),
            last_valid_index=np.asarray(out.last_valid_index),
            schedule=np.asarray(out.times),
        )


class FluxPipeline:
    """FLUX adaptive generation (embedded guidance, T5 conditioning)."""

    def __init__(self, agent, vae=None, vae_params=None):
        self.agent = agent
        self.vae = vae
        self.vae_params = vae_params
        self._decode = None
        if vae is not None:
            cfg = vae.config
            self._decode = jax.jit(
                lambda p, z: vae.apply(
                    p, z.astype(jnp.float32) / cfg.scaling_factor + cfg.shift_factor
                )
            )

    def generate(
        self,
        prompt_embeds: jax.Array,  # T5 features (b, n, txt_dim)
        pooled_prompt_embeds: jax.Array,  # CLIP pooled (b, vec_dim)
        seed: int = 0,
        tpm_params=None,
    ) -> VariantResult:
        batch = {
            "prompt_embeds": prompt_embeds,
            "pooled_prompt_embeds": pooled_prompt_embeds,
        }
        if tpm_params is None:
            tpm_params = self.agent.init_tpm_params(jax.random.PRNGKey(0))
        out = self.agent.sample(
            tpm_params, batch, jax.random.PRNGKey(seed), predict=True
        )
        if self._decode is not None:
            images = postprocess_images(self._decode(self.vae_params, out.final_latents))
        else:
            images = np.asarray(out.final_latents)
        return VariantResult(
            images=images,
            num_steps=int(out.num_steps),
            last_valid_index=np.asarray(out.last_valid_index),
            schedule=np.asarray(out.sigmas),
        )
