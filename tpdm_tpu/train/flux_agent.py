"""FLUX RL agent: TPM-adaptive schedules on a guidance-distilled flow DiT.

The capability target the reference names but never implements
(gradio_sd3_inference.py:23-28; BASELINE config 5). Reuses the SD3 adaptive
Euler machinery — FLUX is the same rectified-flow sigma space — with two
differences: no CFG batch doubling (guidance is embedded) and packed-token
I/O around the backbone.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from tpdm_tpu.models.flux import Flux, FluxConfig, pack_latents, unpack_latents
from tpdm_tpu.models.tpm import TimePredictor, reshape_tokens_to_2d
from tpdm_tpu.pipeline.sampler import (
    SampleOutput,
    SamplerConfig,
    adaptive_sample,
    replay_logprobs,
)
from tpdm_tpu.train.config import RLOOConfig
from tpdm_tpu.train.rloo import compute_beta_kl_penalty


def make_flux_denoise_fn(
    flux_apply,
    txt_tokens: jax.Array,
    txt_ids: jax.Array,
    pooled: jax.Array,
    guidance: Optional[float],
    latent_hw: tuple[int, int],
):
    h, w = latent_hw
    grid = h // 2

    def denoise_fn(latents, sigma):
        tokens, img_ids = pack_latents(latents)
        g = None if guidance is None else jnp.full(sigma.shape, guidance)
        vel_tok, vec, h1, h2 = flux_apply(
            tokens, img_ids, txt_tokens, txt_ids, sigma, pooled, g
        )
        velocity = unpack_latents(vel_tok, h, w)
        h_comb = jnp.concatenate(
            [
                reshape_tokens_to_2d(h1, grid, grid, 2),
                reshape_tokens_to_2d(h2, grid, grid, 2),
            ],
            axis=1,
        )
        return velocity, vec, h_comb

    return denoise_fn


def make_flux_denoise_cached_fns(
    flux_apply_record,
    flux_apply_reuse,
    txt_tokens: jax.Array,
    txt_ids: jax.Array,
    pooled: jax.Array,
    guidance: Optional[float],
    latent_hw: tuple[int, int],
):
    """Residual-cache pair for FLUX (Δ-DiT-style; see
    models/flux.py FluxConfig.cache_front_blocks). Returns
    ``(full_fn, reuse_fn)``, each ``(latents, sigma, delta) -> (velocity,
    vec, h_combined, delta)`` — the sampler.CachedDenoise contract. No CFG
    batch-doubling (guidance is embedded)."""
    h, w = latent_hw
    grid = h // 2

    def make(apply_fn):
        def denoise_fn(latents, sigma, delta):
            tokens, img_ids = pack_latents(latents)
            g = None if guidance is None else jnp.full(sigma.shape, guidance)
            vel_tok, vec, h1, h2, delta = apply_fn(
                tokens, img_ids, txt_tokens, txt_ids, sigma, pooled, g, delta
            )
            velocity = unpack_latents(vel_tok, h, w)
            h_comb = jnp.concatenate(
                [
                    reshape_tokens_to_2d(h1, grid, grid, 2),
                    reshape_tokens_to_2d(h2, grid, grid, 2),
                ],
                axis=1,
            )
            return velocity, vec, h_comb, delta

        return denoise_fn

    return make(flux_apply_record), make(flux_apply_reuse)


class FluxAgent:
    """RLOOTrainer-compatible agent over a Flux backbone."""

    def __init__(
        self,
        flux: Flux,
        flux_params,
        config: RLOOConfig,
        tpm: Optional[TimePredictor] = None,
        latent_size: int = 128,  # 1024px
        latent_channels: int = 16,
        guidance: Optional[float] = 3.5,
    ):
        self.flux = flux
        self.flux_params = flux_params
        self.config = config
        self.latent_size = latent_size
        self.latent_channels = latent_channels
        self.guidance = guidance
        fcfg = flux.config
        self.grid = latent_size // 2
        self.tpm = tpm or TimePredictor(
            conv_out_channels=128,
            in_channels=2 * fcfg.hidden_size,
            temb_dim=fcfg.hidden_size,
            init_alpha=config.init_alpha,
            init_beta=config.init_beta,
            param_cap=getattr(config, "tpm_param_cap", None),
        )
        self.sampler_cfg = SamplerConfig(
            max_inference_steps=config.max_inference_steps,
            min_sigma=config.min_sigma,
            relative=config.relative,
            prediction_type=config.prediction_type,
            cache_activations=True,
            solver=getattr(config, "solver", "euler"),
        )
        self._sample_jit = jax.jit(self._sample, static_argnames=("scfg",))
        self._replay_jit = jax.jit(self.replay)

    def shard(self, mesh):
        """Mesh-shard the frozen FLUX backbone: qkv/mlp producers column-
        parallel, attn/mlp consumers row-parallel, modulation producers
        fsdp-only (tpdm_tpu.parallel.sharding regexes cover the Flux
        naming). 12B bf16 REQUIRES fsdp>=2 on 16GB chips.

        Also rebuilds the model with cfg.act_mesh=mesh: the activation
        anchors (models/flux.py _anchor) pin the modulation broadcasts and
        residual streams to batch-only sharding, killing the per-block
        involuntary reshard GSPMD otherwise inserts on tensor>1 meshes."""
        import dataclasses as _dc

        from tpdm_tpu.models.flux import Flux
        from tpdm_tpu.parallel.sharding import shard_params

        self.flux = Flux(_dc.replace(self.flux.config, act_mesh=mesh))
        self.flux_params = shard_params(self.flux_params, mesh)
        return self

    # -- reward-gradient fine-tuning hooks (train/draft.py) ---------------
    @property
    def backbone_params(self):
        """The frozen tree LoRA factors target (train/draft.py)."""
        return self.flux_params

    def denoise_builder(self, params, batch):
        """Family-agnostic DraftTrainer hook (see TPDMAgent): FLUX has no
        CFG batch-doubling — guidance is an embedded conditioning input."""
        txt = batch["prompt_embeds"]
        b, n_txt = txt.shape[:2]
        return make_flux_denoise_fn(
            lambda *a: self.flux.apply(params, *a),
            txt,
            jnp.zeros((b, n_txt, 3)),
            batch["pooled_prompt_embeds"],
            self.guidance,
            (self.latent_size, self.latent_size),
        )

    def init_tpm_params(self, key):
        fcfg = self.flux.config
        g = self.grid
        return self.tpm.init(
            key,
            jnp.zeros((1, 2 * fcfg.hidden_size, g, g)),
            jnp.zeros((1, fcfg.hidden_size)),
        )

    def tpm_fn(self, tpm_params):
        return lambda h, t: self.tpm.apply(tpm_params, h, t)

    def prepare_latents(self, key, batch_size):
        return jax.random.normal(
            key,
            (batch_size, self.latent_channels, self.latent_size, self.latent_size),
            self.flux.config.dtype,
        )

    def _sample(self, flux_params, tpm_params, latents, txt, txt_ids, pooled,
                key, step_caps, init_sigma, scfg):
        # backbone params as a jit ARGUMENT, not captured constants (see
        # TPDMAgent._sample)
        denoise_fn = make_flux_denoise_fn(
            lambda *a: self.flux.apply(flux_params, *a),
            txt,
            txt_ids,
            pooled,
            self.guidance,
            (self.latent_size, self.latent_size),
        )
        cached = None
        if scfg.cache_interval >= 2 or scfg.cache_tau > 0:
            # Δ-DiT-style residual caching (SamplerConfig.cache_interval);
            # serving-only — rollouts for RL keep exact forwards.
            from tpdm_tpu.pipeline.sampler import (
                CachedDenoise,
                cache_reuse_schedule,
            )

            mode_apply = lambda mode: (
                lambda tok, ii, tt, ti, sg, pl, g, d: self.flux.apply(
                    flux_params, tok, ii, tt, ti, sg, pl, g,
                    delta=d, cache_mode=mode,
                )
            )
            full_fn, reuse_fn = make_flux_denoise_cached_fns(
                mode_apply("record"), mode_apply("reuse"),
                txt, txt_ids, pooled, self.guidance,
                (self.latent_size, self.latent_size),
            )
            fcfg = self.flux.config
            cached = CachedDenoise(
                full_fn, reuse_fn,
                jnp.zeros(
                    (latents.shape[0], self.grid * self.grid, fcfg.hidden_size),
                    fcfg.dtype,
                ),
                cache_reuse_schedule(
                    scfg.max_inference_steps, scfg.cache_interval
                ),
                tau=scfg.cache_tau if scfg.cache_tau > 0 else None,
            )
            denoise_fn = None
        return adaptive_sample(
            denoise_fn, self.tpm_fn(tpm_params), latents, key, scfg,
            step_caps=step_caps, init_sigma=init_sigma, cached=cached,
        )

    def sample(
        self, tpm_params, batch, key, predict=False, sampler_cfg=None,
        step_caps=None,
    ) -> SampleOutput:
        """``batch`` may carry ``latents`` (explicit init) and ``init_sigma``
        ((b,) starting noise levels — the img2img entry, see
        pipeline.variants.FluxPipeline.generate(init_image=...))."""
        txt = batch["prompt_embeds"]  # (b, n_txt, txt_dim) — T5 features
        b, n_txt = txt.shape[:2]
        txt_ids = jnp.zeros((b, n_txt, 3))
        pooled = batch["pooled_prompt_embeds"]
        key_lat, key_roll = jax.random.split(key)
        latents = batch.get("latents")
        if latents is None:
            latents = self.prepare_latents(key_lat, b)
        scfg = sampler_cfg or dataclasses.replace(
            self.sampler_cfg, predict=predict
        )
        if step_caps is not None:
            step_caps = jnp.asarray(step_caps, jnp.int32)
        init_sigma = batch.get("init_sigma")
        if init_sigma is not None:
            init_sigma = jnp.asarray(init_sigma, jnp.float32)
        return self._sample_jit(
            self.flux_params, tpm_params, latents, txt, txt_ids, pooled,
            key_roll, step_caps, init_sigma, scfg=scfg,
        )

    def replay(self, tpm_params, outputs, inputs=None, backbone_params=None) -> jax.Array:
        return replay_logprobs(
            self.tpm_fn(tpm_params),
            outputs.h_cache,
            outputs.temb_cache,
            outputs.sigmas,
            self.sampler_cfg,
        )

    def logprobs(self, tpm_params, outputs) -> jax.Array:
        return self._replay_jit(tpm_params, outputs)

    def kl_divergence(self, outputs) -> jax.Array:
        return compute_beta_kl_penalty(
            outputs.alphas,
            outputs.betas,
            outputs.sigmas,
            outputs.prob_masks,
            relative=self.config.relative,
        )
