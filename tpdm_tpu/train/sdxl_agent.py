"""SDXL RL agent: frozen SDXL UNet + TPM over the DPM-Solver++ adaptive loop.

Beyond-reference model family (the reference ships SD3 + SD1.5 agents;
SDXL is the same epsilon-prediction / integer-timestep regime as SD1.5 —
reference: src/models/stable_diffusion_v1_5/modeling_sd_v1_5.py:925-1041 —
so the SD1.5 sampler, replay, and zero-KL semantics carry over verbatim).
What changes is the conditioning surface: dual CLIP towers (L + bigG
penultimate states concatenated to 2048) plus the "text_time" added
embedding (pooled bigG text + size/crop time_ids), all threaded through
classifier-free guidance.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpdm_tpu.models.tpm import TimePredictor
from tpdm_tpu.models.unet_sd15 import UNetSD15
from tpdm_tpu.pipeline.sd15_sampler import (
    SD15SampleOutput,
    sd15_adaptive_sample,
    sd15_replay_logprobs,
)
from tpdm_tpu.train.config import RLOOConfig
from tpdm_tpu.train.sd15_agent import SD15Agent


def make_sdxl_denoise_fn(
    unet_apply, prompt_embeds, added_cond, guidance_scale: Optional[float]
):
    """CFG wrapper over the SDXL UNet: combines noise_pred AND temb/h1/h2
    (same guidance-on-activations contract as make_sd15_denoise_fn;
    h_combined = concat([h1, h2], channel)). `prompt_embeds` and
    `added_cond` are pre-doubled [uncond; cond] when guidance is on."""

    def denoise_fn(latents, t):
        if guidance_scale is not None and guidance_scale > 1:
            lat = jnp.concatenate([latents, latents])
            tt = jnp.concatenate([t, t])
        else:
            lat, tt = latents, t
        eps, temb, h1, h2 = unet_apply(lat, tt, prompt_embeds, added_cond)
        if guidance_scale is not None and guidance_scale > 1:

            def guide(a):
                u, c = jnp.split(a, 2)
                return u + guidance_scale * (c - u)

            eps, temb, h1, h2 = guide(eps), guide(temb), guide(h1), guide(h2)
        return eps, temb, jnp.concatenate([h1, h2], axis=1)

    return denoise_fn


def make_sdxl_interval_denoise_fn(
    unet_apply, prompt_embeds, added_cond, guidance_scale, interval
):
    """Guidance-interval variant of :func:`make_sdxl_denoise_fn` (same
    integer-t window semantics as sd15_agent.make_sd15_interval_denoise_fn,
    threading the text_time added conditioning through both branches)."""
    from tpdm_tpu.pipeline.denoise import _interval_weight

    if guidance_scale is None or guidance_scale <= 1:
        raise ValueError("guidance interval requires CFG on")

    def denoise_fn(latents, t):
        b = latents.shape[0]
        n = prompt_embeds.shape[0] // 2

        def guided(latents, t):
            lat = jnp.concatenate([latents, latents])
            tt = jnp.concatenate([t, t])
            eps, temb, h1, h2 = unet_apply(lat, tt, prompt_embeds, added_cond)

            def guide(a):
                u, c = jnp.split(a, 2)
                w, _ = _interval_weight(t, guidance_scale, interval, u.dtype)
                w = w.reshape((-1,) + (1,) * (u.ndim - 1))
                return u + w * (c - u)

            return guide(eps), guide(temb), guide(h1), guide(h2)

        def cond_only(latents, t):
            cond_added = {k: v[v.shape[0] // 2:][:b] for k, v in added_cond.items()}
            return unet_apply(latents, t, prompt_embeds[n:][:b], cond_added)

        _, in_iv = _interval_weight(t, guidance_scale, interval, jnp.float32)
        eps, temb, h1, h2 = jax.lax.cond(
            jnp.any(in_iv), guided, cond_only, latents, t
        )
        return eps, temb, jnp.concatenate([h1, h2], axis=1)

    return denoise_fn


def make_sdxl_denoise_cached_fns(
    unet_apply_record, unet_apply_reuse, prompt_embeds, added_cond,
    guidance_scale: Optional[float],
):
    """DeepCache pair for SDXL (same contract as
    sd15_agent.make_sd15_denoise_cached_fns, threading the text_time added
    conditioning). With the (0, 2, 10) topology the shallow level is
    attention-free, so reuse steps skip EVERY transformer in the 2.6B
    UNet."""

    def make(apply_fn):
        def denoise_fn(latents, t, cache):
            if guidance_scale is not None and guidance_scale > 1:
                lat = jnp.concatenate([latents, latents])
                tt = jnp.concatenate([t, t])
            else:
                lat, tt = latents, t
            eps, temb, h1, h2, cache = apply_fn(
                lat, tt, prompt_embeds, added_cond, cache
            )
            if guidance_scale is not None and guidance_scale > 1:

                def guide(a):
                    u, c = jnp.split(a, 2)
                    return u + guidance_scale * (c - u)

                eps, temb, h1, h2 = guide(eps), guide(temb), guide(h1), guide(h2)
            return eps, temb, jnp.concatenate([h1, h2], axis=1), cache

        return denoise_fn

    return make(unet_apply_record), make(unet_apply_reuse)


def make_sdxl_interval_denoise_cached_fns(
    unet_apply_record, unet_apply_reuse, prompt_embeds, added_cond,
    guidance_scale, interval,
):
    """DeepCache × guidance interval for SDXL (integer-t window units):
    :func:`make_sdxl_denoise_cached_fns` composed with
    :func:`make_sdxl_interval_denoise_fn` semantics via the shared
    pipeline.denoise.make_interval_cached_denoise_pair core, threading the
    text_time added conditioning through both the guided and the
    conditional-only branches."""
    from tpdm_tpu.pipeline.denoise import (
        _interval_weight,
        make_interval_cached_denoise_pair,
    )

    if guidance_scale is None or guidance_scale <= 1:
        raise ValueError("guidance interval requires CFG on")
    n = prompt_embeds.shape[0] // 2

    def g_fwd(apply_fn):
        def run(latents, t, cache):
            lat = jnp.concatenate([latents, latents])
            tt = jnp.concatenate([t, t])
            eps, temb, h1, h2, c = apply_fn(
                lat, tt, prompt_embeds, added_cond, cache
            )
            return (eps, temb, h1, h2), c

        return run

    def c_fwd(apply_fn):
        def run(latents, t, cache):
            b = latents.shape[0]
            cond_added = {
                k: v[v.shape[0] // 2:][:b] for k, v in added_cond.items()
            }
            eps, temb, h1, h2, c = apply_fn(
                latents, t, prompt_embeds[n:][:b], cond_added, cache
            )
            return (eps, temb, h1, h2), c

        return run

    return make_interval_cached_denoise_pair(
        g_fwd(unet_apply_record), g_fwd(unet_apply_reuse),
        c_fwd(unet_apply_record), c_fwd(unet_apply_reuse),
        lambda t: _interval_weight(t, guidance_scale, interval, jnp.float32),
        lambda outs: (
            outs[0], outs[1], jnp.concatenate([outs[2], outs[3]], axis=1)
        ),
    )


class SDXLAgent(SD15Agent):
    """RLOOTrainer-compatible agent over the SDXL UNet.

    Inherits the SD1.5 integer-t machinery (init_tpm_params, prepare_latents,
    replay/logprobs, zero kl_divergence, mesh shard) — the TPM contract is
    identical (h = concat([h1, h2]) at 2*320 channels, pre-MLP 320-dim
    sinusoidal temb).
    """

    def __init__(
        self,
        unet: UNetSD15,
        unet_params,
        config: RLOOConfig,
        tpm: Optional[TimePredictor] = None,
        min_time: int = 10,
        guidance_scale: float = 5.0,
    ):
        if not unet.config.addition_embed:
            raise ValueError(
                "SDXLAgent needs a UNetConfig with addition_embed=True "
                "(UNetConfig.sdxl()/toy_xl()); use SD15Agent otherwise"
            )
        super().__init__(
            unet, unet_params, config, tpm=tpm, min_time=min_time,
            guidance_scale=guidance_scale,
        )

    def default_time_ids(self, batch_size: int) -> jax.Array:
        """[orig_h, orig_w, crop_top, crop_left, target_h, target_w] at the
        native resolution (diffusers SDXL _get_add_time_ids defaults)."""
        px = float(self.unet.config.sample_size * 8)
        row = jnp.asarray([px, px, 0.0, 0.0, px, px], jnp.float32)
        return jnp.broadcast_to(row, (batch_size, 6))

    def negative_time_ids(self, time_ids: jax.Array, batch=None) -> jax.Array:
        """The uncond half of the CFG-doubled time_ids. Base SDXL shares the
        size/crop ids between branches (diffusers _get_add_time_ids builds
        one row for both); the refiner subclass swaps the aesthetic-score
        column. An explicit batch["negative_time_ids"] always wins."""
        if batch is not None and batch.get("negative_time_ids") is not None:
            return jnp.asarray(batch["negative_time_ids"], jnp.float32)
        return time_ids

    def denoise_builder(self, params, batch):
        """(merged backbone params, collated batch arrays) -> denoise_fn
        whose first output is the EPS prediction — the DRaFT/DPO hook
        (Diffusion-DPO's own flagship setting is SDXL). Threads the
        text_time added conditioning (pooled bigG + size/crop time_ids)
        with the same CFG doubling as sample(); forward_noising and
        draft_step_builder are inherited from SD15Agent (same integer-t
        DDPM regime)."""
        pe = batch["prompt_embeds"]
        pooled = batch["pooled_prompt_embeds"]
        b = pe.shape[0]
        time_ids = batch.get("time_ids")
        if time_ids is None:
            time_ids = self.default_time_ids(b)
        time_ids = jnp.asarray(time_ids, jnp.float32)
        if self.guidance_scale is not None and self.guidance_scale > 1:
            pe = jnp.concatenate([batch["negative_prompt_embeds"], pe])
            pooled = jnp.concatenate(
                [batch["negative_pooled_prompt_embeds"], pooled]
            )
            time_ids = jnp.concatenate(
                [self.negative_time_ids(time_ids, batch), time_ids]
            )
        added = {"text_embeds": pooled, "time_ids": time_ids}
        return make_sdxl_denoise_fn(
            lambda *a: self.unet.apply(params, *a), pe, added,
            self.guidance_scale,
        )

    def _sample(self, unet_params, tpm_params, latents, cond, key, step_caps,
                init_t, scfg):
        prompt_embeds, added_cond = cond
        if scfg.guidance_interval is not None:
            denoise_fn = make_sdxl_interval_denoise_fn(
                lambda *a: self.unet.apply(unet_params, *a),
                prompt_embeds,
                added_cond,
                self.guidance_scale,
                scfg.guidance_interval,
            )
        else:
            denoise_fn = make_sdxl_denoise_fn(
                lambda *a: self.unet.apply(unet_params, *a),
                prompt_embeds,
                added_cond,
                self.guidance_scale,
            )
        cached = None
        if scfg.cache_interval >= 2:
            from tpdm_tpu.models.unet_sd15 import deepcache_feature_shape
            from tpdm_tpu.pipeline.sampler import (
                CachedDenoise,
                cache_reuse_schedule,
            )

            mode_apply = lambda mode: (
                lambda lat, tt, pe_, ac_, c: self.unet.apply(
                    unet_params, lat, tt, pe_, ac_, cache=c, cache_mode=mode
                )
            )
            cfg_on = self.guidance_scale is not None and self.guidance_scale > 1
            bb = latents.shape[0] * (2 if cfg_on else 1)
            ucfg = self.unet.config
            init_cache = jnp.zeros(
                deepcache_feature_shape(ucfg, bb, latents.shape[-2:]),
                ucfg.dtype,
            )
            if scfg.guidance_interval is not None:
                from tpdm_tpu.pipeline.denoise import (
                    interval_cached_init_delta,
                )

                full_fn, reuse_fn = make_sdxl_interval_denoise_cached_fns(
                    mode_apply("record"), mode_apply("reuse"), prompt_embeds,
                    added_cond, self.guidance_scale, scfg.guidance_interval,
                )
                init_cache = interval_cached_init_delta(init_cache)
            else:
                full_fn, reuse_fn = make_sdxl_denoise_cached_fns(
                    mode_apply("record"), mode_apply("reuse"), prompt_embeds,
                    added_cond, self.guidance_scale,
                )
            cached = CachedDenoise(
                full_fn, reuse_fn, init_cache,
                cache_reuse_schedule(
                    scfg.num_inference_steps, scfg.cache_interval
                ),
            )
            denoise_fn = None
        return sd15_adaptive_sample(
            denoise_fn, self.tpm_fn(tpm_params), latents, key, scfg,
            step_caps=step_caps, init_t=init_t, cached=cached,
        )

    def sample(
        self, tpm_params, batch, key, predict=False, sampler_cfg=None,
        step_caps=None,
    ) -> SD15SampleOutput:
        """``batch`` carries ``prompt_embeds`` (b, 77, 2048) and
        ``pooled_prompt_embeds`` (b, 1280); under CFG also the negative
        pair. Optional: ``time_ids`` (b, 6), ``latents``, ``init_t``."""
        pe = batch["prompt_embeds"]
        pooled = batch["pooled_prompt_embeds"]
        b = pe.shape[0]
        time_ids = batch.get("time_ids")
        if time_ids is None:
            time_ids = self.default_time_ids(b)
        time_ids = jnp.asarray(time_ids, jnp.float32)
        if self.guidance_scale is not None and self.guidance_scale > 1:
            if (
                batch.get("negative_prompt_embeds") is None
                or batch.get("negative_pooled_prompt_embeds") is None
            ):
                raise ValueError(
                    "classifier-free guidance is on (guidance_scale="
                    f"{self.guidance_scale}); pass negative_prompt_embeds "
                    "AND negative_pooled_prompt_embeds (encode an empty "
                    "prompt, as diffusers does)"
                )
            pe = jnp.concatenate([batch["negative_prompt_embeds"], pe])
            pooled = jnp.concatenate(
                [batch["negative_pooled_prompt_embeds"], pooled]
            )
            time_ids = jnp.concatenate(
                [self.negative_time_ids(time_ids, batch), time_ids]
            )
        added = {"text_embeds": pooled, "time_ids": time_ids}

        key_lat, key_roll = jax.random.split(key)
        latents = batch.get("latents")
        if latents is None:
            latents = self.prepare_latents(key_lat, b)
        import dataclasses

        scfg = sampler_cfg or dataclasses.replace(self.sampler_cfg, predict=predict)
        if step_caps is not None:
            step_caps = jnp.asarray(step_caps, jnp.int32)
        init_t = batch.get("init_t")
        if init_t is not None:
            init_t = jnp.asarray(init_t, jnp.int32)
        return self._sample_jit(
            self.unet_params, tpm_params, latents, (pe, added), key_roll,
            step_caps, init_t, scfg=scfg,
        )


class SDXLRefinerAgent(SDXLAgent):
    """RLOOTrainer-compatible agent over the SDXL REFINER UNet.

    The refiner (diffusers stable-diffusion-xl-refiner-1.0) is the second
    expert of SDXL's ensemble-of-experts: a 2.3B UNet specialized for the
    low-noise tail, conditioned on bigG-only text (b, 77, 1280) and FIVE
    time_ids whose last column is the micro-conditioning AESTHETIC SCORE —
    6.0 on the cond branch and 2.5 on the uncond branch by default
    (diffusers aesthetic_score/negative_aesthetic_score with
    requires_aesthetics_score=True). Everything else (integer-t adaptive
    loop, replay, zero KL, DRaFT/DPO hooks) is inherited.

    Use via pipeline.variants.SDXLRefinerPipeline (standalone img2img
    refinement) or sdxl_ensemble_generate (base handoff at denoising_end).
    """

    def __init__(
        self,
        unet: UNetSD15,
        unet_params,
        config: RLOOConfig,
        tpm: Optional[TimePredictor] = None,
        min_time: int = 10,
        guidance_scale: float = 5.0,
        aesthetic_score: float = 6.0,
        negative_aesthetic_score: float = 2.5,
    ):
        if unet.config.num_time_ids != 5:
            raise ValueError(
                "SDXLRefinerAgent needs a refiner-topology UNetConfig with "
                "num_time_ids=5 ([orig_h, orig_w, crop_top, crop_left, "
                f"aesthetic_score]); got num_time_ids="
                f"{unet.config.num_time_ids} — use UNetConfig.sdxl_refiner()"
                "/toy_refiner(), or SDXLAgent for the 6-id base model"
            )
        super().__init__(
            unet, unet_params, config, tpm=tpm, min_time=min_time,
            guidance_scale=guidance_scale,
        )
        self.aesthetic_score = float(aesthetic_score)
        self.negative_aesthetic_score = float(negative_aesthetic_score)

    def default_time_ids(self, batch_size: int) -> jax.Array:
        """[orig_h, orig_w, crop_top, crop_left, aesthetic_score] at the
        native resolution (diffusers StableDiffusionXLImg2ImgPipeline
        _get_add_time_ids with requires_aesthetics_score=True)."""
        px = float(self.unet.config.sample_size * 8)
        row = jnp.asarray(
            [px, px, 0.0, 0.0, self.aesthetic_score], jnp.float32
        )
        return jnp.broadcast_to(row, (batch_size, 5))

    def negative_time_ids(self, time_ids: jax.Array, batch=None) -> jax.Array:
        """Uncond rows swap the aesthetic column for
        negative_aesthetic_score — the branches genuinely differ on the
        refiner, unlike base SDXL."""
        if batch is not None and batch.get("negative_time_ids") is not None:
            return jnp.asarray(batch["negative_time_ids"], jnp.float32)
        return time_ids.at[:, -1].set(self.negative_aesthetic_score)


class EnsembleSampleOutput(NamedTuple):
    """Stitched rollout of the SDXL base+refiner ensemble.

    Per-step stats are the base stage's T_base columns followed by the
    refiner's T_ref — batch-major (b, T_base + T_ref) like every family's
    rollout, with unexecuted columns masked (prob_masks True) on BOTH
    sides of the handoff, so the trainer's masked reductions and the PPO
    summed-logprob objective work unchanged. The activation caches stay
    per-expert (the two UNets have different channel widths); replay runs
    each TPM over its own cache and concatenates."""

    final_latents: jax.Array  # refiner-stage finals (b, 4, h, w)
    times: jax.Array  # (b, T_base+T_ref+2): [base (T_base+1); ref (T_ref+1)]
    ratios: jax.Array  # (b, T_base+T_ref)
    logprobs: jax.Array
    prob_masks: jax.Array
    alphas: jax.Array
    betas: jax.Array
    num_steps: jax.Array  # scalar: executed loop iters, base + refiner
    last_valid_index: jax.Array  # (b,) total NFE - 1 across both experts
    handoff_t: jax.Array  # (b,) timestep the refiner resumed from
    h_cache: Optional[jax.Array]  # base (T_base, b, 2*C_b, gh, gw)
    temb_cache: Optional[jax.Array]  # base (T_base, b, temb_b)
    refiner_h_cache: Optional[jax.Array]  # (T_ref, b, 2*C_r, gh, gw)
    refiner_temb_cache: Optional[jax.Array]  # (T_ref, b, temb_r)


class SDXLEnsembleAgent:
    """Joint RL agent over BOTH experts of the SDXL ensemble.

    Beyond-reference: the reference trains one TPM per backbone; here the
    base and refiner TPMs train TOGETHER as one hierarchical policy — the
    episode is base steps (t >= t_cut, terminating at the denoising_end
    cutoff via min_time, cap landing exactly on the cutoff through
    SD15SamplerConfig.cap_floor_time) followed by refiner steps resuming
    from the base's exact per-sample handoff (latents + final t). The
    RLOO reward discounts over the TOTAL NFE, so the two policies learn
    to split the step budget across the cutoff, not just shrink their own
    stage. Implements the same trainer protocol as every family agent
    (sample / replay / logprobs / kl_divergence / init_tpm_params /
    shard); tpm_params is the pytree {"base": ..., "refiner": ...} and
    the optimizer updates both heads in one step.

    ``batch`` carries both experts' conditioning: the base's
    prompt_embeds / pooled_prompt_embeds (+ negative pair under CFG) plus
    refiner_prompt_embeds / refiner_pooled_prompt_embeds (bigG-only,
    + refiner_negative_* under CFG).
    """

    needs_inputs_for_replay = False

    def __init__(
        self,
        base: SDXLAgent,
        refiner: "SDXLRefinerAgent",
        denoising_end: float = 0.8,
    ):
        if not 0.0 < denoising_end < 1.0:
            raise ValueError(
                f"denoising_end must be in (0, 1), got {denoising_end}"
            )
        if base.unet.config.sample_size != refiner.unet.config.sample_size:
            raise ValueError(
                "ensemble experts must share the latent geometry: base "
                f"sample_size {base.unet.config.sample_size} != refiner "
                f"{refiner.unet.config.sample_size}"
            )
        self.base = base
        self.refiner = refiner
        self.config = base.config
        self.denoising_end = float(denoising_end)
        self.t_cut = int(round(999 * (1.0 - denoising_end)))
        # the base expert's loop: stochastic TPM decay down to the cutoff;
        # hitting the step cap lands exactly ON the cutoff (never x0), so
        # the refiner always receives real work
        self._base_scfg = dataclasses.replace(
            base.sampler_cfg,
            min_time=max(self.t_cut, 1),
            cap_floor_time=max(self.t_cut - 1, 0),
        )
        self._replay_jit = jax.jit(self.replay)

    # expert step budgets are static (jit shapes)
    @property
    def base_steps(self) -> int:
        return self._base_scfg.num_inference_steps

    @property
    def sampler_cfg(self):
        """Eval-callback compatibility (train/callbacks.py overrides
        fields on this): the BASE stage's config — per-stage overrides go
        through the member agents."""
        return self._base_scfg

    def shard(self, mesh):
        self.base.shard(mesh)
        self.refiner.shard(mesh)
        return self

    def init_tpm_params(self, key: jax.Array):
        kb, kr = jax.random.split(key)
        return {
            "base": self.base.init_tpm_params(kb),
            "refiner": self.refiner.init_tpm_params(kr),
        }

    def replay_backbone_params(self):
        return None

    @staticmethod
    def _refiner_batch_view(batch) -> dict:
        out = {"prompt_embeds": batch["refiner_prompt_embeds"],
               "pooled_prompt_embeds": batch["refiner_pooled_prompt_embeds"]}
        for src, dst in (
            ("refiner_negative_prompt_embeds", "negative_prompt_embeds"),
            (
                "refiner_negative_pooled_prompt_embeds",
                "negative_pooled_prompt_embeds",
            ),
            ("refiner_time_ids", "time_ids"),
            ("refiner_negative_time_ids", "negative_time_ids"),
        ):
            if batch.get(src) is not None:
                out[dst] = batch[src]
        return out

    def sample(
        self, tpm_params, batch, key, predict=False, sampler_cfg=None,
        step_caps=None,
    ) -> EnsembleSampleOutput:
        """Roll out base-then-refiner. ``step_caps`` bounds the TOTAL NFE
        with the same split as serving (serving_families
        make_sdxl_ensemble_runner): the base gets
        clip(round(cap*denoising_end), 1, cap-1), the refiner the rest."""
        if sampler_cfg is not None:
            raise ValueError(
                "SDXLEnsembleAgent stages own their sampler configs "
                "(base min_time/cap_floor_time pin the handoff); replace "
                "base.sampler_cfg / refiner.sampler_cfg instead"
            )
        kb, kr = jax.random.split(key)
        base_caps = ref_caps = None
        if step_caps is not None:
            caps = jnp.asarray(step_caps, jnp.int32)
            base_caps = jnp.clip(
                jnp.round(caps * self.denoising_end).astype(jnp.int32),
                1,
                jnp.maximum(caps - 1, 1),
            )
            ref_caps = jnp.maximum(caps - base_caps, 1)

        scfg = dataclasses.replace(self._base_scfg, predict=predict)
        out = self.base.sample(
            tpm_params["base"], batch, kb, sampler_cfg=scfg,
            step_caps=base_caps,
        )
        # handoff: the t_next of each sample's last valid step (first
        # value below the cutoff — pipeline/variants.py
        # sdxl_ensemble_generate:443-447, kept on-device here)
        handoff_t = jnp.take_along_axis(
            out.times, (out.last_valid_index + 1)[:, None], axis=1
        )[:, 0]

        rbatch = self._refiner_batch_view(batch)
        rbatch["latents"] = out.final_latents.astype(
            self.refiner.unet.config.dtype
        )
        rbatch["init_t"] = handoff_t
        rout = self.refiner.sample(
            tpm_params["refiner"], rbatch, kr, predict=predict,
            step_caps=ref_caps,
        )

        cat = lambda a, b: jnp.concatenate([a, b], axis=1)
        return EnsembleSampleOutput(
            final_latents=rout.final_latents,
            times=cat(out.times, rout.times),
            ratios=cat(out.ratios, rout.ratios),
            logprobs=cat(out.logprobs, rout.logprobs),
            prob_masks=cat(out.prob_masks, rout.prob_masks),
            alphas=cat(out.alphas, rout.alphas),
            betas=cat(out.betas, rout.betas),
            num_steps=out.num_steps + rout.num_steps,
            last_valid_index=(
                out.last_valid_index + rout.last_valid_index + 1
            ),
            handoff_t=handoff_t,
            h_cache=out.h_cache,
            temb_cache=out.temb_cache,
            refiner_h_cache=rout.h_cache,
            refiner_temb_cache=rout.temb_cache,
        )

    def replay(
        self, tpm_params, outputs: EnsembleSampleOutput, inputs=None,
        backbone_params=None,
    ) -> jax.Array:
        """Differentiable logprobs of the stitched episode: each TPM
        replays its own stage's cached activations; gradients reach both
        heads through the concatenated (b, T_base+T_ref) result."""
        tb = self.base_steps
        lp_base = sd15_replay_logprobs(
            self.base.tpm_fn(tpm_params["base"]),
            outputs.h_cache,
            outputs.temb_cache,
            outputs.ratios[:, :tb],
            outputs.prob_masks[:, :tb],
            self.base.sampler_cfg,
        )
        lp_ref = sd15_replay_logprobs(
            self.refiner.tpm_fn(tpm_params["refiner"]),
            outputs.refiner_h_cache,
            outputs.refiner_temb_cache,
            outputs.ratios[:, tb:],
            outputs.prob_masks[:, tb:],
            self.refiner.sampler_cfg,
        )
        return jnp.concatenate([lp_base, lp_ref], axis=1)

    def logprobs(self, tpm_params, outputs: EnsembleSampleOutput) -> jax.Array:
        return self._replay_jit(tpm_params, outputs)

    def kl_divergence(self, outputs: EnsembleSampleOutput) -> jax.Array:
        """Zero on both stages (the eps-family zero-KL semantics,
        modeling_sd_v1_5.py:1005-1009, applies to each expert)."""
        return jnp.zeros_like(outputs.logprobs)
