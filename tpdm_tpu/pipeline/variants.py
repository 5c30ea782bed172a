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

from tpdm_tpu.utils.image import postprocess_images, preprocess_images


_ENCODE_JITS: dict = {}


def encode_init_image(vae, vae_params, images: np.ndarray) -> jax.Array:
    """uint8 (b, H, W, 3) -> model-space latents (posterior mean, fp32).

    Shared img2img encode for the family pipelines: the inverse of their
    decode transform `z/scaling + shift` (same convention as
    TPDMPipeline.encode_image)."""
    cfg = vae.config
    fn = _ENCODE_JITS.get(id(vae))
    if fn is None:
        fn = jax.jit(lambda p, x: vae.apply(p, x, method="encode"))
        _ENCODE_JITS[id(vae)] = fn
    x = preprocess_images(np.asarray(images)).astype(cfg.dtype)
    mean, _ = fn(vae_params, x)
    return ((mean - cfg.shift_factor) * cfg.scaling_factor).astype(jnp.float32)


class VariantResult(NamedTuple):
    images: np.ndarray
    num_steps: int
    last_valid_index: np.ndarray
    schedule: np.ndarray  # times (SD1.5) or sigmas (FLUX), (b, T)


def _ddpm_img2img_batch(vae, vae_params, batch_size, init_image, strength,
                        seed, dtype):
    """Integer-t img2img prep shared by the epsilon-prediction families
    (SD1.5/SDXL): DDPM forward noising x_t = alpha_t*x0 + sigma_t*eps at
    t0 = round(strength*999). Returns {"latents", "init_t"}."""
    from tpdm_tpu.ops.dpm_solver import (
        ddpm_sigmas_from_betas,
        sigma_to_alpha_sigma_t,
    )

    if vae is None:
        raise ValueError("img2img needs a VAE on the pipeline")
    b = batch_size
    s0 = jnp.broadcast_to(jnp.asarray(strength, jnp.float32), (b,))
    if bool(jnp.any((s0 <= 0.0) | (s0 > 1.0))):
        raise ValueError(f"strength must be in (0, 1], got {strength}")
    clean = encode_init_image(vae, vae_params, init_image)
    if clean.shape[0] != b:
        raise ValueError(f"init_image batch {clean.shape[0]} != prompt batch {b}")
    t0 = jnp.round(s0 * 999.0).astype(jnp.int32)
    sig = ddpm_sigmas_from_betas()[t0]
    alpha_t, sigma_t = sigma_to_alpha_sigma_t(sig)
    key_lat, _ = jax.random.split(jax.random.PRNGKey(seed))
    eps = jax.random.normal(key_lat, clean.shape, dtype).astype(jnp.float32)
    a = alpha_t.reshape((b, 1, 1, 1))
    s = sigma_t.reshape((b, 1, 1, 1))
    return {"latents": (a * clean + s * eps).astype(dtype), "init_t": t0}


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
        init_image: Optional[np.ndarray] = None,
        strength: float = 0.6,
        cache_interval: int = 0,
        guidance_interval: Optional[tuple] = None,
        cache_tau: float = 0.0,
    ) -> VariantResult:
        """``guidance_interval`` = (t_lo, t_hi) applies CFG only while the
        integer timestep is inside the window (single-batch conditional
        forwards outside it — Kynkäänniemi et al. 2024).

        ``cache_interval`` >= 2 enables DeepCache-style deep-feature
        reuse (training-free acceleration, approximate — see
        UNetConfig.cache_shallow_levels); 0/1 = exact.

        ``init_image`` (uint8 (b,H,W,3)) switches to image-to-image in
        the integer-t flavor: DDPM forward noising
        x_t = alpha_t*x0 + sigma_t*eps at t0 = round(strength*999), and the
        adaptive DPM loop starts at t0 instead of 999. At strength=1.0 the
        schedule matches text-to-image (t0=999) while the init latents keep
        the standard DDPM alpha_999*x0 residual (~0.068) — the usual
        discrete-forward img2img semantics, not an exact t2i reduction
        (unlike the flow-matching families, where s=1 is exact)."""
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
        if init_image is not None:
            batch.update(
                _ddpm_img2img_batch(
                    self.vae, self.vae_params, prompt_embeds.shape[0],
                    init_image, strength, seed, self.agent.unet.config.dtype,
                )
            )
        if tpm_params is None:
            tpm_params = self.agent.init_tpm_params(jax.random.PRNGKey(0))
        out = self.agent.sample(
            tpm_params, batch, jax.random.PRNGKey(seed), predict=True,
            sampler_cfg=_cached_scfg(
                self.agent, cache_interval, guidance_interval, cache_tau
            ),
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


def _cached_scfg(agent, cache_interval: int, guidance_interval=None,
                 cache_tau: float = 0.0):
    """predict-mode sampler config with the acceleration knobs set, or
    None (= the agent's default) when none is on. ``cache_tau`` > 0 is
    the input-aware reuse policy (mutually exclusive with
    ``cache_interval``)."""
    if cache_tau and cache_interval >= 2:
        raise ValueError(
            "cache_tau (input-aware policy) and cache_interval (fixed "
            "schedule) are mutually exclusive"
        )
    if guidance_interval is not None:
        # cache_interval >= 2 composes (the agents build the combined
        # DeepCache × interval denoise pair)
        gs = agent.guidance_scale
        if gs is None or gs <= 1:
            raise ValueError(
                "guidance_interval requires classifier-free guidance "
                f"(agent guidance_scale={gs})"
            )
        guidance_interval = (
            float(guidance_interval[0]), float(guidance_interval[1])
        )
    if cache_interval < 2 and guidance_interval is None and not cache_tau:
        return None
    import dataclasses as _dc

    return _dc.replace(
        agent.sampler_cfg, predict=True, cache_activations=False,
        cache_interval=cache_interval, guidance_interval=guidance_interval,
        cache_tau=cache_tau,
    )


class SDXLPipeline:
    """SDXL adaptive generation: agent rollout (predict) + VAE decode.

    Beyond-reference family; same integer-t adaptive loop as SD15Pipeline
    with the SDXL conditioning surface (dual-CLIP embeds + pooled bigG +
    size/crop time_ids threaded through CFG).

    The VAE must be built with ``VAEConfig.sdxl()`` (scaling_factor
    0.13025) — the default VAEConfig is SD3's (1.5305, 0.0609) and
    ``sd15()`` is 0.18215; a real SDXL autoencoder under either decodes
    silently wrong.
    """

    def __init__(self, agent, vae=None, vae_params=None, text_encoders=None):
        self.agent = agent
        self.vae = vae
        self.vae_params = vae_params
        self.text_encoders = text_encoders  # SDXLTextEncoders or None
        self._decode = None
        if vae is not None:
            cfg = vae.config
            self._decode = jax.jit(
                lambda p, z: vae.apply(
                    p, z.astype(jnp.float32) / cfg.scaling_factor + cfg.shift_factor
                )
            )

    def _encode_ids(self, clip_ids):
        return self.text_encoders.encode(jnp.asarray(clip_ids))

    def _resolve_conditioning(
        self,
        prompt_embeds,
        pooled_prompt_embeds,
        negative_prompt_embeds,
        negative_pooled_prompt_embeds,
        clip_ids,
        negative_clip_ids,
        time_ids,
    ) -> dict:
        """Embeds-or-ids resolution + CFG validation shared by generate()
        and the refiner/ensemble entries. Returns the conditioning part of
        the agent batch."""
        if prompt_embeds is None:
            if self.text_encoders is None:
                raise ValueError("need prompt_embeds or text_encoders")
            prompt_embeds, pooled_prompt_embeds = self._encode_ids(clip_ids)
            if negative_clip_ids is not None:
                negative_prompt_embeds, negative_pooled_prompt_embeds = (
                    self._encode_ids(negative_clip_ids)
                )
        if pooled_prompt_embeds is None:
            raise ValueError(
                "SDXL conditioning needs pooled_prompt_embeds (the bigG "
                "projected EOS embedding) alongside prompt_embeds — "
                "precomputed embeds must come as the (prompt_embeds, "
                "pooled_prompt_embeds) pair"
            )
        gs = self.agent.guidance_scale
        if gs is not None and gs > 1 and (
            negative_prompt_embeds is None
            or negative_pooled_prompt_embeds is None
        ):
            raise ValueError(
                f"classifier-free guidance is on (guidance_scale={gs}); pass "
                "negative_prompt_embeds AND negative_pooled_prompt_embeds "
                "(or negative_clip_ids — diffusers encodes an empty prompt)"
            )
        batch = {
            "prompt_embeds": prompt_embeds,
            "pooled_prompt_embeds": pooled_prompt_embeds,
            "negative_prompt_embeds": negative_prompt_embeds,
            "negative_pooled_prompt_embeds": negative_pooled_prompt_embeds,
        }
        if time_ids is not None:
            batch["time_ids"] = jnp.asarray(time_ids, jnp.float32)
        return batch

    def _decode_result(self, out) -> VariantResult:
        if self._decode is not None:
            images = postprocess_images(
                self._decode(self.vae_params, out.final_latents)
            )
        else:
            images = np.asarray(out.final_latents)
        return VariantResult(
            images=images,
            num_steps=int(out.num_steps),
            last_valid_index=np.asarray(out.last_valid_index),
            schedule=np.asarray(out.times),
        )

    def generate(
        self,
        prompt_embeds: Optional[jax.Array] = None,  # (b, 77, 2048)
        pooled_prompt_embeds: Optional[jax.Array] = None,  # (b, 1280)
        negative_prompt_embeds: Optional[jax.Array] = None,
        negative_pooled_prompt_embeds: Optional[jax.Array] = None,
        clip_ids: Optional[np.ndarray] = None,
        negative_clip_ids: Optional[np.ndarray] = None,
        time_ids: Optional[np.ndarray] = None,
        seed: int = 0,
        tpm_params=None,
        init_image: Optional[np.ndarray] = None,
        strength: float = 0.6,
        cache_interval: int = 0,
        guidance_interval: Optional[tuple] = None,
        cache_tau: float = 0.0,
    ) -> VariantResult:
        """Pass either precomputed (prompt_embeds, pooled_prompt_embeds)
        [+ negatives under CFG] or token ids for the bundled dual-CLIP
        encoders. ``init_image`` switches to integer-t img2img (see
        SD15Pipeline.generate). ``cache_interval`` >= 2 enables
        DeepCache-style deep-feature reuse (training-free, approximate;
        SDXL's shallow level is attention-free, so reuse steps skip every
        transformer in the 2.6B UNet)."""
        batch = self._resolve_conditioning(
            prompt_embeds, pooled_prompt_embeds, negative_prompt_embeds,
            negative_pooled_prompt_embeds, clip_ids, negative_clip_ids,
            time_ids,
        )
        if init_image is not None:
            batch.update(
                _ddpm_img2img_batch(
                    self.vae, self.vae_params, batch["prompt_embeds"].shape[0],
                    init_image, strength, seed, self.agent.unet.config.dtype,
                )
            )
        if tpm_params is None:
            tpm_params = self.agent.init_tpm_params(jax.random.PRNGKey(0))
        out = self.agent.sample(
            tpm_params, batch, jax.random.PRNGKey(seed), predict=True,
            sampler_cfg=_cached_scfg(
                self.agent, cache_interval, guidance_interval, cache_tau
            ),
        )
        return self._decode_result(out)


class SDXLRefinerPipeline(SDXLPipeline):
    """SDXL refiner: adaptive refinement of the low-noise tail.

    Standalone surface for the second expert of SDXL's ensemble (diffusers
    StableDiffusionXLImg2ImgPipeline over the refiner UNet): pass either
    latents mid-denoise (``latents`` + per-sample ``init_t`` — the
    ensemble handoff, see sdxl_ensemble_generate) or a decoded image
    (``init_image`` + ``strength``, classic img2img refinement at low
    strength ~0.3). Conditioning is bigG-only — (b, 77, 1280) embeds or
    ``clip_g_ids`` through the bundled encoders' refiner path; the
    aesthetic-score micro-conditioning rides the agent's 5-column
    time_ids. Beyond-reference family. Same VAEConfig.sdxl() requirement
    as SDXLPipeline.
    """

    def _encode_ids(self, clip_g_ids):
        return self.text_encoders.encode_refiner(jnp.asarray(clip_g_ids))

    def generate(self, *a, **kw):
        raise NotImplementedError(
            "the refiner is not a text-to-image model — call refine() with "
            "latents (+init_t) or init_image, or run the full "
            "ensemble via sdxl_ensemble_generate(base, refiner, ...)"
        )

    def refine(
        self,
        latents: Optional[jax.Array] = None,  # (b, 4, h, w) mid-denoise
        init_t: Optional[np.ndarray] = None,  # (b,) int timesteps of latents
        init_image: Optional[np.ndarray] = None,  # uint8 (b, H, W, 3)
        strength: float = 0.3,
        prompt_embeds: Optional[jax.Array] = None,  # (b, 77, 1280)
        pooled_prompt_embeds: Optional[jax.Array] = None,  # (b, 1280)
        negative_prompt_embeds: Optional[jax.Array] = None,
        negative_pooled_prompt_embeds: Optional[jax.Array] = None,
        clip_g_ids: Optional[np.ndarray] = None,
        negative_clip_g_ids: Optional[np.ndarray] = None,
        time_ids: Optional[np.ndarray] = None,
        seed: int = 0,
        tpm_params=None,
    ) -> VariantResult:
        if (latents is None) == (init_image is None):
            raise ValueError(
                "pass exactly one of latents (+init_t, the ensemble "
                "handoff) or init_image (+strength, image refinement)"
            )
        if latents is not None and init_t is None:
            raise ValueError(
                "latents need their per-sample timesteps: pass init_t "
                "((b,) ints — e.g. the base stage's handoff times)"
            )
        batch = self._resolve_conditioning(
            prompt_embeds, pooled_prompt_embeds, negative_prompt_embeds,
            negative_pooled_prompt_embeds, clip_g_ids, negative_clip_g_ids,
            time_ids,
        )
        if latents is not None:
            batch["latents"] = jnp.asarray(
                latents, self.agent.unet.config.dtype
            )
            batch["init_t"] = jnp.asarray(init_t, jnp.int32)
        else:
            batch.update(
                _ddpm_img2img_batch(
                    self.vae, self.vae_params, batch["prompt_embeds"].shape[0],
                    init_image, strength, seed, self.agent.unet.config.dtype,
                )
            )
        if tpm_params is None:
            tpm_params = self.agent.init_tpm_params(jax.random.PRNGKey(0))
        out = self.agent.sample(
            tpm_params, batch, jax.random.PRNGKey(seed), predict=True
        )
        return self._decode_result(out)


class SDXLEnsembleResult(NamedTuple):
    images: np.ndarray
    num_steps: int  # total executed denoise steps (base + refiner)
    base_steps: int
    refiner_steps: int
    handoff_t: np.ndarray  # (b,) timesteps where the refiner took over
    base_schedule: np.ndarray  # (b, T_base+1) base-stage times
    refiner_schedule: np.ndarray  # (b, T_ref+1) refiner-stage times
    last_valid_index: np.ndarray  # refiner stage (-1 = base finished alone)


def sdxl_ensemble_generate(
    base: SDXLPipeline,
    refiner: SDXLRefinerPipeline,
    denoising_end: float = 0.8,
    seed: int = 0,
    tpm_params=None,
    refiner_tpm_params=None,
    clip_ids: Optional[np.ndarray] = None,
    negative_clip_ids: Optional[np.ndarray] = None,
    base_kwargs: Optional[dict] = None,
    refiner_kwargs: Optional[dict] = None,
) -> SDXLEnsembleResult:
    """SDXL ensemble-of-experts generation with BOTH stages adaptive.

    diffusers splits a fixed ladder at the discrete cutoff
    t_cut = round(999*(1 - denoising_end)): the base UNet denoises
    t >= t_cut, the refiner finishes t < t_cut. Here each stage instead
    runs its own TPM-scheduled adaptive loop: the base samples with
    min_time = t_cut (its policy self-terminates once it crosses the
    cutoff), and the refiner resumes from the base's ACTUAL per-sample
    handoff (latents + final times) via the integer-t img2img entry — so
    the handoff is exact, per-sample, and needs no shared ladder. A sample
    that hits the base's step cap integrates to x0 there (t=0) and the
    refiner passes it through untouched.

    Prompts: pass ``clip_ids``/``negative_clip_ids`` (both stages encode
    through their bundled towers — the base's dual-CLIP and the refiner's
    bigG-only path), or precomputed embeds via ``base_kwargs`` /
    ``refiner_kwargs`` (forwarded into SDXLPipeline._resolve_conditioning:
    prompt_embeds, pooled_prompt_embeds, negatives, time_ids).
    """
    import dataclasses

    if not 0.0 < denoising_end < 1.0:
        raise ValueError(f"denoising_end must be in (0, 1), got {denoising_end}")
    bcfg, rcfg = base.agent.unet.config, refiner.agent.unet.config
    if bcfg.sample_size != rcfg.sample_size:
        raise ValueError(
            f"base and refiner latent grids differ: {bcfg.sample_size} vs "
            f"{rcfg.sample_size}"
        )
    bk = dict(base_kwargs or {})
    rk = dict(refiner_kwargs or {})
    t_cut = int(round(999 * (1.0 - denoising_end)))

    batch = base._resolve_conditioning(
        bk.pop("prompt_embeds", None),
        bk.pop("pooled_prompt_embeds", None),
        bk.pop("negative_prompt_embeds", None),
        bk.pop("negative_pooled_prompt_embeds", None),
        clip_ids,
        negative_clip_ids,
        bk.pop("time_ids", None),
    )
    if bk:
        raise ValueError(f"unknown base_kwargs: {sorted(bk)}")
    if tpm_params is None:
        tpm_params = base.agent.init_tpm_params(jax.random.PRNGKey(0))
    scfg = dataclasses.replace(
        base.agent.sampler_cfg, predict=True, min_time=max(t_cut, 1)
    )
    out = base.agent.sample(
        tpm_params, batch, jax.random.PRNGKey(seed), sampler_cfg=scfg
    )
    b = np.asarray(out.last_valid_index).shape[0]
    times = np.asarray(out.times)
    # the handoff time of sample i is the t_next of its last valid step
    # (first value below the cutoff); -1 valid steps => still at init 999
    handoff_t = times[np.arange(b), np.asarray(out.last_valid_index) + 1]

    rbatch = refiner._resolve_conditioning(
        rk.pop("prompt_embeds", None),
        rk.pop("pooled_prompt_embeds", None),
        rk.pop("negative_prompt_embeds", None),
        rk.pop("negative_pooled_prompt_embeds", None),
        clip_ids,
        negative_clip_ids,
        rk.pop("time_ids", None),
    )
    if rk:
        raise ValueError(f"unknown refiner_kwargs: {sorted(rk)}")
    rbatch["latents"] = out.final_latents.astype(rcfg.dtype)
    rbatch["init_t"] = jnp.asarray(handoff_t, jnp.int32)
    if refiner_tpm_params is None:
        refiner_tpm_params = refiner.agent.init_tpm_params(jax.random.PRNGKey(0))
    rout = refiner.agent.sample(
        refiner_tpm_params, rbatch, jax.random.PRNGKey(seed + 1), predict=True
    )
    res = refiner._decode_result(rout)
    return SDXLEnsembleResult(
        images=res.images,
        num_steps=int(out.num_steps) + int(rout.num_steps),
        base_steps=int(out.num_steps),
        refiner_steps=int(rout.num_steps),
        handoff_t=handoff_t,
        base_schedule=times,
        refiner_schedule=np.asarray(rout.times),
        last_valid_index=np.asarray(rout.last_valid_index),
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
        init_image: Optional[np.ndarray] = None,
        strength: float = 0.6,
        cache_interval: int = 0,
        solver: str = "euler",
    ) -> VariantResult:
        """``init_image`` (uint8 (b,H,W,3)) switches to image-to-image:
        flow-matching forward noising to level ``strength``, adaptive loop
        from sigma = strength — same semantics as
        TPDMPipeline.generate(init_image=...) (FLUX is the same rectified-
        flow sigma space). strength=1.0 reduces to text-to-image.

        ``cache_interval`` >= 2 enables Δ-DiT-style residual block caching
        (training-free acceleration, approximate — see
        TPDMPipeline.generate); 0/1 = exact.

        ``solver`` = "euler" | "ab2": FLUX rides the shared adaptive loop,
        so the second-order AB2 integrator (SamplerConfig.solver) applies
        unchanged — exact second-order trajectories at identical cost."""
        batch = {
            "prompt_embeds": prompt_embeds,
            "pooled_prompt_embeds": pooled_prompt_embeds,
        }
        if init_image is not None:
            if self.vae is None:
                raise ValueError("img2img needs a VAE on the pipeline")
            b = prompt_embeds.shape[0]
            s0 = jnp.broadcast_to(jnp.asarray(strength, jnp.float32), (b,))
            if bool(jnp.any((s0 <= 0.0) | (s0 > 1.0))):
                raise ValueError(f"strength must be in (0, 1], got {strength}")
            clean = encode_init_image(self.vae, self.vae_params, init_image)
            if clean.shape[0] != b:
                raise ValueError(
                    f"init_image batch {clean.shape[0]} != prompt batch {b}"
                )
            if clean.shape[-1] != self.agent.latent_size:
                raise ValueError(
                    f"init_image encodes to latent {clean.shape[-1]}, agent "
                    f"serves {self.agent.latent_size}"
                )
            dtype = self.agent.flux.config.dtype
            # mirror the agent's own key split so strength=1.0 equals t2i
            key_lat, _ = jax.random.split(jax.random.PRNGKey(seed))
            eps = jax.random.normal(
                key_lat, clean.shape, dtype
            ).astype(jnp.float32)
            sb = s0.reshape((b, 1, 1, 1))
            batch["latents"] = ((1.0 - sb) * clean + sb * eps).astype(dtype)
            batch["init_sigma"] = s0
        if tpm_params is None:
            tpm_params = self.agent.init_tpm_params(jax.random.PRNGKey(0))
        sampler_cfg = None
        if cache_interval >= 2 or solver != "euler":
            import dataclasses as _dc

            sampler_cfg = _dc.replace(
                self.agent.sampler_cfg, predict=True,
                cache_activations=False, cache_interval=cache_interval,
                solver=solver,
            )
        out = self.agent.sample(
            tpm_params, batch, jax.random.PRNGKey(seed), predict=True,
            sampler_cfg=sampler_cfg,
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

    def generate_fixed(
        self,
        prompt_embeds: jax.Array,
        pooled_prompt_embeds: jax.Array,
        num_steps: int = 28,
        seed: int = 0,
        solver: str = "euler",
    ) -> np.ndarray:
        """Fixed-schedule FLUX baseline (no TPM) — the comparison point
        for the adaptive sampler, mirroring TPDMPipeline.generate_fixed.
        FLUX has no CFG batch-doubling (guidance is an embedded input).
        ``solver`` picks the integrator (pipeline/sampler.py FLOW_SOLVERS):
        euler / heun / midpoint / ab2."""
        from tpdm_tpu.ops.schedules import uniform_flow_sigmas
        from tpdm_tpu.pipeline.sampler import (
            FLOW_SOLVERS,
            fixed_schedule_sample_solver,
        )

        if solver not in FLOW_SOLVERS:
            raise ValueError(
                f"unknown solver {solver!r}; pick from {FLOW_SOLVERS}"
            )
        agent = self.agent
        if not hasattr(self, "_fixed_jits"):
            self._fixed_jits = {}
        sig = (num_steps, solver)
        if sig not in self._fixed_jits:
            from tpdm_tpu.train.flux_agent import make_flux_denoise_fn

            def go(flux_params, vae_params, latents, txt, pooled):
                dfn = make_flux_denoise_fn(
                    lambda *a: agent.flux.apply(flux_params, *a),
                    txt,
                    jnp.zeros(txt.shape[:2] + (3,)),
                    pooled,
                    agent.guidance,
                    (agent.latent_size, agent.latent_size),
                )
                vfn = lambda lat, s: dfn(lat, s)[0]
                final = fixed_schedule_sample_solver(
                    vfn, latents, uniform_flow_sigmas(num_steps), solver
                )
                if self.vae is None:
                    return final
                cfg = self.vae.config
                return self.vae.apply(
                    vae_params,
                    final.astype(jnp.float32) / cfg.scaling_factor
                    + cfg.shift_factor,
                )

            self._fixed_jits[sig] = jax.jit(go)
        latents = agent.prepare_latents(
            jax.random.PRNGKey(seed), prompt_embeds.shape[0]
        )
        out = self._fixed_jits[sig](
            agent.flux_params, self.vae_params, latents,
            jnp.asarray(prompt_embeds), jnp.asarray(pooled_prompt_embeds),
        )
        if self.vae is not None:
            return postprocess_images(out)
        return np.asarray(out)
