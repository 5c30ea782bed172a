"""TPDMPipeline: the end-to-end adaptive-schedule generation pipeline.

The user-facing analogue of the reference `SD3PredictNextTimeStepModel`
(reference: src/models/stable_diffusion_3/modeling_sd3_pnt.py:129-668) and
the gradio/notebook inference path (gradio_sd3_inference.py:18-50): owns
MMDiT + TPM + VAE (+ optional text encoders), runs the jitted adaptive
sampler, decodes only the last valid latent per sample (or the full
history), and returns uint8 images plus the schedule record.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpdm_tpu.models.mmdit import MMDiT, MMDiTConfig
from tpdm_tpu.models.tpm import TimePredictor
from tpdm_tpu.models.vae import VAE, VAEConfig
from tpdm_tpu.pipeline.denoise import make_cfg_denoise_fn, make_cfg_velocity_fn
from tpdm_tpu.pipeline.sampler import (
    SampleOutput,
    SamplerConfig,
    adaptive_sample,
    fixed_schedule_sample,
    fixed_schedule_sample_solver,
)
from tpdm_tpu.ops.schedules import uniform_flow_sigmas
from tpdm_tpu.utils.image import postprocess_images, preprocess_images


class GenerationResult(NamedTuple):
    images: np.ndarray  # (b, H, W, 3) uint8 — last valid image per sample
    num_steps: int  # loop iterations executed
    sigmas: np.ndarray  # (b, T)
    alphas: np.ndarray
    betas: np.ndarray
    prob_masks: np.ndarray
    last_valid_index: np.ndarray  # (b,) per-sample NFE - 1
    history_images: Optional[np.ndarray]  # (T, b, H, W, 3) when requested


class TPDMPipeline:
    """Adaptive-schedule SD3 generation.

    Args:
        mmdit / mmdit_params: the denoiser.
        tpm / tpm_params: the time-prediction policy.
        vae / vae_params: decoder (optional — latents returned raw if absent).
        text_encoders: optional SD3TextEncoders for prompt -> embeds.
        min_sigma: stop threshold (0.001 inference default,
            modeling_sd3_pnt.py:134).
    """

    def __init__(
        self,
        mmdit: MMDiT,
        mmdit_params,
        tpm: TimePredictor,
        tpm_params,
        vae: Optional[VAE] = None,
        vae_params=None,
        text_encoders=None,
        min_sigma: float = 0.001,
        relative: bool = True,
        prediction_type: str = "alpha_beta",
    ):
        self.mmdit = mmdit
        self.mmdit_params = mmdit_params
        self.tpm = tpm
        self.tpm_params = tpm_params
        self.vae = vae
        self.vae_params = vae_params
        self.text_encoders = text_encoders
        self.min_sigma = min_sigma
        self.relative = relative
        self.prediction_type = prediction_type
        mcfg = mmdit.config
        self.token_grid = mcfg.sample_size // mcfg.patch_size
        self._jit_cache: dict = {}
        self._decode_jit = None
        self._encode_jit = None

    # -- internals -------------------------------------------------------
    def _decode_impl(self, vae_params, latents: jax.Array) -> jax.Array:
        cfg = self.vae.config
        z = latents.astype(jnp.float32) / cfg.scaling_factor + cfg.shift_factor
        return self.vae.apply(vae_params, z)

    def _decode(self, latents: jax.Array) -> jax.Array:
        if self._decode_jit is None:
            self._decode_jit = jax.jit(self._decode_impl)
        return self._decode_jit(self.vae_params, latents)

    def encode_image(
        self,
        images: np.ndarray,
        key: Optional[jax.Array] = None,
        sample_posterior: bool = False,
    ) -> jax.Array:
        """uint8 (b, H, W, 3) -> model-space latents (b, c, H/8, W/8).

        The inverse of the decode transform (`z/scaling + shift`,
        modeling_sd3_pnt.py:631): posterior mean (or a sample when
        ``sample_posterior`` and ``key`` are given), then
        ``(z - shift_factor) * scaling_factor``. The image-to-image entry —
        the reference ships the VAE encoder but never exposes an img2img
        path; this is the flow-matching SDEdit extension.
        """
        if self.vae is None:
            raise ValueError("pipeline has no VAE; cannot encode images")
        if self._encode_jit is None:

            def enc(vae_params, x, eps):
                mean, logvar = self.vae.apply(vae_params, x, method="encode")
                z = mean if eps is None else mean + jnp.exp(0.5 * logvar) * eps
                cfg = self.vae.config
                return (z - cfg.shift_factor) * cfg.scaling_factor

            self._encode_jit = jax.jit(enc, static_argnums=())
        from tpdm_tpu.models.vae import vae_scale_factor

        x = preprocess_images(np.asarray(images)).astype(self.vae.config.dtype)
        eps = None
        if sample_posterior:
            if key is None:
                raise ValueError("sample_posterior=True needs a key")
            f = vae_scale_factor(self.vae.config)
            lat = (x.shape[0], self.vae.config.latent_channels,
                   x.shape[2] // f, x.shape[3] // f)
            eps = jax.random.normal(key, lat, jnp.float32)
        return self._encode_jit(self.vae_params, x, eps)

    def _run(
        self, key, latents, pe, pp, guidance_scale, scfg: SamplerConfig,
        decode: bool = True, step_caps=None, init_sigma=None, proj_args=None,
    ):
        # caps, init_sigma and guidance are traced (b,) arguments, NOT part
        # of the cache signature: one compiled shape serves every
        # per-request step-cap / img2img-strength / guidance-strength mix
        # (only CFG on/off is structural — it changes the embed geometry).
        # proj_args (inpainting: the (x0, eps, mask) triple the per-step
        # projection needs) are traced too — only their PRESENCE keys the
        # cache.
        if step_caps is None:
            step_caps = jnp.full(
                (latents.shape[0],), scfg.max_inference_steps, jnp.int32
            )
        if init_sigma is None:
            init_sigma = jnp.ones((latents.shape[0],), jnp.float32)
        if guidance_scale is not None:
            guidance_scale = jnp.broadcast_to(
                jnp.asarray(guidance_scale, jnp.float32).reshape(-1),
                (latents.shape[0],),
            )
        sig = (guidance_scale is not None, scfg, decode,
               proj_args is not None)
        if sig not in self._jit_cache:
            cfg_on = guidance_scale is not None

            def go(mmdit_params, tpm_params, vae_params, latents, pe, pp, key,
                   caps, sigma0, gs, proj):
                # grid follows the RUNTIME latent size (jit retraces per
                # shape): non-default and rectangular serving resolutions
                # ride the same code path as the config size
                p = self.mmdit.config.patch_size
                grid = (latents.shape[-2] // p, latents.shape[-1] // p)
                if scfg.guidance_interval is not None and cfg_on:
                    # CFG only inside the sigma window; a single-batch
                    # conditional-only forward once the batch leaves it
                    from tpdm_tpu.pipeline.denoise import (
                        make_cfg_interval_denoise_fn,
                    )

                    denoise_fn = make_cfg_interval_denoise_fn(
                        lambda *a: self.mmdit.apply(mmdit_params, *a),
                        pe, pp, gs, scfg.guidance_interval, grid, p,
                    )
                else:
                    denoise_fn = make_cfg_denoise_fn(
                        lambda *a: self.mmdit.apply(mmdit_params, *a),
                        pe,
                        pp,
                        gs if cfg_on else None,
                        grid,
                        p,
                    )
                cached = None
                if scfg.cache_interval >= 2 or scfg.cache_tau > 0:
                    # Δ-DiT-style residual caching: reuse the back-block
                    # residual between refresh steps (approximate; see
                    # SamplerConfig.cache_interval). cache_tau > 0 swaps
                    # the fixed schedule for the input-aware on-device
                    # policy (SamplerConfig.cache_tau) over the SAME
                    # full/reuse pair.
                    from tpdm_tpu.pipeline.denoise import (
                        make_cfg_denoise_cached_fns,
                    )
                    from tpdm_tpu.pipeline.sampler import (
                        CachedDenoise,
                        cache_reuse_schedule,
                    )

                    mode_apply = lambda mode: (
                        lambda lat, t, pe_, pp_, d: self.mmdit.apply(
                            mmdit_params, lat, t, pe_, pp_,
                            delta=d, cache_mode=mode,
                        )
                    )
                    mcfg = self.mmdit.config
                    bb = latents.shape[0] * (2 if cfg_on else 1)
                    init_delta = jnp.zeros(
                        (bb, grid[0] * grid[1], mcfg.inner_dim), mcfg.dtype
                    )
                    if scfg.guidance_interval is not None and cfg_on:
                        # composed accelerations: Δ-cache × guidance
                        # interval (single-batch cond-only forwards outside
                        # the window, shallow blocks only on reuse steps)
                        from tpdm_tpu.pipeline.denoise import (
                            interval_cached_init_delta,
                            make_cfg_interval_denoise_cached_fns,
                        )

                        full_fn, reuse_fn = make_cfg_interval_denoise_cached_fns(
                            mode_apply("record"), mode_apply("reuse"),
                            pe, pp, gs, scfg.guidance_interval, grid, p,
                        )
                        init_delta = interval_cached_init_delta(init_delta)
                    else:
                        full_fn, reuse_fn = make_cfg_denoise_cached_fns(
                            mode_apply("record"), mode_apply("reuse"),
                            pe, pp, gs if cfg_on else None, grid, p,
                        )
                    cached = CachedDenoise(
                        full_fn, reuse_fn, init_delta,
                        cache_reuse_schedule(
                            scfg.max_inference_steps, scfg.cache_interval
                        ),
                        tau=scfg.cache_tau if scfg.cache_tau > 0 else None,
                    )
                project_fn = None
                if proj is not None:
                    x0, eps, m = proj  # fp32 latents; m (b,1,lh,lw) in [0,1]

                    def project_fn(lat, sig_next):
                        # re-impose the known region at the step's new noise
                        # level (RePaint/diffusers-legacy style, fixed eps)
                        sb = sig_next.reshape((-1, 1, 1, 1))
                        known = (1.0 - sb) * x0 + sb * eps
                        mixed = m * lat.astype(jnp.float32) + (1.0 - m) * known
                        return mixed.astype(lat.dtype)

                out = adaptive_sample(
                    denoise_fn,
                    lambda h, t: self.tpm.apply(tpm_params, h, t),
                    latents,
                    key,
                    scfg,
                    step_caps=caps,
                    init_sigma=sigma0,
                    project_fn=project_fn,
                    cached=cached,
                )
                final = out.final_latents
                if proj is not None:
                    # exact composite: the kept region IS the init image's
                    # latents in the output, regardless of where each
                    # sample's adaptive schedule stopped
                    x0, _, m = proj
                    final = (
                        m * final.astype(jnp.float32) + (1.0 - m) * x0
                    ).astype(final.dtype)
                    out = out._replace(final_latents=final)
                if decode and self.vae is not None:
                    decoded = self._decode_impl(vae_params, final)
                else:
                    decoded = final
                return out, decoded

            self._jit_cache[sig] = jax.jit(go, static_argnums=())
        gs_arg = (
            guidance_scale if guidance_scale is not None
            else jnp.zeros((latents.shape[0],), jnp.float32)  # unused
        )
        return self._jit_cache[sig](
            self.mmdit_params, self.tpm_params, self.vae_params, latents, pe, pp,
            key, step_caps, init_sigma, gs_arg, proj_args,
        )

    # -- public API ------------------------------------------------------
    def generate(
        self,
        prompt_embeds: Optional[jax.Array] = None,
        pooled_prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        negative_pooled_prompt_embeds: Optional[jax.Array] = None,
        clip_ids: Optional[np.ndarray] = None,
        t5_ids: Optional[np.ndarray] = None,
        negative_clip_ids: Optional[np.ndarray] = None,
        negative_t5_ids: Optional[np.ndarray] = None,
        latents: Optional[jax.Array] = None,
        max_inference_steps: int = 28,
        guidance_scale: Optional[float] = 7.0,
        predict: bool = True,
        seed: int = 0,
        return_full_process_images: bool = False,
        decode: bool = True,
        step_caps=None,
        init_image: Optional[np.ndarray] = None,
        strength: float = 0.6,
        mask: Optional[np.ndarray] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        init_sigma: Optional[jax.Array] = None,
        cache_interval: int = 0,
        guidance_interval: Optional[tuple] = None,
        cache_tau: float = 0.0,
        solver: str = "euler",
    ) -> GenerationResult:
        """Generate images with a per-prompt adaptive schedule.

        Supply either precomputed embeds (pre_process mode) or token ids
        (requires text_encoders). Defaults mirror the gradio demo
        (predict=True deterministic schedules, gradio_sd3_inference.py:41-47).

        ``decode=False`` skips the in-graph VAE decode and returns raw final
        latents in ``images`` — for callers that decode separately (e.g. the
        serving engine's split-stage timing mode).

        ``step_caps`` (optional (b,) ints) caps each sample's NFE
        individually without recompiling — the serving per-request
        quality/latency knob (the batch still runs to the max cap).

        ``guidance_scale`` may be a scalar (one CFG strength for the
        batch) or a (b,) array of PER-SAMPLE strengths; either way it is
        a traced argument, so any mix of strengths shares one compiled
        program (1.0 = conditional-only arithmetic while still paying the
        CFG double forward). Only ``None`` — CFG structurally off, single
        forward — changes the compiled program.

        ``init_image`` (uint8 (b, H, W, 3)) switches to image-to-image:
        the image is VAE-encoded and noised to level ``strength`` via the
        flow-matching forward ``(1-s)*x0 + s*eps``, and the adaptive loop
        starts at sigma = strength instead of 1.0 (SDEdit). ``strength`` may
        be a scalar or a per-sample sequence; 1.0 reduces exactly to
        text-to-image with the same seed. Beyond-reference capability (the
        reference ships the VAE encoder unused).

        ``height``/``width`` (pixels, each divisible by the VAE factor x
        patch size = 16 for SD3) select a non-default — including
        rectangular — output size; the pos-embed table is center-cropped
        (or regenerated past its stored 96x96 grid) to the runtime token
        grid, one compiled program per shape. Default: the square config
        size. Ignored when ``latents`` or ``init_image`` fix the geometry.

        ``init_sigma`` (advanced, (b,) floats) sets per-sample starting
        noise levels for caller-prepared ``latents`` — the serving engine
        uses this to mix img2img and text-to-image requests in ONE batch
        (t2i slots carry sigma 1.0). Mutually exclusive with ``init_image``
        (which derives it from ``strength``).

        ``mask`` (with ``init_image``) switches to inpainting: (b, H, W) or
        (b, 1, H, W) floats/bools in pixel space, 1 = regenerate, 0 = keep.
        Downsampled (area mean) to the latent grid; after every adaptive
        step the kept region is re-imposed at the step's noise level
        (``(1-sigma)*x0 + sigma*eps``, fixed eps — diffusers-legacy/RePaint
        convention), and the final latents composite the init image's
        latents exactly where mask = 0. Soft (fractional) masks blend.
        Typical use: ``strength=1.0`` so masked regions start from pure
        noise. Beyond-reference capability.

        ``cache_interval`` >= 2 turns on Δ-DiT-style residual block caching
        (training-free acceleration, approximate): the back block group's
        residual is refreshed every ``cache_interval`` steps and reused in
        between, so reuse steps run only ``MMDiTConfig.cache_front_blocks``
        of the network. 0/1 = off (exact). Beyond-reference capability.

        ``solver`` picks the latent integrator for the adaptive loop:
        "euler" (the reference's rule) or "ab2" (two-step Adams–Bashforth
        — second-order trajectory accuracy at IDENTICAL per-step cost;
        see SamplerConfig.solver). Beyond-reference capability.
        """
        if prompt_embeds is None:
            if self.text_encoders is None or clip_ids is None:
                raise ValueError("need prompt_embeds or (text_encoders + ids)")
            pe = self.text_encoders.encode(clip_ids, t5_ids)
            prompt_embeds, pooled_prompt_embeds = pe
            if guidance_scale is not None:
                if negative_clip_ids is None:
                    raise ValueError("CFG needs negative ids (or embeds)")
                ne = self.text_encoders.encode(negative_clip_ids, negative_t5_ids)
                negative_prompt_embeds, negative_pooled_prompt_embeds = ne

        b = prompt_embeds.shape[0]
        if guidance_scale is not None:
            if negative_prompt_embeds is None or negative_pooled_prompt_embeds is None:
                raise ValueError(
                    "classifier-free guidance is on (guidance_scale="
                    f"{guidance_scale}); pass negative_prompt_embeds + "
                    "negative_pooled_prompt_embeds (or guidance_scale=None)"
                )
            pe = jnp.concatenate([negative_prompt_embeds, prompt_embeds])
            pp = jnp.concatenate(
                [negative_pooled_prompt_embeds, pooled_prompt_embeds]
            )
        else:
            pe, pp = prompt_embeds, pooled_prompt_embeds

        mcfg = self.mmdit.config
        key = jax.random.PRNGKey(seed)
        key_lat, key_roll = jax.random.split(key)
        if mask is not None and init_image is None:
            raise ValueError("mask (inpainting) requires init_image")
        proj_args = None
        if init_image is not None:
            if latents is not None:
                raise ValueError("pass init_image or latents, not both")
            if init_sigma is not None:
                raise ValueError(
                    "init_sigma is derived from strength when init_image "
                    "is given; pass one or the other"
                )
            s0 = jnp.broadcast_to(
                jnp.asarray(strength, jnp.float32), (b,)
            )
            if bool(jnp.any((s0 <= 0.0) | (s0 > 1.0))):
                raise ValueError(
                    f"strength must be in (0, 1], got {strength}"
                )
            clean = self.encode_image(init_image).astype(jnp.float32)
            if clean.shape[0] != b:
                raise ValueError(
                    f"init_image batch {clean.shape[0]} != prompt batch {b}"
                )
            # draw in model dtype so strength=1.0 reproduces the
            # text-to-image draw bit-for-bit, then mix in fp32
            eps = jax.random.normal(
                key_lat, clean.shape, mcfg.dtype
            ).astype(jnp.float32)
            sb = s0.reshape((b, 1, 1, 1))
            latents = ((1.0 - sb) * clean + sb * eps).astype(mcfg.dtype)
            init_sigma = s0
            if mask is not None:
                m = jnp.asarray(mask, jnp.float32)
                if m.ndim == 3:
                    m = m[:, None]
                if m.ndim != 4 or m.shape[0] != b or m.shape[1] != 1:
                    raise ValueError(
                        "mask must be (b, H, W) or (b, 1, H, W); got "
                        f"{np.shape(mask)}"
                    )
                if m.shape[-2:] != init_image.shape[1:3]:
                    raise ValueError(
                        f"mask is {m.shape[-2]}x{m.shape[-1]}, init_image "
                        f"is {init_image.shape[1]}x{init_image.shape[2]}"
                    )
                # area-mean downsample to the latent grid: a pixel-space
                # boundary becomes a soft one-latent seam, which the
                # projection blends instead of hard-clipping
                m_lat = jax.image.resize(
                    m, (b, 1) + clean.shape[-2:], method="linear"
                )
                m_lat = jnp.clip(m_lat, 0.0, 1.0)
                proj_args = (clean, eps, m_lat)
        if latents is None:
            lh = lw = mcfg.sample_size
            if height is not None or width is not None:
                from tpdm_tpu.models.vae import vae_scale_factor

                f = vae_scale_factor(self.vae.config) if self.vae else 8
                fp = f * mcfg.patch_size
                h_px = height if height is not None else width
                w_px = width if width is not None else height
                if h_px % fp or w_px % fp:
                    raise ValueError(
                        f"height/width must be divisible by {fp} "
                        f"(VAE factor {f} x patch {mcfg.patch_size}); got "
                        f"{h_px}x{w_px}"
                    )
                lh, lw = h_px // f, w_px // f
            latents = jax.random.normal(
                key_lat,
                (b, mcfg.in_channels, lh, lw),
                mcfg.dtype,
            )

        if guidance_interval is not None:
            if guidance_scale is None:
                raise ValueError(
                    "guidance_interval requires classifier-free guidance "
                    "(guidance_scale is None)"
                )
            # cache_interval >= 2 composes with the interval (the builders
            # in pipeline.denoise handle the uncond-cache validity rule)
            guidance_interval = (
                float(guidance_interval[0]), float(guidance_interval[1])
            )
        if cache_tau and cache_interval >= 2:
            raise ValueError(
                "cache_tau (input-aware policy) and cache_interval (fixed "
                "schedule) are mutually exclusive — pick one reuse policy"
            )
        scfg = SamplerConfig(
            max_inference_steps=max_inference_steps,
            min_sigma=self.min_sigma,
            relative=self.relative,
            prediction_type=self.prediction_type,
            predict=predict,
            cache_activations=False,
            keep_history=return_full_process_images,
            cache_interval=cache_interval,
            guidance_interval=guidance_interval,
            cache_tau=cache_tau,
            solver=solver,
        )
        out, decoded = self._run(
            key_roll, latents, pe, pp, guidance_scale, scfg, decode=decode,
            step_caps=None if step_caps is None else jnp.asarray(step_caps),
            init_sigma=None if init_sigma is None
            else jnp.asarray(init_sigma, jnp.float32),
            proj_args=proj_args,
        )

        history = None
        if return_full_process_images and self.vae is not None:
            n = int(out.num_steps)
            frames = []
            for t in range(n):
                frames.append(
                    postprocess_images(self._decode(out.history_latents[t]))
                )
            history = np.stack(frames)

        images = (
            postprocess_images(decoded)
            if decode and self.vae is not None
            else np.asarray(decoded)
        )
        return GenerationResult(
            images=images,
            num_steps=int(out.num_steps),
            sigmas=np.asarray(out.sigmas),
            alphas=np.asarray(out.alphas),
            betas=np.asarray(out.betas),
            prob_masks=np.asarray(out.prob_masks),
            last_valid_index=np.asarray(out.last_valid_index),
            history_images=history,
        )

    def generate_fixed(
        self,
        prompt_embeds,
        pooled_prompt_embeds,
        negative_prompt_embeds=None,
        negative_pooled_prompt_embeds=None,
        num_steps: int = 28,
        guidance_scale: Optional[float] = 7.0,
        seed: int = 0,
        latents=None,
        cache_interval: int = 0,
        guidance_interval: Optional[tuple] = None,
        cache_tau: float = 0.0,
        solver: str = "euler",
    ) -> np.ndarray:
        """Fixed-schedule baseline generation (no TPM) — the comparison
        point for the adaptive sampler.

        ``cache_interval`` >= 2 enables Δ-DiT-style residual caching (see
        :meth:`generate`); 0/1 runs the exact baseline. ``guidance_interval``
        = (lo, hi) applies CFG only while sigma is inside the window
        (single-batch conditional-only forwards outside it). ``cache_tau``
        > 0 swaps the fixed reuse schedule for the input-aware on-device
        policy (see SamplerConfig.cache_tau) — mutually exclusive with
        ``cache_interval``. ``solver`` picks the ODE integrator
        (pipeline/sampler.py FLOW_SOLVERS): "euler" (the reference's
        first-order rule), "heun"/"midpoint" (second-order, 2 model evals
        per step), or "ab2" (second-order at Euler cost via the previous
        step's velocity); non-Euler solvers compose with
        ``guidance_interval`` but not with the residual-cache knobs, whose
        reuse accounting assumes one evaluation per ladder step."""
        b = prompt_embeds.shape[0]
        from tpdm_tpu.pipeline.sampler import FLOW_SOLVERS

        if solver not in FLOW_SOLVERS:
            raise ValueError(
                f"unknown solver {solver!r}; pick from {FLOW_SOLVERS}"
            )
        if solver != "euler" and (cache_tau or cache_interval >= 2):
            raise ValueError(
                "second-order solvers do not compose with residual caching "
                "(cache_interval / cache_tau) — the Δ-cache reuse schedule "
                "counts one model evaluation per ladder step"
            )
        if cache_tau and cache_interval >= 2:
            raise ValueError(
                "cache_tau (input-aware policy) and cache_interval (fixed "
                "schedule) are mutually exclusive — pick one reuse policy"
            )
        if guidance_interval is not None:
            if guidance_scale is None:
                raise ValueError(
                    "guidance_interval requires classifier-free guidance"
                )
            guidance_interval = (
                float(guidance_interval[0]), float(guidance_interval[1])
            )
        if guidance_scale is not None:
            if negative_prompt_embeds is None or negative_pooled_prompt_embeds is None:
                raise ValueError(
                    "classifier-free guidance is on (guidance_scale="
                    f"{guidance_scale}); pass negative_prompt_embeds + "
                    "negative_pooled_prompt_embeds (or guidance_scale=None)"
                )
            pe = jnp.concatenate([negative_prompt_embeds, prompt_embeds])
            pp = jnp.concatenate(
                [negative_pooled_prompt_embeds, pooled_prompt_embeds]
            )
        else:
            pe, pp = prompt_embeds, pooled_prompt_embeds
        mcfg = self.mmdit.config
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed),
                (b, mcfg.in_channels, mcfg.sample_size, mcfg.sample_size),
                mcfg.dtype,
            )
        sig = ("fixed", guidance_scale, num_steps, cache_interval,
               guidance_interval, cache_tau, solver)
        if sig not in self._jit_cache:

            def go(mmdit_params, vae_params, latents, pe, pp):
                if cache_interval >= 2 or cache_tau > 0:
                    from tpdm_tpu.pipeline.denoise import (
                        make_cfg_velocity_cached_fns,
                    )
                    from tpdm_tpu.pipeline.sampler import (
                        cache_reuse_schedule,
                        fixed_schedule_sample_autocached,
                        fixed_schedule_sample_cached,
                    )

                    mode_apply = lambda mode: (
                        lambda lat, t, pe_, pp_, d: self.mmdit.apply(
                            mmdit_params, lat, t, pe_, pp_,
                            delta=d, cache_mode=mode,
                        )
                    )
                    mcfg = self.mmdit.config
                    bb = latents.shape[0] * (
                        2 if guidance_scale is not None else 1
                    )
                    n_img = (latents.shape[-2] // mcfg.patch_size) * (
                        latents.shape[-1] // mcfg.patch_size
                    )
                    init_delta = jnp.zeros(
                        (bb, n_img, mcfg.inner_dim), mcfg.dtype
                    )
                    if guidance_interval is not None:
                        # composed: Δ-cache × guidance interval
                        from tpdm_tpu.pipeline.denoise import (
                            interval_cached_init_delta,
                            make_cfg_interval_velocity_cached_fns,
                        )

                        full_fn, reuse_fn = (
                            make_cfg_interval_velocity_cached_fns(
                                mode_apply("record"), mode_apply("reuse"),
                                pe, pp, guidance_scale, guidance_interval,
                            )
                        )
                        init_delta = interval_cached_init_delta(init_delta)
                    else:
                        full_fn, reuse_fn = make_cfg_velocity_cached_fns(
                            mode_apply("record"), mode_apply("reuse"),
                            pe, pp, guidance_scale,
                        )
                    if cache_tau > 0:
                        final, _ = fixed_schedule_sample_autocached(
                            full_fn, reuse_fn, latents,
                            uniform_flow_sigmas(num_steps),
                            init_delta, cache_tau,
                        )
                    else:
                        final = fixed_schedule_sample_cached(
                            full_fn, reuse_fn, latents,
                            uniform_flow_sigmas(num_steps),
                            init_delta,
                            cache_reuse_schedule(num_steps, cache_interval),
                        )
                elif guidance_interval is not None:
                    from tpdm_tpu.pipeline.denoise import (
                        make_cfg_interval_velocity_fn,
                    )

                    vfn = make_cfg_interval_velocity_fn(
                        lambda *a: self.mmdit.apply(mmdit_params, *a),
                        pe, pp, guidance_scale, guidance_interval,
                    )
                    final = fixed_schedule_sample_solver(
                        vfn, latents, uniform_flow_sigmas(num_steps), solver
                    )
                else:
                    vfn = make_cfg_velocity_fn(
                        lambda *a: self.mmdit.apply(mmdit_params, *a),
                        pe,
                        pp,
                        guidance_scale,
                    )
                    final = fixed_schedule_sample_solver(
                        vfn, latents, uniform_flow_sigmas(num_steps), solver
                    )
                if self.vae is None:
                    return final
                return self._decode_impl(vae_params, final)

            self._jit_cache[sig] = jax.jit(go)
        out = self._jit_cache[sig](
            self.mmdit_params, self.vae_params, latents, pe, pp
        )
        if self.vae is not None:
            return postprocess_images(out)
        return np.asarray(out)


def load_pipeline_from_pretrained(
    root: str,
    dtype=jnp.bfloat16,
    load_text_encoders: bool = True,
    tpm_checkpoint: Optional[str] = None,
    mmdit_config: Optional[MMDiTConfig] = None,
    device_put_backbones: bool = True,
    quant_int8: bool = False,
    quant_bits: int = 8,
    quant_text: bool = False,
) -> TPDMPipeline:
    """Build a pipeline from a diffusers-layout SD3 directory.

    Expects subfolders transformer/, vae/, text_encoder/, text_encoder_2/,
    text_encoder_3/ with *.safetensors — the same layout the reference's
    from_pretrained calls consume (modeling_sd3_pnt.py:144-178). The TPM
    checkpoint is the reference's TPM-only safetensors
    (`agent_model.`-prefixed, gradio_sd3_inference.py:20-21).

    Memory policy (single-chip v5e has 16 GB HBM; the full bf16 stack —
    MMDiT 4.1 GB + T5-XXL 9.5 GB + CLIPs 1.5 GB + VAE — does not fit
    alongside denoising activations): the hot-loop towers (MMDiT, VAE, TPM)
    are device_put once and stay resident; text-encoder params stay as host
    numpy arrays and stream to the device per encode call (jit arguments
    are freed after the call), since prompt encoding runs once per batch.
    """
    from tpdm_tpu.utils import convert as C

    def load_dir(sub):
        d = os.path.join(root, sub)
        sd: dict = {}
        for f in sorted(os.listdir(d)):
            if f.endswith(".safetensors"):
                sd.update(C.load_safetensors(os.path.join(d, f)))
        return sd

    mcfg = mmdit_config or MMDiTConfig.sd3_medium(
        dtype=dtype, quant_matmuls=quant_int8, quant_bits=quant_bits
    )
    mmdit = MMDiT(mcfg)
    mmdit_params = C.convert_mmdit(
        load_dir("transformer"),
        num_layers=mcfg.num_layers,
        dual_attention_layers=mcfg.dual_attention_layers,
        qk_norm=mcfg.qk_norm,
        dtype=np.dtype("float32") if dtype == jnp.float32 else np.dtype("bfloat16"),
    )
    if mcfg.quant_matmuls:
        # stored-int8 backbone: halves MMDiT weight HBM (docs/PERF.md) —
        # fit the converted float tree into the quant structure, then
        # quantize once here instead of in-graph per forward
        from tpdm_tpu.ops.quant import fit_quant_params, prequantize_params

        expected = jax.eval_shape(
            mmdit.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, mcfg.in_channels, mcfg.sample_size, mcfg.sample_size),
                      mcfg.dtype),
            jnp.ones((1,)),
            jnp.zeros((1, 8, mcfg.joint_attention_dim), mcfg.dtype),
            jnp.zeros((1, mcfg.pooled_projection_dim), mcfg.dtype),
        )
        mmdit_params = prequantize_params(
            fit_quant_params(mmdit_params, expected)
        )

    vcfg = VAEConfig.sd3(dtype=dtype)
    vae = VAE(vcfg)
    vae_params = C.convert_vae(load_dir("vae"))

    tpm = TimePredictor(
        conv_out_channels=128,
        in_channels=2 * mcfg.inner_dim,
        temb_dim=mcfg.inner_dim,
        dtype=dtype,
    )
    if tpm_checkpoint is not None:
        tpm_params = C.convert_tpm(C.load_safetensors(tpm_checkpoint))
    else:
        tpm_params = tpm.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 2 * mcfg.inner_dim, 64, 64)),
            jnp.zeros((1, mcfg.inner_dim)),
        )

    if device_put_backbones:
        mmdit_params = jax.device_put(mmdit_params)
        vae_params = jax.device_put(vae_params)
        tpm_params = jax.device_put(tpm_params)

    text = None
    if load_text_encoders:
        from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        from tpdm_tpu.models.t5 import T5Config, T5Encoder
        from tpdm_tpu.pipeline.text_encoding import SD3TextEncoders

        lcfg = CLIPTextConfig.sd3_clip_l(dtype=dtype)
        gcfg = CLIPTextConfig.sd3_clip_g(dtype=dtype)
        # quant_text: weight-only stored-int T5 (the 9.5 GB tower that
        # otherwise streams host->device per cold-prompt encode); fp
        # activations, so CLIP pooled/T5 embeds keep full dynamic range
        tcfg = T5Config.t5_xxl(
            dtype=dtype, quant_matmuls=quant_text, quant_bits=quant_bits
        )
        t5 = T5Encoder(tcfg)
        t5_params = C.convert_t5(load_dir("text_encoder_3"), tcfg.num_layers)
        if quant_text:
            from tpdm_tpu.ops.quant import fit_quant_params, prequantize_params

            expected = jax.eval_shape(
                t5.init, jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
            )
            # quantize ON THE HOST CPU and hand back numpy leaves: the
            # memory policy above keeps text params host-resident and
            # streaming per encode; letting jnp ops run on the default
            # (TPU) device would pin the whole tower in HBM at load
            with jax.default_device(jax.devices("cpu")[0]):
                t5_params = jax.tree.map(
                    np.asarray,
                    prequantize_params(fit_quant_params(t5_params, expected)),
                )
        text = SD3TextEncoders(
            CLIPTextModel(lcfg),
            C.convert_clip_text(load_dir("text_encoder"), lcfg.num_hidden_layers),
            CLIPTextModel(gcfg),
            C.convert_clip_text(load_dir("text_encoder_2"), gcfg.num_hidden_layers),
            t5,
            t5_params,
        )

    return TPDMPipeline(mmdit, mmdit_params, tpm, tpm_params, vae, vae_params, text)
