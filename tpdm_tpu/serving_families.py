"""Model-family serving runners: SD1.5 and FLUX behind the same engine.

The reference serves only SD3 (gradio_sd3_inference.py); its SD1.5 model
is training-only and FLUX is named-but-absent. Here every family the
framework trains can also be SERVED: these factories produce the
``runner(prompts, seeds, caps) -> [result, ...]`` callable that
`BatchingEngine(runner=...)` delegates batch execution to, while the
engine keeps the production machinery (queueing, request coalescing,
fixed-shape padding, stats) family-agnostic.

Per-request seed determinism matches the batch-1 direct path exactly:
request i's latent is ``agent.prepare_latents(split(PRNGKey(seed_i))[0], 1)``
— the same derivation ``agent.sample(..., key=PRNGKey(seed_i))`` performs
for a batch of one — so the same (prompt, seed) produces the same image
through the engine, the variants pipeline, and any batch composition.

Per-request step caps ride the samplers' traced ``step_caps`` argument
(one compiled shape serves every cap mix).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def _per_seed_latents(agent, seeds):
    import jax
    import jax.numpy as jnp

    rows = []
    for s in seeds:
        key_lat = jax.random.split(jax.random.PRNGKey(int(s)))[0]
        rows.append(agent.prepare_latents(key_lat, 1))
    return jnp.concatenate(rows, axis=0)


def _accel_scfg(agent, cache_interval: int, guidance_interval,
                cache_tau: float = 0.0):
    """Serving-side acceleration config: predict-mode sampler config with
    the knobs set, or None (= the agent's default). Same validation as
    pipeline.variants._cached_scfg. ``cache_tau`` > 0 swaps the fixed
    reuse schedule for the input-aware policy (mutually exclusive with
    ``cache_interval``)."""
    if cache_tau and cache_interval >= 2:
        raise ValueError(
            "cache_tau (input-aware policy) and cache_interval (fixed "
            "schedule) are mutually exclusive"
        )
    if guidance_interval is not None:
        # cache_interval >= 2 composes (the agents build the combined
        # DeepCache × interval denoise pair)
        gs = getattr(agent, "guidance_scale", None)
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


def make_sd15_runner(
    agent,
    tpm_params,
    encode: Callable,
    decode: Optional[Callable] = None,
    cache_interval: int = 0,
    guidance_interval=None,
    cache_tau: float = 0.0,
) -> Callable:
    """Serving runner for the SD1.5 family (integer-t DPM-Solver++ loop).

    ``cache_interval`` >= 2 enables DeepCache deep-feature reuse;
    ``guidance_interval`` = (t_lo, t_hi) applies CFG only inside the
    integer-t window (both training-free, approximate; see docs/PERF.md
    "Training-free acceleration"). Mutually exclusive.

    Args:
        agent: an ``SD15Agent``.
        tpm_params: TPM params (trained checkpoint or ``init_tpm_params``).
        encode: ``(prompts: list[str]) -> (prompt_embeds,
            negative_prompt_embeds)`` — CLIP final-hidden-state features;
            the negative branch encodes the empty prompt (the reference's
            CFG convention, modeling_sd_v1_5.py:623-689).
        decode: optional ``final_latents -> uint8 images (b, H, W, 3)``;
            None returns raw latents (toy/latent-space callers).
    """
    import jax

    scfg = _accel_scfg(agent, cache_interval, guidance_interval,
                       cache_tau)

    def runner(prompts, seeds, caps):
        pe, npe = encode(prompts)
        latents = _per_seed_latents(agent, seeds)
        out = agent.sample(
            tpm_params,
            {
                "prompt_embeds": pe,
                "negative_prompt_embeds": npe,
                "latents": latents,
            },
            jax.random.PRNGKey(0),  # predict=True: rollout key is unused
            predict=True,
            sampler_cfg=scfg,
            step_caps=np.asarray(caps, np.int32),
        )
        images = (
            decode(out.final_latents) if decode is not None
            else np.asarray(out.final_latents)
        )
        times = np.asarray(out.times)
        lvi = np.asarray(out.last_valid_index)
        results = []
        for i in range(len(prompts)):
            nfe = int(lvi[i]) + 1
            results.append(
                {
                    "image": images[i],
                    "inference_steps": nfe,
                    # integer timesteps for SD1.5 (t in [0, 999]) — same
                    # payload slot the SD3 path fills with sigmas
                    "sigmas": times[i][1 : nfe + 1].tolist(),
                }
            )
        return results

    return runner


def make_sdxl_runner(
    agent,
    tpm_params,
    encode: Callable,
    decode: Optional[Callable] = None,
    cache_interval: int = 0,
    guidance_interval=None,
    cache_tau: float = 0.0,
) -> Callable:
    """Serving runner for the SDXL family (integer-t DPM-Solver++ loop,
    dual-CLIP conditioning + pooled bigG + text_time ids).

    ``cache_interval`` / ``guidance_interval``: same training-free
    acceleration knobs as make_sd15_runner (mutually exclusive).

    Args:
        agent: an ``SDXLAgent``.
        tpm_params: TPM params.
        encode: ``(prompts) -> (prompt_embeds (b, 77, 2048),
            pooled (b, 1280), negative_prompt_embeds, negative_pooled)``
            — the negative pair encodes the empty prompt (diffusers SDXL
            CFG convention); pass None pairs when guidance is off.
        decode: optional ``final_latents -> uint8 images``.
    """
    import jax

    scfg = _accel_scfg(agent, cache_interval, guidance_interval,
                       cache_tau)

    def runner(prompts, seeds, caps):
        pe, pooled, npe, npooled = encode(prompts)
        latents = _per_seed_latents(agent, seeds)
        batch = {
            "prompt_embeds": pe,
            "pooled_prompt_embeds": pooled,
            "latents": latents,
        }
        if npe is not None:
            batch["negative_prompt_embeds"] = npe
            batch["negative_pooled_prompt_embeds"] = npooled
        out = agent.sample(
            tpm_params,
            batch,
            jax.random.PRNGKey(0),  # predict=True: rollout key is unused
            predict=True,
            sampler_cfg=scfg,
            step_caps=np.asarray(caps, np.int32),
        )
        images = (
            decode(out.final_latents) if decode is not None
            else np.asarray(out.final_latents)
        )
        times = np.asarray(out.times)
        lvi = np.asarray(out.last_valid_index)
        results = []
        for i in range(len(prompts)):
            nfe = int(lvi[i]) + 1
            results.append(
                {
                    "image": images[i],
                    "inference_steps": nfe,
                    # integer timesteps (t in [0, 999]), same slot as SD1.5
                    "sigmas": times[i][1 : nfe + 1].tolist(),
                }
            )
        return results

    return runner


def make_sdxl_ensemble_runner(
    base_agent,
    base_tpm_params,
    refiner_agent,
    refiner_tpm_params,
    encode: Callable,
    encode_refiner: Callable,
    decode: Optional[Callable] = None,
    denoising_end: float = 0.8,
) -> Callable:
    """Serving runner for the SDXL base+refiner ensemble-of-experts
    (pipeline/variants.py sdxl_ensemble_generate at the engine boundary).

    The base stage samples with min_time at the denoising_end cutoff and
    hands each request's (latents, final t) to the refiner's integer-t
    img2img entry — the handoff is exact and per-sample. Per-request step
    caps bound the TOTAL NFE: the base stage gets
    max(1, round(cap * denoising_end)) of each request's budget (leaving
    at least one refiner step when cap >= 2), the refiner the remainder; a
    request that exhausts its base share hands off AT the cutoff
    (SD15SamplerConfig.cap_floor_time) with real noise left, so the
    refiner always executes — unlike the batch pipeline's
    sdxl_ensemble_generate, whose cap integrates to x0 and skips the
    refiner (there the cap is a debugging bound, here it is a serving
    quality/latency contract).

    Args:
        encode: the base dual-CLIP encode (as make_sdxl_runner).
        encode_refiner: ``(prompts) -> (prompt_embeds (b, 77, 1280),
            pooled, negative_prompt_embeds, negative_pooled)`` — the
            bigG-only refiner conditioning
            (SDXLTextEncoders.encode_refiner); None negative pair when
            guidance is off.
        decode: optional ``final_latents -> uint8 images`` (the two
            experts share the SDXL VAE).
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    if not 0.0 < denoising_end < 1.0:
        raise ValueError(f"denoising_end must be in (0, 1), got {denoising_end}")
    t_cut = int(round(999 * (1.0 - denoising_end)))
    # cap_floor_time: a request that exhausts its base share hands off AT
    # the cutoff (real noise left for the refiner) instead of integrating
    # to x0 — this is what guarantees the refiner step below
    base_scfg = dataclasses.replace(
        base_agent.sampler_cfg, predict=True, min_time=max(t_cut, 1),
        cap_floor_time=max(t_cut - 1, 0),
    )

    def runner(prompts, seeds, caps):
        caps = np.asarray(caps, np.int32)
        base_caps = np.maximum(1, np.round(caps * denoising_end)).astype(
            np.int32
        )
        base_caps = np.minimum(base_caps, np.maximum(caps - 1, 1))
        ref_caps = np.maximum(caps - base_caps, 1)

        pe, pooled, npe, npooled = encode(prompts)
        batch = {
            "prompt_embeds": pe,
            "pooled_prompt_embeds": pooled,
            "latents": _per_seed_latents(base_agent, seeds),
        }
        if npe is not None:
            batch["negative_prompt_embeds"] = npe
            batch["negative_pooled_prompt_embeds"] = npooled
        out = base_agent.sample(
            base_tpm_params, batch, jax.random.PRNGKey(0),
            sampler_cfg=base_scfg, step_caps=base_caps,
        )
        times = np.asarray(out.times)
        lvi = np.asarray(out.last_valid_index)
        handoff_t = times[np.arange(len(prompts)), lvi + 1]

        rpe, rpooled, rnpe, rnpooled = encode_refiner(prompts)
        rbatch = {
            "prompt_embeds": rpe,
            "pooled_prompt_embeds": rpooled,
            "latents": out.final_latents.astype(
                refiner_agent.unet.config.dtype
            ),
            "init_t": jnp.asarray(handoff_t, jnp.int32),
        }
        if rnpe is not None:
            rbatch["negative_prompt_embeds"] = rnpe
            rbatch["negative_pooled_prompt_embeds"] = rnpooled
        rout = refiner_agent.sample(
            refiner_tpm_params, rbatch, jax.random.PRNGKey(0), predict=True,
            step_caps=ref_caps,
        )
        images = (
            decode(rout.final_latents) if decode is not None
            else np.asarray(rout.final_latents)
        )
        rtimes = np.asarray(rout.times)
        rlvi = np.asarray(rout.last_valid_index)
        results = []
        for i in range(len(prompts)):
            base_nfe = int(lvi[i]) + 1
            ref_nfe = int(rlvi[i]) + 1
            results.append(
                {
                    "image": images[i],
                    "inference_steps": base_nfe + ref_nfe,
                    "base_steps": base_nfe,
                    "refiner_steps": ref_nfe,
                    "handoff_t": int(handoff_t[i]),
                    # the full realized integer-t trajectory across experts
                    "sigmas": times[i][1 : base_nfe + 1].tolist()
                    + rtimes[i][1 : ref_nfe + 1].tolist(),
                }
            )
        return results

    return runner


def make_flux_runner(
    agent,
    tpm_params,
    encode: Callable,
    decode: Optional[Callable] = None,
    cache_interval: int = 0,
    guidance_interval=None,
    cache_tau: float = 0.0,
) -> Callable:
    """Serving runner for the FLUX family (packed tokens, embedded
    guidance, no CFG batch-doubling).

    ``cache_interval`` >= 2 enables Δ-residual block caching.
    ``guidance_interval`` is REJECTED: FLUX's guidance is an embedding,
    not a CFG batch double — there is no uncond tower to skip.

    Args:
        agent: a ``FluxAgent``.
        tpm_params: TPM params.
        encode: ``(prompts) -> (prompt_embeds (b, n, txt_dim),
            pooled_prompt_embeds (b, vec_dim))`` — T5 features + CLIP
            pooled vector.
        decode: optional ``final_latents -> uint8 images``.
    """
    import jax

    if guidance_interval is not None:
        raise ValueError(
            "guidance_interval does not apply to FLUX (embedded guidance, "
            "no CFG batch-doubling)"
        )
    if cache_tau and cache_interval >= 2:
        raise ValueError(
            "cache_tau (input-aware policy) and cache_interval (fixed "
            "schedule) are mutually exclusive"
        )
    scfg = None
    if cache_interval >= 2 or cache_tau > 0:
        import dataclasses as _dc

        scfg = _dc.replace(
            agent.sampler_cfg, predict=True, cache_activations=False,
            cache_interval=cache_interval, cache_tau=cache_tau,
        )

    def runner(prompts, seeds, caps):
        txt, pooled = encode(prompts)
        latents = _per_seed_latents(agent, seeds)
        out = agent.sample(
            tpm_params,
            {
                "prompt_embeds": txt,
                "pooled_prompt_embeds": pooled,
                "latents": latents,
            },
            jax.random.PRNGKey(0),
            predict=True,
            sampler_cfg=scfg,
            step_caps=np.asarray(caps, np.int32),
        )
        images = (
            decode(out.final_latents) if decode is not None
            else np.asarray(out.final_latents)
        )
        sigmas = np.asarray(out.sigmas)
        lvi = np.asarray(out.last_valid_index)
        results = []
        for i in range(len(prompts)):
            nfe = int(lvi[i]) + 1
            results.append(
                {
                    "image": images[i],
                    "inference_steps": nfe,
                    "sigmas": sigmas[i][:nfe].tolist(),
                }
            )
        return results

    return runner


def make_vae_decoder(vae, vae_params) -> Callable:
    """Standard latent->uint8 decode for the family runners: scale/shift
    by the VAE config, fp32 apply, uint8 postprocess (the shared
    convention of pipeline/variants.py)."""
    import jax
    import jax.numpy as jnp

    from tpdm_tpu.utils.image import postprocess_images

    cfg = vae.config
    dec = jax.jit(
        lambda p, z: vae.apply(
            p, z.astype(jnp.float32) / cfg.scaling_factor + cfg.shift_factor
        )
    )
    return lambda z: postprocess_images(dec(vae_params, z))


def _few_step_batch(agent, encode, prompts) -> dict:
    """encode output -> the batch-arrays dict agent.denoise_builder
    consumes, per family (sd15 2-tuple, sdxl 4-tuple, flux txt+pooled)."""
    out = encode(prompts)
    if hasattr(agent, "flux"):
        txt, pooled = out
        return {"prompt_embeds": txt, "pooled_prompt_embeds": pooled}
    if len(out) == 4:  # SDXL dual-CLIP encode
        pe, pooled, npe, npooled = out
        batch = {"prompt_embeds": pe, "pooled_prompt_embeds": pooled}
        if npe is not None:
            batch["negative_prompt_embeds"] = npe
            batch["negative_pooled_prompt_embeds"] = npooled
        return batch
    pe, npe = out
    return {"prompt_embeds": pe, "negative_prompt_embeds": npe}


def make_few_step_runner(
    agent,
    encode: Callable,
    decode: Optional[Callable] = None,
    levels=(0,),
    num_ladder_steps: int = 28,
    params=None,
) -> Callable:
    """Serving runner for a consistency-DISTILLED student (train/distill.py):
    the fixed ``levels`` ladder replaces the adaptive TPM loop — NFE is
    len(levels) by construction, so per-request step caps are ignored.

    Deploy flow: train LoRA with ``--trainer distill``, merge it into the
    agent (serve.py --lora PATH, or apply_lora yourself and pass
    ``params``), then serve with ``--few_step "0,14"``. Per-request
    determinism holds: request i's init noise AND its re-noise rows derive
    from PRNGKey(seed_i) alone, so the same (prompt, seed) produces the
    same image in any batch composition (the whole-batch ``key`` mode of
    make_few_step_sampler would not).
    """
    import jax
    import jax.numpy as jnp

    from tpdm_tpu.train.distill import make_few_step_sampler

    levels = tuple(int(l) for l in levels)
    sample_fn = make_few_step_sampler(agent, num_ladder_steps, levels)
    if params is None:
        params = agent.backbone_params
    n_extra = len(levels) - 1
    if n_extra:
        jit_fn = jax.jit(
            lambda p, b, e, rn: sample_fn(p, b, e, renoise=rn)
        )
    else:
        jit_fn = jax.jit(lambda p, b, e, rn: sample_fn(p, b, e))

    def runner(prompts, seeds, caps):
        del caps  # fixed-NFE sampler: len(levels) steps for every request
        batch = _few_step_batch(agent, encode, prompts)
        eps = _per_seed_latents(agent, seeds)
        rows = []
        for s in seeds:
            k = jax.random.split(jax.random.PRNGKey(int(s)))[1]
            rows.append(
                jnp.stack(
                    [
                        jax.random.normal(
                            jax.random.fold_in(k, r + 1),
                            eps.shape[1:], eps.dtype,
                        )
                        for r in range(n_extra)
                    ]
                )
                if n_extra
                else jnp.zeros((0,) + eps.shape[1:], eps.dtype)
            )
        renoise = jnp.stack(rows, axis=1)  # (n_extra, b, ...)
        final = jit_fn(params, batch, eps, renoise)
        images = (
            decode(final.astype(eps.dtype)) if decode is not None
            else np.asarray(final)
        )
        return [
            {
                "image": images[i],
                "inference_steps": len(levels),
                "sigmas": [],
            }
            for i in range(len(prompts))
        ]

    return runner
