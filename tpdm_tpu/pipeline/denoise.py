"""Builders turning an MMDiT apply-fn into the sampler's denoise callable.

Encapsulates classifier-free guidance exactly as the reference does it:
batch-double the latents with [uncond; cond] embeds, run one forward, and
apply the guidance combine to all four outputs — velocity, temb, h1, h2
(reference: src/models/stable_diffusion_3/modeling_sd3_pnt.py:504-552).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tpdm_tpu.models.tpm import reshape_tokens_to_2d


def make_cfg_denoise_fn(
    mmdit_apply: Callable,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    guidance_scale: Optional[float],
    token_grid: int,
    patch_size: int = 2,
):
    """Build denoise_fn(latents, sigma) -> (velocity, temb, h_combined).

    Args:
        mmdit_apply: (latents, timestep, ctx, pooled) -> (vel, temb, h1, h2).
        prompt_embeds: (2b, n, d) already concatenated [negative; positive]
            when guidance_scale is not None, else (b, n, d).
        pooled_embeds: (2b, p) resp. (b, p), same convention.
        guidance_scale: None disables CFG entirely. A scalar applies one
            strength to the whole batch; a traced (b,) array applies
            PER-SAMPLE strengths (the serving engine's per-request knob —
            kept a jit argument there so any mix shares one compiled
            program). Cast to each output's dtype, so a scalar matches the
            historical weak-typed-python-float arithmetic bit-for-bit.
        token_grid: token-grid side (latent_size // patch_size; 64 for SD3)
            or an (gh, gw) tuple for rectangular latents — the spatial size
            of the TPM input map.
    """
    if isinstance(token_grid, tuple):
        gh, gw = token_grid
    else:
        gh = gw = token_grid

    def denoise_fn(latents, sigma):
        if guidance_scale is not None:
            lat = jnp.concatenate([latents, latents])
            t = jnp.concatenate([sigma, sigma]) * 1000.0
        else:
            lat, t = latents, sigma * 1000.0
        vel, temb, h1, h2 = mmdit_apply(lat, t, prompt_embeds, pooled_embeds)
        if guidance_scale is not None:

            def guide(a):
                uncond, cond = jnp.split(a, 2)
                g = jnp.asarray(guidance_scale, uncond.dtype)
                g = g.reshape((-1,) + (1,) * (uncond.ndim - 1))
                return uncond + g * (cond - uncond)

            vel, temb, h1, h2 = guide(vel), guide(temb), guide(h1), guide(h2)
        h_combined = jnp.concatenate(
            [
                reshape_tokens_to_2d(h1, gh, gw, patch_size),
                reshape_tokens_to_2d(h2, gh, gw, patch_size),
            ],
            axis=1,
        )
        return vel, temb, h_combined

    return denoise_fn


def make_cfg_denoise_cached_fns(
    mmdit_apply_record: Callable,
    mmdit_apply_reuse: Callable,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    guidance_scale: Optional[float],
    token_grid: int,
    patch_size: int = 2,
):
    """Residual-cache variant of :func:`make_cfg_denoise_fn` (Δ-DiT-style).

    Returns ``(full_fn, reuse_fn)``, each ``(latents, sigma, delta) ->
    (velocity, temb, h_combined, delta)``: ``full_fn`` runs every block and
    refreshes Δ (the back block group's residual); ``reuse_fn`` runs only the
    front blocks and substitutes the cached Δ. The Δ rows live on the
    CFG-doubled batch ([uncond; cond]) and are NOT guidance-combined — they
    are internal activations, not outputs. Identical CFG semantics to the
    uncached builder otherwise.
    """
    if isinstance(token_grid, tuple):
        gh, gw = token_grid
    else:
        gh = gw = token_grid

    def make(apply_fn):
        def denoise_fn(latents, sigma, delta):
            if guidance_scale is not None:
                lat = jnp.concatenate([latents, latents])
                t = jnp.concatenate([sigma, sigma]) * 1000.0
            else:
                lat, t = latents, sigma * 1000.0
            vel, temb, h1, h2, delta = apply_fn(
                lat, t, prompt_embeds, pooled_embeds, delta
            )
            if guidance_scale is not None:

                def guide(a):
                    uncond, cond = jnp.split(a, 2)
                    g = jnp.asarray(guidance_scale, uncond.dtype)
                    g = g.reshape((-1,) + (1,) * (uncond.ndim - 1))
                    return uncond + g * (cond - uncond)

                vel, temb, h1, h2 = guide(vel), guide(temb), guide(h1), guide(h2)
            h_combined = jnp.concatenate(
                [
                    reshape_tokens_to_2d(h1, gh, gw, patch_size),
                    reshape_tokens_to_2d(h2, gh, gw, patch_size),
                ],
                axis=1,
            )
            return vel, temb, h_combined, delta

        return denoise_fn

    return make(mmdit_apply_record), make(mmdit_apply_reuse)


def make_cfg_velocity_fn(
    mmdit_apply: Callable,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    guidance_scale: Optional[float],
):
    """velocity-only variant for the fixed-schedule baseline sampler."""

    def velocity_fn(latents, sigma):
        if guidance_scale is not None:
            lat = jnp.concatenate([latents, latents])
            t = jnp.concatenate([sigma, sigma]) * 1000.0
        else:
            lat, t = latents, sigma * 1000.0
        vel = mmdit_apply(lat, t, prompt_embeds, pooled_embeds)[0]
        if guidance_scale is not None:
            uncond, cond = jnp.split(vel, 2)
            vel = uncond + guidance_scale * (cond - uncond)
        return vel

    return velocity_fn


def _interval_weight(sigma, guidance_scale, interval, out_dtype):
    """(b,) effective guidance weight: ``guidance_scale`` where sigma is
    inside [lo, hi), 1.0 (== conditional-only) outside."""
    lo, hi = interval
    in_iv = (sigma >= lo) & (sigma < hi)
    g = jnp.broadcast_to(
        jnp.asarray(guidance_scale, jnp.float32).reshape(-1), sigma.shape
    )
    return jnp.where(in_iv, g, 1.0).astype(out_dtype), in_iv


def make_cfg_interval_denoise_fn(
    mmdit_apply: Callable,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    guidance_scale,
    interval,
    token_grid,
    patch_size: int = 2,
):
    """Guidance-interval variant of :func:`make_cfg_denoise_fn`.

    Classifier-free guidance is applied only while sigma lies in
    ``interval = (lo, hi)`` (Kynkäänniemi et al. 2024, "Applying guidance in
    a limited interval"): per sample the effective weight is
    ``guidance_scale`` inside the window and 1.0 (== conditional-only)
    outside. When NO sample in the batch is inside the window the uncond
    tower is physically skipped — a single-batch forward under ``lax.cond``
    — halving the step's FLOPs. Outputs are numerically the per-sample
    weighted combine either way (the w=1 collapse ``uncond + 1*(cond -
    uncond) == cond``), so the two branches agree to float tolerance.

    ``prompt_embeds`` / ``pooled_embeds`` follow the [uncond; cond] 2b-row
    convention of :func:`make_cfg_denoise_fn`. The reference applies CFG on
    every step unconditionally (modeling_sd3_pnt.py:504-552); this is a
    training-free TPU-side acceleration knob beyond it.
    """
    if guidance_scale is None:
        raise ValueError("guidance interval requires CFG on")
    if isinstance(token_grid, tuple):
        gh, gw = token_grid
    else:
        gh = gw = token_grid

    def _combine_h(h1, h2):
        return jnp.concatenate(
            [
                reshape_tokens_to_2d(h1, gh, gw, patch_size),
                reshape_tokens_to_2d(h2, gh, gw, patch_size),
            ],
            axis=1,
        )

    def denoise_fn(latents, sigma):
        b = latents.shape[0]
        n = prompt_embeds.shape[0] // 2

        def guided(latents, sigma):
            lat = jnp.concatenate([latents, latents])
            t = jnp.concatenate([sigma, sigma]) * 1000.0
            vel, temb, h1, h2 = mmdit_apply(
                lat, t, prompt_embeds, pooled_embeds
            )

            def guide(a):
                uncond, cond = jnp.split(a, 2)
                w, _ = _interval_weight(
                    sigma, guidance_scale, interval, uncond.dtype
                )
                w = w.reshape((-1,) + (1,) * (uncond.ndim - 1))
                return uncond + w * (cond - uncond)

            return guide(vel), guide(temb), guide(h1), guide(h2)

        def cond_only(latents, sigma):
            vel, temb, h1, h2 = mmdit_apply(
                latents, sigma * 1000.0,
                prompt_embeds[n:][:b], pooled_embeds[n:][:b],
            )
            return vel, temb, h1, h2

        _, in_iv = _interval_weight(sigma, guidance_scale, interval, jnp.float32)
        vel, temb, h1, h2 = jax.lax.cond(
            jnp.any(in_iv), guided, cond_only, latents, sigma
        )
        return vel, temb, _combine_h(h1, h2)

    return denoise_fn


def make_cfg_interval_velocity_fn(
    mmdit_apply: Callable,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    guidance_scale,
    interval,
):
    """velocity-only guidance-interval variant (fixed-schedule sampler).

    Same semantics as :func:`make_cfg_interval_denoise_fn`: full CFG while
    sigma is inside ``interval``, a single-batch conditional-only forward
    once every sample has left it.
    """
    if guidance_scale is None:
        raise ValueError("guidance interval requires CFG on")

    def velocity_fn(latents, sigma):
        b = latents.shape[0]
        n = prompt_embeds.shape[0] // 2

        def guided(latents, sigma):
            lat = jnp.concatenate([latents, latents])
            t = jnp.concatenate([sigma, sigma]) * 1000.0
            vel = mmdit_apply(lat, t, prompt_embeds, pooled_embeds)[0]
            uncond, cond = jnp.split(vel, 2)
            w, _ = _interval_weight(
                sigma, guidance_scale, interval, uncond.dtype
            )
            w = w.reshape((-1,) + (1,) * (uncond.ndim - 1))
            return uncond + w * (cond - uncond)

        def cond_only(latents, sigma):
            return mmdit_apply(
                latents, sigma * 1000.0,
                prompt_embeds[n:][:b], pooled_embeds[n:][:b],
            )[0]

        _, in_iv = _interval_weight(sigma, guidance_scale, interval, jnp.float32)
        return jax.lax.cond(jnp.any(in_iv), guided, cond_only, latents, sigma)

    return velocity_fn


def make_cfg_velocity_cached_fns(
    mmdit_apply_record: Callable,
    mmdit_apply_reuse: Callable,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    guidance_scale: Optional[float],
):
    """velocity-only residual-cache pair for the fixed-schedule sampler.

    Returns ``(full_fn, reuse_fn)``, each ``(latents, sigma, delta) ->
    (velocity, delta)`` — the Δ-accelerated analogue of
    :func:`make_cfg_velocity_fn` (used by the cached bench/serving legs).
    """

    def make(apply_fn):
        def velocity_fn(latents, sigma, delta):
            if guidance_scale is not None:
                lat = jnp.concatenate([latents, latents])
                t = jnp.concatenate([sigma, sigma]) * 1000.0
            else:
                lat, t = latents, sigma * 1000.0
            out = apply_fn(lat, t, prompt_embeds, pooled_embeds, delta)
            vel, delta = out[0], out[4]
            if guidance_scale is not None:
                uncond, cond = jnp.split(vel, 2)
                vel = uncond + guidance_scale * (cond - uncond)
            return vel, delta

        return velocity_fn

    return make(mmdit_apply_record), make(mmdit_apply_reuse)
