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
