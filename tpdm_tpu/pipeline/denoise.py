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


def make_interval_cached_denoise_pair(
    g_fwd_record: Callable,
    g_fwd_reuse: Callable,
    c_fwd_record: Callable,
    c_fwd_reuse: Callable,
    weight_fn: Callable,
    post: Callable,
):
    """Compose residual/deep-feature caching WITH the guidance interval.

    The two training-free accelerations were mutually exclusive before this
    combinator existed; composed they multiply (reuse steps outside the
    guidance window run the shallow blocks on a SINGLE-batch conditional
    forward). Family-agnostic core shared by SD3 (Δ-DiT residual cache) and
    SD1.5/SDXL (DeepCache deep-feature cache).

    Args:
        g_fwd_record / g_fwd_reuse: ``(latents, t, cache2b) -> (outs, cache2b)``
            — the RAW (not guidance-combined) CFG-doubled forward, record
            resp. reuse mode. ``outs`` is a tuple of arrays on 2b rows,
            ``cache2b`` the family cache pytree whose every leaf is 2b-row
            batch-major ([uncond; cond], the builders' convention).
        c_fwd_record / c_fwd_reuse: same but a conditional-only b-row forward
            over the cond half of the cache pytree.
        weight_fn: ``t -> (w (b,) f32, in_iv (b,) bool)`` — the per-sample
            effective guidance weight + window membership (family units:
            sigma for SD3, integer t for SD1.5/SDXL).
        post: ``outs -> tuple`` final output shaping (h concat etc).

    Returns ``(full_fn, reuse_fn)`` in the ``CachedDenoise`` contract, with
    the cache state wrapped as ``{"d": <family cache>, "uncond_valid":
    bool}``. ``uncond_valid`` tracks whether the UNCOND rows of the cache
    were refreshed at the most recent full step: conditional-only full steps
    refresh only the cond rows, so a batch ENTERING the guidance window on a
    reuse step over a stale uncond cache is PROMOTED to a full guided
    forward (extra FLOPs, never wrong numerics). Everywhere else the step
    cost is: guided full = 2b all blocks, guided reuse = 2b shallow blocks,
    cond full = b all blocks, cond reuse = b shallow blocks.
    """

    def _guided(g_fwd):
        def run(latents, t, d):
            outs, d_new = g_fwd(latents, t, d)
            w, _ = weight_fn(t)

            def guide(a):
                u, c = jnp.split(a, 2)
                ww = w.astype(u.dtype).reshape((-1,) + (1,) * (u.ndim - 1))
                return u + ww * (c - u)

            return tuple(guide(a) for a in outs), d_new

        return run

    def _cond(c_fwd):
        def run(latents, t, d):
            d_c = jax.tree.map(lambda x: x[x.shape[0] // 2:], d)
            outs, d_c_new = c_fwd(latents, t, d_c)
            d_new = jax.tree.map(
                lambda full, c: full.at[full.shape[0] // 2:].set(c), d, d_c_new
            )
            return outs, d_new

        return run

    g_rec, g_reu = _guided(g_fwd_record), _guided(g_fwd_reuse)
    c_rec, c_reu = _cond(c_fwd_record), _cond(c_fwd_reuse)

    def full_fn(latents, t, delta):
        _, in_iv = weight_fn(t)

        def g_branch(latents, t, d):
            outs, d_new = g_rec(latents, t, d)
            return (*outs, {"d": d_new, "uncond_valid": jnp.array(True)})

        def c_branch(latents, t, d):
            outs, d_new = c_rec(latents, t, d)
            return (*outs, {"d": d_new, "uncond_valid": jnp.array(False)})

        *outs, new_delta = jax.lax.cond(
            jnp.any(in_iv), g_branch, c_branch, latents, t, delta["d"]
        )
        return (*post(outs), new_delta)

    def reuse_fn(latents, t, delta):
        _, in_iv = weight_fn(t)
        idx = jnp.where(
            jnp.any(in_iv),
            jnp.where(delta["uncond_valid"], 1, 2),
            0,
        ).astype(jnp.int32)

        def b_cond(latents, t, delta):  # outside the window: cond-only reuse
            outs, d_new = c_reu(latents, t, delta["d"])
            return (*outs, {"d": d_new, "uncond_valid": delta["uncond_valid"]})

        def b_guided(latents, t, delta):  # inside, cache fresh: guided reuse
            outs, d_new = g_reu(latents, t, delta["d"])
            return (*outs, {"d": d_new, "uncond_valid": delta["uncond_valid"]})

        def b_promote(latents, t, delta):  # entering over a stale uncond
            outs, d_new = g_rec(latents, t, delta["d"])  # cache: full guided
            return (*outs, {"d": d_new, "uncond_valid": jnp.array(True)})

        *outs, new_delta = jax.lax.switch(
            idx, [b_cond, b_guided, b_promote], latents, t, delta
        )
        return (*post(outs), new_delta)

    return full_fn, reuse_fn


def interval_cached_init_delta(family_cache):
    """Initial cache state for the composed pair: the family's zero cache
    plus a False uncond-validity flag (step 0 is always a full step, which
    sets it per its guidance branch)."""
    return {"d": family_cache, "uncond_valid": jnp.array(False)}


def _sd3_interval_cached_parts(
    prompt_embeds, pooled_embeds, guidance_scale, interval
):
    """Shared g_fwd/c_fwd/weight closures for the SD3 composed builders."""
    if guidance_scale is None:
        raise ValueError("guidance interval requires CFG on")
    n = prompt_embeds.shape[0] // 2

    def g_fwd(apply_fn):
        def run(latents, sigma, d):
            lat = jnp.concatenate([latents, latents])
            t = jnp.concatenate([sigma, sigma]) * 1000.0
            vel, temb, h1, h2, d_new = apply_fn(
                lat, t, prompt_embeds, pooled_embeds, d
            )
            return (vel, temb, h1, h2), d_new

        return run

    def c_fwd(apply_fn):
        def run(latents, sigma, d):
            b = latents.shape[0]
            vel, temb, h1, h2, d_new = apply_fn(
                latents, sigma * 1000.0,
                prompt_embeds[n:][:b], pooled_embeds[n:][:b], d,
            )
            return (vel, temb, h1, h2), d_new

        return run

    def weight_fn(sigma):
        return _interval_weight(sigma, guidance_scale, interval, jnp.float32)

    return g_fwd, c_fwd, weight_fn


def make_cfg_interval_denoise_cached_fns(
    mmdit_apply_record: Callable,
    mmdit_apply_reuse: Callable,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    guidance_scale,
    interval,
    token_grid,
    patch_size: int = 2,
):
    """Residual caching × guidance interval for the SD3 adaptive loop:
    :func:`make_cfg_denoise_cached_fns` composed with
    :func:`make_cfg_interval_denoise_fn` semantics (see
    :func:`make_interval_cached_denoise_pair` for the cost model and the
    uncond-cache validity rule). Same ``(latents, sigma, delta) -> (velocity,
    temb, h_combined, delta)`` contract; ``delta`` wrapped via
    :func:`interval_cached_init_delta`."""
    if isinstance(token_grid, tuple):
        gh, gw = token_grid
    else:
        gh = gw = token_grid
    g_fwd, c_fwd, weight_fn = _sd3_interval_cached_parts(
        prompt_embeds, pooled_embeds, guidance_scale, interval
    )

    def post(outs):
        vel, temb, h1, h2 = outs
        return (
            vel,
            temb,
            jnp.concatenate(
                [
                    reshape_tokens_to_2d(h1, gh, gw, patch_size),
                    reshape_tokens_to_2d(h2, gh, gw, patch_size),
                ],
                axis=1,
            ),
        )

    return make_interval_cached_denoise_pair(
        g_fwd(mmdit_apply_record), g_fwd(mmdit_apply_reuse),
        c_fwd(mmdit_apply_record), c_fwd(mmdit_apply_reuse),
        weight_fn, post,
    )


def make_cfg_interval_velocity_cached_fns(
    mmdit_apply_record: Callable,
    mmdit_apply_reuse: Callable,
    prompt_embeds: jax.Array,
    pooled_embeds: jax.Array,
    guidance_scale,
    interval,
):
    """velocity-only residual-cache × guidance-interval pair (the
    fixed-schedule sampler's composed acceleration): each fn is ``(latents,
    sigma, delta) -> (velocity, delta)``."""
    g_fwd4, c_fwd4, weight_fn = _sd3_interval_cached_parts(
        prompt_embeds, pooled_embeds, guidance_scale, interval
    )

    def vel_only(run):
        def wrapped(latents, sigma, d):
            outs, d_new = run(latents, sigma, d)
            return (outs[0],), d_new

        return wrapped

    return make_interval_cached_denoise_pair(
        vel_only(g_fwd4(mmdit_apply_record)),
        vel_only(g_fwd4(mmdit_apply_reuse)),
        vel_only(c_fwd4(mmdit_apply_record)),
        vel_only(c_fwd4(mmdit_apply_reuse)),
        weight_fn, lambda outs: (outs[0],),
    )


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
