"""SD1.5 adaptive sampler: integer-timestep TPM scheduling over DPM-Solver++.

Parity with the reference `SD15PredictNextTimeStepModel.forward` loop
(reference: src/models/stable_diffusion_v1_5/modeling_sd_v1_5.py:716-925):

- t starts at 999; each step the TPM's Beta ratio decays it,
  t_next = int(t·ratio) (torch's int-tensor assignment truncates), with
  t_next = 0 and mask = 1 once t < min_time (=10).
- The solver is multistep DPM-Solver++ with per-sample sigma lookups from
  the DDPM table: sigma_s0 = sigmas[t], sigma_s1 = sigmas[t_prev],
  sigma_t = sigmas[t_next] — forced to exactly 0 on the cap step
  (:846-848). Step 0 and per-sample finished entries use the 1st-order
  update; everything else 2nd-order (mask surgery at utilis_sd_v1_5.py:236-261
  becomes a jnp.where select).
- Early break when every t_next == 0 (:871-872) maps to the while cond.

Unlike the reference's replay — which re-runs the full UNet with pinned
(latents, t, ratio) (:990-1003) — the TPU replay is TPM-only over cached
(h_combined, temb, ratio): the pinned inputs make the UNet activations
bit-identical, so caching them is a pure optimization.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpdm_tpu.ops.beta import beta_log_prob, beta_mode, beta_sample
from tpdm_tpu.ops.dpm_solver import (
    ddpm_sigmas_from_betas,
    dpm_first_order_update,
    dpm_second_order_update,
    epsilon_to_x0,
)
from tpdm_tpu.pipeline.sampler import INVALID_LOGPROB


@dataclasses.dataclass(frozen=True)
class SD15SamplerConfig:
    num_inference_steps: int = 25
    min_time: int = 10  # wrapper default (modeling_sd_v1_5.py:269-272)
    epsilon: float = 1e-3
    predict: bool = False
    solver_type: str = "midpoint"
    cache_activations: bool = True
    keep_history: bool = False
    # Optional cap-landing override (ensemble-of-experts base stage): when
    # set, a sample's cap-terminal step lands exactly on this timestep
    # instead of integrating to x0 — the SDXL base expert hands off at the
    # denoising_end cutoff with real noise left for the refiner
    # (serving_families.make_sdxl_ensemble_runner). Must be < min_time so
    # the capped sample terminates on the next iteration.
    cap_floor_time: Optional[int] = None
    # DeepCache-style deep-feature caching (training-free acceleration,
    # approximate): 0/1 = off; N >= 2 refreshes the UNet's deep feature
    # every N steps and reuses it in between (step 0 always full). See
    # UNetConfig.cache_shallow_levels.
    cache_interval: int = 0
    # Input-aware reuse policy (TeaCache-class; see the SD3-side
    # SamplerConfig.cache_tau): > 0 replaces the fixed schedule with the
    # on-device accumulated-latent-change policy over the same full/reuse
    # pair. Mutually exclusive with cache_interval.
    cache_tau: float = 0.0
    # CFG only while the integer timestep t is in [lo, hi) (Kynkäänniemi
    # et al. 2024, t-units for this family): None = guide every step.
    # Outside the window the per-sample weight collapses to 1.0
    # (conditional-only) and, once the whole batch has left it, the
    # uncond tower is skipped entirely. Mutually exclusive with
    # cache_interval.
    guidance_interval: Optional[tuple] = None


class SD15SampleOutput(NamedTuple):
    final_latents: jax.Array  # (b, 4, h, w) at last valid step
    times: jax.Array  # (b, T+1) including the initial 999
    ratios: jax.Array  # (b, T) recorded policy actions
    logprobs: jax.Array  # (b, T)
    prob_masks: jax.Array  # (b, T) bool
    alphas: jax.Array
    betas: jax.Array
    num_steps: jax.Array
    last_valid_index: jax.Array
    h_cache: Optional[jax.Array]  # (T, b, 640, gh, gw)
    temb_cache: Optional[jax.Array]  # (T, b, time_embed_dim)
    history_latents: Optional[jax.Array]


def sd15_adaptive_sample(
    denoise_fn: Callable,  # (latents, t_float) -> (eps_pred, temb, h_combined)
    tpm_fn: Callable,
    init_latents: jax.Array,
    key: jax.Array,
    cfg: SD15SamplerConfig,
    step_caps: Optional[jax.Array] = None,
    init_t: Optional[jax.Array] = None,
    cached=None,  # Optional[pipeline.sampler.CachedDenoise]
) -> SD15SampleOutput:
    """``init_t``: optional (b,) int32 starting timesteps (default all 999,
    the reference's only mode, modeling_sd_v1_5.py:716). Passing
    t0 = strength*999 with init latents DDPM-noised to t0
    (x_t = alpha_t*x0 + sigma_t*eps) is the integer-t image-to-image
    entry; a sample whose init_t is already below ``min_time`` executes
    zero valid steps and returns its init latents.

    ``step_caps``: optional (b,) int32 PER-SAMPLE step caps (serving
    quality/latency knob, same semantics as the SD3 sampler's —
    sampler.py adaptive_sample). Sample i's step ``caps[i]-1`` becomes its
    terminal step: t_next forced to 0, which makes the DPM update take the
    well-defined first-order integrate-to-x0 limit (exactly what the
    global cap step does, modeling_sd_v1_5.py:846-848). Caps are traced,
    so any mix runs on the one compiled shape.

    ``cached``: optional DeepCache denoise pair (pipeline.sampler
    CachedDenoise with fns ``(latents, t, cache) -> (eps, temb, h,
    cache)``); when set ``denoise_fn`` may be None and each step picks
    full vs deep-feature-reuse per ``cached.reuse_steps[step]``."""
    b = init_latents.shape[0]
    T = cfg.num_inference_steps
    dtype = init_latents.dtype
    if cfg.cap_floor_time is not None and cfg.cap_floor_time >= cfg.min_time:
        raise ValueError(
            f"cap_floor_time ({cfg.cap_floor_time}) must be < min_time "
            f"({cfg.min_time}) or the capped sample never terminates"
        )
    sigmas_table = ddpm_sigmas_from_betas()
    if step_caps is None:
        caps = jnp.full((b,), T, jnp.int32)
    else:
        caps = jnp.minimum(step_caps.astype(jnp.int32), T)

    if cached is not None:
        eps_s, temb_s, h_s, _ = jax.eval_shape(
            cached.full_fn, init_latents, jnp.full((b,), 999.0),
            cached.init_delta,
        )
    else:
        eps_s, temb_s, h_s = jax.eval_shape(
            denoise_fn, init_latents, jnp.full((b,), 999.0)
        )

    t0 = (
        jnp.full((b,), 999, jnp.int32)
        if init_t is None
        else jnp.asarray(init_t, jnp.int32).reshape((b,))
    )
    buffers = {
        "times": jnp.zeros((T + 1, b), jnp.int32).at[0].set(t0),
        "ratios": jnp.zeros((T, b), jnp.float32),
        "logprobs": jnp.full((T, b), INVALID_LOGPROB, jnp.float32),
        "masks": jnp.ones((T, b), bool),
        "alphas": jnp.ones((T, b), jnp.float32),
        "betas": jnp.ones((T, b), jnp.float32),
    }
    if cfg.cache_activations:
        buffers["h_cache"] = jnp.zeros((T,) + h_s.shape, h_s.dtype)
        buffers["temb_cache"] = jnp.zeros((T,) + temb_s.shape, temb_s.dtype)
    if cfg.keep_history:
        buffers["history"] = jnp.zeros((T,) + init_latents.shape, dtype)

    state = {
        "step": jnp.int32(0),
        "all_done": jnp.array(False),
        "latents": init_latents,
        "t": t0,
        "t_prev": t0,
        "x0_prev": jnp.zeros_like(init_latents),
        "last_valid": init_latents,
        "key": key,
        **buffers,
    }
    if cached is not None:
        state["cache"] = cached.init_delta
        if cached.tau is not None:
            state["cache_acc"] = jnp.zeros((), jnp.float32)
            state["cache_prev"] = init_latents

    def cond(s):
        return (s["step"] < T) & ~s["all_done"]

    def body(s):
        step, t, latents = s["step"], s["t"], s["latents"]
        if cached is not None:
            if cached.tau is not None:
                # input-aware policy (SamplerConfig.cache_tau semantics):
                # accumulate relative latent change; refresh on overflow
                from tpdm_tpu.pipeline.sampler import _latent_rel_change

                acc = s["cache_acc"] + _latent_rel_change(
                    latents, s["cache_prev"]
                )
                reuse_now = (step > 0) & (acc <= cached.tau)
            else:
                reuse_now = cached.reuse_steps[step]
            eps_pred, temb, h_comb, new_cache = jax.lax.cond(
                reuse_now,
                cached.reuse_fn,
                cached.full_fn,
                latents,
                t.astype(jnp.float32),
                s["cache"],
            )
        else:
            eps_pred, temb, h_comb = denoise_fn(latents, t.astype(jnp.float32))

        raw = tpm_fn(h_comb, temb).astype(jnp.float32)
        alpha, beta = raw[:, 0], raw[:, 1]
        key, sub = jax.random.split(s["key"])
        if cfg.predict:
            ratio = beta_mode(alpha, beta)
        else:
            ratio = beta_sample(sub, alpha, beta)
        ratio = jnp.clip(ratio, cfg.epsilon, 1.0 - cfg.epsilon)

        # torch `t_next[i] = t[i] * ratio` into an int64 tensor truncates
        t_next = (t.astype(jnp.float32) * ratio).astype(jnp.int32)
        logprob = beta_log_prob(alpha, beta, ratio)
        done = t < cfg.min_time
        # per-sample cap: this is sample i's final allowed step — force the
        # terminal integrate-to-x0 transition (t_next=0 => use_first below)
        cap_now = step >= caps - 1
        if cfg.cap_floor_time is None:
            t_next = jnp.where(done | cap_now, 0, t_next)
        else:
            # ensemble base stage: the cap step lands exactly on the
            # cutoff (handoff with real noise left), not on x0
            t_next = jnp.where(cap_now, jnp.int32(cfg.cap_floor_time), t_next)
            t_next = jnp.where(done, 0, t_next)

        # --- per-sample DPM-Solver++ step ---
        lat32 = latents.astype(jnp.float32)
        eps32 = eps_pred.astype(jnp.float32)
        sigma_s0 = sigmas_table[t]
        sigma_s1 = sigmas_table[s["t_prev"]]
        if cfg.cap_floor_time is None:
            sigma_t = jnp.where(
                (step == T - 1) | cap_now, 0.0, sigmas_table[t_next]
            )  # cap step integrates to x0 (modeling_sd_v1_5.py:846-848)
        else:
            # done samples' updates are discarded (last_valid frozen)
            sigma_t = jnp.where(done, 0.0, sigmas_table[t_next])
        x0 = epsilon_to_x0(eps32, lat32, sigma_s0)
        first = dpm_first_order_update(x0, lat32, sigma_t, sigma_s0)
        second = dpm_second_order_update(
            x0, s["x0_prev"], lat32, sigma_t, sigma_s0, sigma_s1,
            solver_type=cfg.solver_type,
        )
        # First-order on: step 0 (no history), finished samples, AND the cap
        # step — the forced sigma_t=0 there makes the 2nd-order D1 term
        # divide by r0=0 (a blow-up latent in the reference's own math at
        # utilis_sd_v1_5.py:170-180 when the cap is reached; first-order at
        # sigma_t=0 is the well-defined integrate-to-x0 limit).
        use_first = (step == 0) | (t_next == 0) | (step == T - 1)
        sel = use_first.reshape((b,) + (1,) * (latents.ndim - 1))
        new_latents = jnp.where(sel, first, second).astype(dtype)

        bcast = done.reshape((b,) + (1,) * (latents.ndim - 1))
        out = dict(s)
        out.update(
            step=step + 1,
            key=key,
            t=t_next,
            t_prev=t,
            x0_prev=x0,
            latents=new_latents,
            last_valid=jnp.where(bcast, s["last_valid"], new_latents),
            all_done=jnp.all(t_next == 0),
            times=s["times"].at[step + 1].set(t_next),
            ratios=s["ratios"].at[step].set(ratio),
            logprobs=s["logprobs"].at[step].set(
                jnp.where(done, INVALID_LOGPROB, logprob)
            ),
            masks=s["masks"].at[step].set(done),
            alphas=s["alphas"].at[step].set(alpha),
            betas=s["betas"].at[step].set(beta),
        )
        if cached is not None:
            out["cache"] = new_cache
            if cached.tau is not None:
                out["cache_acc"] = jnp.where(reuse_now, acc, 0.0)
                out["cache_prev"] = latents
        if cfg.cache_activations:
            out["h_cache"] = s["h_cache"].at[step].set(h_comb)
            out["temb_cache"] = s["temb_cache"].at[step].set(temb)
        if cfg.keep_history:
            out["history"] = s["history"].at[step].set(new_latents)
        return out

    s = jax.lax.while_loop(cond, body, state)

    masks_bt = s["masks"].T
    valid = ~masks_bt
    idx = jnp.arange(T)[None, :]
    last_valid_index = jnp.max(jnp.where(valid, idx, -1), axis=1).astype(jnp.int32)

    return SD15SampleOutput(
        final_latents=s["last_valid"],
        times=s["times"].T,
        ratios=s["ratios"].T,
        logprobs=s["logprobs"].T,
        prob_masks=masks_bt,
        alphas=s["alphas"].T,
        betas=s["betas"].T,
        num_steps=s["step"],
        last_valid_index=last_valid_index,
        h_cache=s.get("h_cache"),
        temb_cache=s.get("temb_cache"),
        history_latents=s.get("history"),
    )


def sd15_replay_logprobs(
    tpm_fn: Callable,
    h_cache: jax.Array,
    temb_cache: jax.Array,
    ratios: jax.Array,  # (b, T) recorded actions
    prob_masks: jax.Array,  # (b, T)
    cfg: SD15SamplerConfig,
) -> jax.Array:
    """Differentiable logprobs of the recorded actions under current TPM
    weights (semantics of the full-UNet replay, modeling_sd_v1_5.py:990-1003,
    without re-running the frozen UNet)."""

    def step_fn(_, inputs):
        h, temb, ratio, mask = inputs
        raw = tpm_fn(h, temb).astype(jnp.float32)
        # Unexecuted steps carry ratio == 0 (buffer default): log(0) = -inf
        # in the masked branch still produces NaN gradients through
        # jnp.where's VJP — sanitize the input instead.
        ratio = jnp.where(mask, 0.5, ratio)
        lp = beta_log_prob(raw[:, 0], raw[:, 1], ratio)
        return None, jnp.where(mask, INVALID_LOGPROB, lp)

    _, lp_tm = jax.lax.scan(
        step_fn, None, (h_cache, temb_cache, ratios.T, prob_masks.T)
    )
    return lp_tm.T
