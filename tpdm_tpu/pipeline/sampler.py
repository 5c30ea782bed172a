"""The adaptive TPDM sampling loop, fully on-device.

Semantics parity with the reference denoising loop
(reference: src/models/stable_diffusion_3/modeling_sd3_pnt.py:508-668) and
its TPM-only replay `only_predict_logprobs` (:670-726), re-architected for
TPU:

- The reference steps a host-side Python loop with per-sample
  `torch.distributions.Beta` draws, caches activations to CPU RAM, and
  breaks out when every sample's sigma falls below `min_sigma`. Here the
  whole rollout is a single `jax.lax.while_loop` under `jit`: Beta draws run
  batched on-device, per-step outputs land in preallocated (T, ...) buffers
  via dynamic index updates, the activation cache stays in HBM, and the loop
  genuinely stops early — the break at :608 maps to the while condition, so
  adaptive schedules save real wall-clock, not just masked steps.
- Each sample still follows its own schedule; samples that finish keep a
  done-mask (`prob_masks`), exactly mirroring the reference's masking
  (mask=1 when the step started with sigma < min_sigma, :582-587).
- The gradient path never touches the rollout: `replay_logprobs` re-runs
  only the TPM over the cached (h_combined, temb) under `lax.scan`,
  differentiable w.r.t. the TPM parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpdm_tpu.ops.beta import (
    beta_log_prob,
    beta_mode,
    beta_sample,
    mode_concentration_to_alpha_beta,
)
from tpdm_tpu.ops.flow_euler import flow_euler_step
from tpdm_tpu.ops.flow_solver import flow_ab2_step, flow_heun_combine

INVALID_LOGPROB = 1.0  # reference: modeling_sd3_pnt.py:615

# denoise_fn(latents (b,c,h,w), sigma (b,)) -> (velocity, temb, h_combined)
# all already CFG-combined; h_combined is the (b, 2*inner, gh, gw) TPM input.
DenoiseFn = Callable[[jax.Array, jax.Array], tuple[jax.Array, jax.Array, jax.Array]]
# tpm_fn(h_combined, temb) -> (b, 2) raw (param1, param2)
TpmFn = Callable[[jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Adaptive-sampler knobs (defaults = reference training configuration).

    Attributes:
        max_inference_steps: rollout cap (reference config.py:25).
        min_sigma: stop threshold; 0.001 model default / 0.01 RLOO wrapper
            default (modeling_sd3_pnt.py:134,734).
        epsilon: ratio clamp margin (modeling_sd3_pnt.py:197).
        relative: sigma_next = sigma*ratio (True) or sigma - ratio.
        prediction_type: "alpha_beta" | "mode_concentration"
            (modeling_sd3_pnt.py:559-563).
        predict: deterministic mode — Beta mode instead of a draw, and
            finished samples pin sigma to 0 (:566-567,584-585).
        cache_activations: keep (h_combined, temb) per step for RL replay.
        keep_history: keep per-step latents (return_full_process_images).
    """

    max_inference_steps: int = 28
    min_sigma: float = 0.001
    epsilon: float = 1e-3
    relative: bool = True
    prediction_type: str = "alpha_beta"
    predict: bool = False
    cache_activations: bool = True
    keep_history: bool = False
    offload_cache: bool = False  # activation cache in pinned host memory
    # Δ-DiT-style residual block caching (training-free acceleration):
    # 0/1 = off; N >= 2 refreshes the back-block residual every N steps and
    # reuses it in between (step 0 is always a full forward). Approximate —
    # the reference has no analogue; see MMDiTConfig.cache_front_blocks.
    cache_interval: int = 0
    # Input-aware residual caching (TeaCache-class, arXiv 2411.19108's
    # idea re-done TPU-first): 0.0 = off; > 0 replaces the FIXED reuse
    # schedule with an on-device policy — accumulate the batch-mean
    # relative L1 change of the latents per step and refresh the cache
    # (full forward) only once the accumulator exceeds the threshold.
    # Full steps land where the trajectory actually turns instead of on a
    # fixed grid. Mutually exclusive with cache_interval.
    cache_tau: float = 0.0
    # CFG only while sigma is in [lo, hi) (Kynkäänniemi et al. 2024):
    # None = guide every step (reference behavior). Outside the window the
    # per-sample weight collapses to 1.0 (conditional-only) and, once the
    # whole batch has left it, the uncond tower is skipped entirely.
    guidance_interval: Optional[tuple] = None
    # Latent integrator: "euler" (the reference's rule) or "ab2" (two-step
    # Adams–Bashforth, ops/flow_solver.py) — second-order accuracy at
    # IDENTICAL cost (the previous velocity rides the loop carry; no extra
    # model eval, so the TPM/activation-cache contract is untouched and
    # replay is unchanged — it reconstructs ratios from recorded sigmas).
    # Each sample's own (sigma_prev, sigma, sigma_next) chain feeds the
    # nonuniform-step formula, so AB2 composes with per-sample adaptive
    # schedules; the first step (h_prev = 0) degrades to Euler inside
    # flow_ab2_step. Heun/midpoint are deliberately fixed-schedule-only:
    # they need a second backbone eval per step, which would also double
    # the TPM activation stream.
    solver: str = "euler"


class CachedDenoise(NamedTuple):
    """Residual-cache denoise pair for the Δ-accelerated sampling paths.

    full_fn / reuse_fn: ``(latents, sigma, delta) -> (velocity, temb,
    h_combined, delta)`` with identical output structure (the lax.cond
    contract); ``reuse_steps[t]`` True means step t reuses the cached Δ.
    Build via pipeline.denoise.make_cfg_denoise_cached_fns.

    ``tau``: optional input-aware policy (SamplerConfig.cache_tau). When
    set, ``reuse_steps`` is ignored: the loop carries an accumulator of
    the batch-mean relative L1 latent change and reuses the cache while
    it stays <= tau (step 0 is always full; a full step resets the
    accumulator). The decision is a traced SCALAR boolean — one lax.cond
    per step, no dynamic shapes, XLA-friendly.
    """

    full_fn: Callable
    reuse_fn: Callable
    init_delta: jax.Array
    reuse_steps: jax.Array  # (T,) bool (ignored when tau is set)
    tau: Optional[float] = None


def _latent_rel_change(lat, prev):
    """Batch-mean relative L1 change |x_t − x_{t−1}|₁ / |x_{t−1}|₁ —
    the input-aware cache policy's per-step signal (computed in fp32 on
    arrays already in loop state: zero extra model FLOPs)."""
    lat32 = lat.astype(jnp.float32)
    prev32 = prev.astype(jnp.float32)
    return jnp.mean(jnp.abs(lat32 - prev32)) / (
        jnp.mean(jnp.abs(prev32)) + 1e-8
    )


def cache_reuse_schedule(T: int, interval: int) -> jnp.ndarray:
    """(T,) bool reuse mask: full forward every ``interval`` steps
    (step 0 always full); everything else reuses the cached residual."""
    if interval < 2:
        return jnp.zeros((T,), bool)
    return (jnp.arange(T) % interval) != 0


class SampleOutput(NamedTuple):
    """Rollout record. Per-step stats are batch-major (b, T) like the
    reference's `CustomDiffusionModelOutput`; large caches stay time-major
    (T, b, ...) — the layout the replay scan consumes.
    """

    init_noise_latents: jax.Array  # (b, c, h, w)
    final_latents: jax.Array  # (b, c, h, w) latents after last valid step
    sigmas: jax.Array  # (b, T) sigma_next recorded each step
    logprobs: jax.Array  # (b, T), INVALID_LOGPROB where masked
    prob_masks: jax.Array  # (b, T) bool, True = step invalid (was done)
    alphas: jax.Array  # (b, T)
    betas: jax.Array  # (b, T)
    num_steps: jax.Array  # () int32, loop iterations actually executed
    last_valid_index: jax.Array  # (b,) int32 per-sample last valid step
    h_cache: Optional[jax.Array]  # (T, b, 2*inner, gh, gw) or None
    temb_cache: Optional[jax.Array]  # (T, b, inner) or None
    history_latents: Optional[jax.Array]  # (T, b, c, h, w) or None


def _raw_to_alpha_beta(raw: jax.Array, prediction_type: str):
    p1, p2 = raw[:, 0], raw[:, 1]
    if prediction_type == "alpha_beta":
        return p1, p2
    if prediction_type == "mode_concentration":
        return mode_concentration_to_alpha_beta(p1, p2)
    raise ValueError(f"unknown prediction_type: {prediction_type}")


def _clamp_ratio(ratio: jax.Array, sigma: jax.Array, cfg: SamplerConfig):
    if cfg.relative:
        return jnp.clip(ratio, cfg.epsilon, 1.0 - cfg.epsilon)
    # absolute: clamp to [eps, sigma] then [0, 1-eps] (modeling_sd3_pnt.py:570-574)
    return jnp.clip(jnp.clip(ratio, cfg.epsilon, sigma), 0.0, 1.0 - cfg.epsilon)


def adaptive_sample(
    denoise_fn: DenoiseFn,
    tpm_fn: TpmFn,
    init_latents: jax.Array,
    key: jax.Array,
    cfg: SamplerConfig,
    step_caps: Optional[jax.Array] = None,
    init_sigma: Optional[jax.Array] = None,
    project_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
    cached: Optional[CachedDenoise] = None,
) -> SampleOutput:
    """Run the adaptive, self-terminating denoise loop.

    Everything happens inside one jittable while_loop; call under jit.

    Args:
        step_caps: optional (b,) int32 PER-SAMPLE step caps (a serving
            quality/latency knob beyond the reference, which only has the
            global ``max_inference_steps``). Sample i is masked done once
            it has executed ``step_caps[i]`` steps; the loop still runs to
            the batch max (a traced value, so ONE compiled shape serves
            every cap mix). None = everyone runs to ``max_inference_steps``.
        init_sigma: optional (b,) float starting noise levels (default all
            1.0 = pure noise, the reference's only mode,
            modeling_sd3_pnt.py:508). Passing sigma_0 < 1 with
            ``init_latents = (1-sigma_0)*x0 + sigma_0*eps`` is the
            flow-matching image-to-image (SDEdit) entry: the schedule policy
            then adapts from that partial noise level. A sample whose
            init_sigma is already below ``min_sigma`` executes zero valid
            steps and returns its init latents.
        project_fn: optional ``(latents (b,c,h,w), sigma_next (b,)) ->
            latents`` constraint applied after every Euler step — the
            inpainting hook: re-impose the known region at the step's new
            noise level (``m*lat + (1-m)*((1-sigma)*x0 + sigma*eps)``),
            RePaint-style. Must be jit-traceable; identity when None.
        cached: optional residual-cache denoise pair (Δ-DiT-style). When
            set, ``denoise_fn`` may be None; each step dispatches to
            full_fn or reuse_fn per ``cached.reuse_steps[step]`` via
            lax.cond (one branch executes — reuse steps really skip the
            back blocks' FLOPs), with Δ carried in the loop state.
    """
    b = init_latents.shape[0]
    T = cfg.max_inference_steps
    dtype = init_latents.dtype
    if step_caps is None:
        caps = jnp.full((b,), T, jnp.int32)
    else:
        caps = jnp.minimum(step_caps.astype(jnp.int32), T)

    # Probe shapes once (outside the loop, via eval_shape — no FLOPs).
    if cached is not None:
        vel_s, temb_s, h_s, _ = jax.eval_shape(
            cached.full_fn, init_latents, jnp.ones((b,), dtype),
            cached.init_delta,
        )
    else:
        vel_s, temb_s, h_s = jax.eval_shape(
            denoise_fn, init_latents, jnp.ones((b,), dtype)
        )

    buffers = {
        "sigmas": jnp.zeros((T, b), jnp.float32),
        "logprobs": jnp.full((T, b), INVALID_LOGPROB, jnp.float32),
        "masks": jnp.ones((T, b), bool),
        "alphas": jnp.ones((T, b), jnp.float32),
        "betas": jnp.ones((T, b), jnp.float32),
    }
    host_put = None
    if cfg.cache_activations:
        h_buf = jnp.zeros((T,) + h_s.shape, h_s.dtype)
        temb_buf = jnp.zeros((T,) + temb_s.shape, temb_s.dtype)
        if cfg.offload_cache:
            # Activation cache lives in pinned host memory: the rollout
            # streams one step's activations out per iteration instead of
            # holding T x (b, 2*inner, gh, gw) in HBM (the reference ships
            # the cache to CPU RAM too, modeling_sd3_pnt.py:553 — here the
            # transfer is an XLA-scheduled DMA, not a blocking .cpu()).
            from jax.sharding import SingleDeviceSharding

            host = SingleDeviceSharding(
                jax.devices()[0], memory_kind="pinned_host"
            )
            host_put = lambda x: jax.device_put(x, host)
            h_buf = host_put(h_buf)
            temb_buf = host_put(temb_buf)
        buffers["h_cache"] = h_buf
        buffers["temb_cache"] = temb_buf
    if cfg.keep_history:
        buffers["history"] = jnp.zeros((T,) + init_latents.shape, dtype)

    if cfg.solver not in ("euler", "ab2"):
        raise ValueError(
            f"adaptive sampler supports solver 'euler' or 'ab2', got "
            f"{cfg.solver!r} (heun/midpoint need a second model eval per "
            f"step — fixed-schedule only)"
        )
    sigma0 = (
        jnp.ones((b,), jnp.float32)
        if init_sigma is None
        else jnp.asarray(init_sigma, jnp.float32).reshape((b,))
    )
    state = {
        "step": jnp.int32(0),
        "all_done": jnp.array(False),
        "latents": init_latents,
        "sigma": sigma0,
        "last_valid": init_latents,
        "key": key,
        **buffers,
    }
    if cfg.solver == "ab2":
        # Previous-step velocity + its sigma; sigma_prev starts equal to
        # sigma0 so the first step has h_prev = 0 and runs plain Euler.
        state["v_prev"] = jnp.zeros_like(init_latents)
        state["sigma_prev"] = sigma0
    if cached is not None:
        state["delta"] = cached.init_delta
        if cached.tau is not None:
            # input-aware policy state: change accumulator + previous
            # latents (the signal's reference point)
            state["cache_acc"] = jnp.zeros((), jnp.float32)
            state["cache_prev"] = init_latents

    def cond(s):
        return (s["step"] < T) & ~s["all_done"]

    def body(s):
        step, sigma, latents = s["step"], s["sigma"], s["latents"]
        if cached is not None:
            if cached.tau is not None:
                acc = s["cache_acc"] + _latent_rel_change(
                    latents, s["cache_prev"]
                )
                reuse_now = (step > 0) & (acc <= cached.tau)
            else:
                reuse_now = cached.reuse_steps[step]
            velocity, temb, h_comb, new_delta = jax.lax.cond(
                reuse_now,
                cached.reuse_fn,
                cached.full_fn,
                latents,
                sigma.astype(dtype),
                s["delta"],
            )
        else:
            velocity, temb, h_comb = denoise_fn(latents, sigma.astype(dtype))

        raw = tpm_fn(h_comb, temb)
        alpha, beta = _raw_to_alpha_beta(raw.astype(jnp.float32), cfg.prediction_type)

        key, sub = jax.random.split(s["key"])
        if cfg.predict:
            ratio = beta_mode(alpha, beta)
        else:
            ratio = beta_sample(sub, alpha, beta)
        ratio = _clamp_ratio(ratio, sigma, cfg)

        sigma_next = sigma * ratio if cfg.relative else sigma - ratio
        logprob = beta_log_prob(alpha, beta, ratio)
        # done BEFORE this step -> step invalid (per-sample cap counts the
        # same way: a sample that already executed caps[i] steps is done)
        done = (sigma < cfg.min_sigma) | (step >= caps)
        if cfg.predict:
            sigma_next = jnp.where(done, 0.0, sigma_next)

        if cfg.solver == "ab2":
            new_latents = flow_ab2_step(
                velocity, s["v_prev"], sigma_next, sigma, s["sigma_prev"],
                latents,
            )
        else:
            new_latents = flow_euler_step(velocity, sigma_next, sigma, latents)
        if project_fn is not None:
            new_latents = project_fn(new_latents, sigma_next)

        bcast = done.reshape((b,) + (1,) * (latents.ndim - 1))
        out = dict(s)
        out.update(
            step=step + 1,
            key=key,
            sigma=sigma_next,
            latents=new_latents,
            last_valid=jnp.where(bcast, s["last_valid"], new_latents),
            all_done=jnp.all((sigma_next < cfg.min_sigma) | (step + 1 >= caps)),
            sigmas=s["sigmas"].at[step].set(sigma_next),
            logprobs=s["logprobs"].at[step].set(
                jnp.where(done, INVALID_LOGPROB, logprob)
            ),
            masks=s["masks"].at[step].set(done),
            alphas=s["alphas"].at[step].set(alpha),
            betas=s["betas"].at[step].set(beta),
        )
        if cfg.solver == "ab2":
            out["v_prev"] = velocity
            out["sigma_prev"] = sigma
        if cached is not None:
            out["delta"] = new_delta
            if cached.tau is not None:
                # a full step resets the accumulator; a reuse step keeps
                # integrating from the same reference point
                out["cache_acc"] = jnp.where(reuse_now, acc, 0.0)
                out["cache_prev"] = latents
        if cfg.cache_activations:
            h_w, t_w = (
                (host_put(h_comb), host_put(temb)) if host_put else (h_comb, temb)
            )
            out["h_cache"] = s["h_cache"].at[step].set(h_w)
            out["temb_cache"] = s["temb_cache"].at[step].set(t_w)
        if cfg.keep_history:
            out["history"] = s["history"].at[step].set(new_latents)
        return out

    s = jax.lax.while_loop(cond, body, state)

    masks_bt = s["masks"].T  # (b, T)
    # last step index j with mask[j] == False, per sample
    valid = ~masks_bt
    idx = jnp.arange(T)[None, :]
    last_valid_index = jnp.max(jnp.where(valid, idx, -1), axis=1).astype(jnp.int32)

    return SampleOutput(
        init_noise_latents=init_latents,
        final_latents=s["last_valid"],
        sigmas=s["sigmas"].T,
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


def replay_logprobs(
    tpm_fn: TpmFn,
    h_cache: jax.Array,  # (T, b, 2*inner, gh, gw)
    temb_cache: jax.Array,  # (T, b, inner)
    fix_sigmas: jax.Array,  # (b, T) — the rollout's recorded sigmas
    cfg: SamplerConfig,
    init_sigma: Optional[jax.Array] = None,  # (b,) rollout starting sigmas
) -> jax.Array:
    """Recompute per-step logprobs with current TPM weights (differentiable).

    Parity with `only_predict_logprobs` (modeling_sd3_pnt.py:670-726): only
    the TPM runs; the ratio is reconstructed from the recorded sigma chain.
    Returns (b, T) with INVALID_LOGPROB at masked positions. (Unlike the
    reference, the mode_concentration remap is applied here too — the
    reference replay skips it, which would desynchronize rollout and replay
    for that prediction_type; alpha_beta behavior is identical.)
    """
    b = fix_sigmas.shape[0]
    sigmas_tm = fix_sigmas.T  # (T, b)

    to_device = None
    if cfg.offload_cache:
        # Stream each step's activations back from pinned host memory
        # (experimental; single-device placement).
        from jax.sharding import SingleDeviceSharding

        dev_sharding = SingleDeviceSharding(
            jax.devices()[0], memory_kind="device"
        )
        to_device = lambda x: jax.device_put(x, dev_sharding)

    def step_fn(sigma, inputs):
        h, temb, sigma_next = inputs
        if to_device is not None:
            h, temb = to_device(h), to_device(temb)
        raw = tpm_fn(h, temb)
        alpha, beta = _raw_to_alpha_beta(raw.astype(jnp.float32), cfg.prediction_type)
        done = sigma < cfg.min_sigma
        # Trailing unexecuted steps carry sigma == sigma_next == 0 (buffer
        # defaults): sanitize BEFORE log_prob — jnp.where alone does not stop
        # NaN/inf from the masked branch poisoning gradients in the VJP.
        safe_sigma = jnp.where(done, 1.0, sigma)
        ratio = sigma_next / safe_sigma if cfg.relative else sigma - sigma_next
        ratio = jnp.clip(ratio, cfg.epsilon, 1.0 - cfg.epsilon)
        ratio = jnp.where(done, 0.5, ratio)
        logprob = jnp.where(
            done, INVALID_LOGPROB, beta_log_prob(alpha, beta, ratio)
        )
        return sigma_next, logprob

    sigma0 = (
        jnp.ones((b,), jnp.float32)
        if init_sigma is None
        else jnp.asarray(init_sigma, jnp.float32).reshape((b,))
    )
    _, logprobs_tm = jax.lax.scan(
        step_fn, sigma0, (h_cache, temb_cache, sigmas_tm)
    )
    return logprobs_tm.T  # (b, T)


def fixed_schedule_sample(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    init_latents: jax.Array,
    sigmas: jax.Array,  # (T,) descending ladder, no terminal zero
) -> jax.Array:
    """Baseline fixed-schedule Euler flow sampler (no TPM).

    The 28-step diffusers-equivalent baseline the reference's headline claim
    is measured against; used by bench.py. `denoise_fn` here returns just the
    guided velocity.
    """
    b = init_latents.shape[0]
    sig = jnp.concatenate([sigmas.astype(jnp.float32), jnp.zeros((1,))])

    def step_fn(latents, i):
        s = jnp.full((b,), sig[i])
        s_next = jnp.full((b,), sig[i + 1])
        velocity = denoise_fn(latents, s.astype(latents.dtype))
        return flow_euler_step(velocity, s_next, s, latents), None

    out, _ = jax.lax.scan(step_fn, init_latents, jnp.arange(sigmas.shape[0]))
    return out


FLOW_SOLVERS = ("euler", "heun", "midpoint", "ab2")


def solver_nfe(num_steps: int, solver: str) -> int:
    """Model evaluations a fixed-schedule run costs: euler/ab2 = T,
    midpoint = 2T, heun = 2T−1 (the terminal step to sigma=0 is Euler)."""
    return {
        "euler": num_steps,
        "ab2": num_steps,
        "midpoint": 2 * num_steps,
        "heun": 2 * num_steps - 1,
    }[solver]


def fixed_schedule_sample_heun(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    init_latents: jax.Array,
    sigmas: jax.Array,  # (T,) descending ladder, no terminal zero
) -> jax.Array:
    """Heun (explicit trapezoid) fixed-schedule flow sampler.

    Second-order: Euler predictor to sigma_next, velocity re-evaluated
    there, trapezoid corrector (ops/flow_solver.py). The terminal step to
    sigma=0 stays first-order Euler (EDM convention — no model evaluation
    at exactly zero noise), so T steps cost 2T−1 evaluations.
    """
    b = init_latents.shape[0]
    sig = jnp.concatenate([sigmas.astype(jnp.float32), jnp.zeros((1,))])

    def step_fn(latents, i):
        s = jnp.full((b,), sig[i])
        s_next = jnp.full((b,), sig[i + 1])
        v0 = denoise_fn(latents, s.astype(latents.dtype))
        pred = flow_euler_step(v0, s_next, s, latents)

        def correct(_):
            v1 = denoise_fn(pred, s_next.astype(latents.dtype))
            return flow_heun_combine(v0, v1, s_next, s, latents)

        out = jax.lax.cond(sig[i + 1] > 0.0, correct, lambda _: pred, None)
        return out, None

    out, _ = jax.lax.scan(step_fn, init_latents, jnp.arange(sigmas.shape[0]))
    return out


def fixed_schedule_sample_midpoint(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    init_latents: jax.Array,
    sigmas: jax.Array,  # (T,) descending ladder, no terminal zero
) -> jax.Array:
    """Explicit-midpoint fixed-schedule flow sampler (second-order, 2T
    evaluations; never evaluates the model at sigma=0 — the midpoint of
    the terminal step is sigma/2 > 0)."""
    b = init_latents.shape[0]
    sig = jnp.concatenate([sigmas.astype(jnp.float32), jnp.zeros((1,))])

    def step_fn(latents, i):
        s = jnp.full((b,), sig[i])
        s_next = jnp.full((b,), sig[i + 1])
        s_mid = 0.5 * (s + s_next)
        v0 = denoise_fn(latents, s.astype(latents.dtype))
        x_mid = flow_euler_step(v0, s_mid, s, latents)
        v1 = denoise_fn(x_mid, s_mid.astype(latents.dtype))
        return flow_euler_step(v1, s_next, s, latents), None

    out, _ = jax.lax.scan(step_fn, init_latents, jnp.arange(sigmas.shape[0]))
    return out


def fixed_schedule_sample_ab2(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    init_latents: jax.Array,
    sigmas: jax.Array,  # (T,) descending ladder, no terminal zero
) -> jax.Array:
    """Two-step Adams–Bashforth fixed-schedule flow sampler.

    Second-order at EULER COST — one model evaluation per step, the
    previous step's velocity rides the scan carry (the flow-family analogue
    of DPM-Solver++(2M) in ops/dpm_solver.py). The first step degrades to
    Euler inside `flow_ab2_step` (h_prev = 0 ⇒ w = 0).
    """
    b = init_latents.shape[0]
    sig = jnp.concatenate([sigmas.astype(jnp.float32), jnp.zeros((1,))])

    def step_fn(carry, i):
        latents, v_prev = carry
        s = jnp.full((b,), sig[i])
        s_next = jnp.full((b,), sig[i + 1])
        s_prev = jnp.full((b,), sig[jnp.maximum(i - 1, 0)])
        v = denoise_fn(latents, s.astype(latents.dtype))
        out = flow_ab2_step(v, v_prev, s_next, s, s_prev, latents)
        return (out, v.astype(v_prev.dtype)), None

    (out, _), _ = jax.lax.scan(
        step_fn,
        (init_latents, jnp.zeros_like(init_latents)),
        jnp.arange(sigmas.shape[0]),
    )
    return out


def fixed_schedule_sample_solver(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    init_latents: jax.Array,
    sigmas: jax.Array,
    solver: str = "euler",
) -> jax.Array:
    """Dispatch a fixed-schedule flow run to the named solver
    (one of FLOW_SOLVERS)."""
    try:
        fn = {
            "euler": fixed_schedule_sample,
            "heun": fixed_schedule_sample_heun,
            "midpoint": fixed_schedule_sample_midpoint,
            "ab2": fixed_schedule_sample_ab2,
        }[solver]
    except KeyError:
        raise ValueError(f"unknown flow solver {solver!r}; pick from {FLOW_SOLVERS}")
    return fn(denoise_fn, init_latents, sigmas)


def fixed_schedule_sample_cached(
    full_fn: Callable,  # (latents, sigma, delta) -> (velocity, delta)
    reuse_fn: Callable,
    init_latents: jax.Array,
    sigmas: jax.Array,  # (T,) descending ladder, no terminal zero
    init_delta: jax.Array,
    reuse_steps: jax.Array,  # (T,) bool — True = reuse the cached residual
) -> jax.Array:
    """Δ-accelerated fixed-schedule Euler sampler (training-free, approximate).

    Same ladder semantics as :func:`fixed_schedule_sample`; each step picks
    full vs cached-residual forward per ``reuse_steps`` (one branch executes
    under lax.cond — reuse steps skip the back blocks' FLOPs). With
    ``reuse_steps`` all-False the output matches the uncached sampler to
    cross-program tolerance (pinned in tests/test_cache_accel.py; the cond
    restructures XLA's fusion, so 1-ulp-class drift is expected).
    """
    b = init_latents.shape[0]
    sig = jnp.concatenate([sigmas.astype(jnp.float32), jnp.zeros((1,))])

    def step_fn(carry, i):
        latents, delta = carry
        s = jnp.full((b,), sig[i])
        s_next = jnp.full((b,), sig[i + 1])
        velocity, delta = jax.lax.cond(
            reuse_steps[i], reuse_fn, full_fn,
            latents, s.astype(latents.dtype), delta,
        )
        return (flow_euler_step(velocity, s_next, s, latents), delta), None

    (out, _), _ = jax.lax.scan(
        step_fn, (init_latents, init_delta), jnp.arange(sigmas.shape[0])
    )
    return out


def fixed_schedule_sample_autocached(
    full_fn: Callable,  # (latents, sigma, delta) -> (velocity, delta)
    reuse_fn: Callable,
    init_latents: jax.Array,
    sigmas: jax.Array,  # (T,) descending ladder, no terminal zero
    init_delta: jax.Array,
    tau: float,
):
    """Input-aware Δ-accelerated fixed-schedule sampler (TeaCache-class).

    Same ladder as :func:`fixed_schedule_sample_cached`, but the reuse
    decision is made ON DEVICE per step: accumulate the batch-mean
    relative L1 latent change since the last full forward and refresh the
    cache once it exceeds ``tau`` (step 0 always full). Full steps land
    where the trajectory turns fastest — early high-sigma steps — instead
    of on a fixed grid; tau=0 degenerates to the exact uncached sampler.

    Returns ``(final_latents, n_full)`` where ``n_full`` is the number of
    full forwards actually taken (the NFE-equivalent for cost accounting).
    """
    b = init_latents.shape[0]
    sig = jnp.concatenate([sigmas.astype(jnp.float32), jnp.zeros((1,))])

    def step_fn(carry, i):
        latents, delta, acc, prev, n_full = carry
        acc = acc + _latent_rel_change(latents, prev)
        reuse_now = (i > 0) & (acc <= tau)
        s = jnp.full((b,), sig[i])
        s_next = jnp.full((b,), sig[i + 1])
        velocity, delta = jax.lax.cond(
            reuse_now, reuse_fn, full_fn,
            latents, s.astype(latents.dtype), delta,
        )
        nxt = flow_euler_step(velocity, s_next, s, latents)
        return (
            nxt,
            delta,
            jnp.where(reuse_now, acc, 0.0),
            latents,
            n_full + jnp.where(reuse_now, 0, 1),
        ), None

    (out, _, _, _, n_full), _ = jax.lax.scan(
        step_fn,
        (
            init_latents,
            init_delta,
            jnp.zeros((), jnp.float32),
            init_latents,
            jnp.zeros((), jnp.int32),
        ),
        jnp.arange(sigmas.shape[0]),
    )
    return out, n_full
