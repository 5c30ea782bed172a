"""DPM-Solver++ (1st/2nd order) with per-sample continuous sigmas.

The SD1.5 TPDM variant needs a multistep solver where every batch element
sits at its own (sigma_t, sigma_s0, sigma_s1) — the reference rewrote
diffusers' DPMSolverMultistepScheduler for exactly this
(reference: src/models/stable_diffusion_v1_5/utilis_sd_v1_5.py:40-266).
Here each update is a pure vectorized function; the sampler carries the
model-output history and mixes 1st/2nd-order results per sample with
`jnp.where` instead of the reference's boolean-mask tensor surgery
(:236-261).

Math (https://arxiv.org/abs/2211.01095, VP parametrization):
    alpha(sigma) = 1/sqrt(1+sigma^2),  sigma_t = sigma·alpha,
    lambda = log(alpha) − log(sigma_t) = −log(sigma).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigma_to_alpha_sigma_t(sigma: jax.Array) -> tuple[jax.Array, jax.Array]:
    """diffusers `_sigma_to_alpha_sigma_t`: VP alpha_t and noise scale."""
    alpha_t = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    return alpha_t, sigma * alpha_t


def _bcast(v: jax.Array, like: jax.Array) -> jax.Array:
    return v.reshape(v.shape + (1,) * (like.ndim - 1))


def epsilon_to_x0(
    model_output: jax.Array, sample: jax.Array, sigma: jax.Array
) -> jax.Array:
    """epsilon-prediction -> x0 (data) prediction, per-sample sigma.

    Parity: customized_convert_model_output (utilis_sd_v1_5.py:63-83),
    prediction_type="epsilon", dpmsolver++.
    """
    alpha_t, sigma_t = sigma_to_alpha_sigma_t(sigma)
    return (sample - _bcast(sigma_t, sample) * model_output) / _bcast(
        alpha_t, sample
    )


def dpm_first_order_update(
    x0: jax.Array,
    sample: jax.Array,
    sigma_t: jax.Array,
    sigma_s: jax.Array,
    noise: jax.Array | None = None,
    sde: bool = False,
) -> jax.Array:
    """DPM-Solver++(1) a.k.a. DDIM in x0 form (utilis_sd_v1_5.py:85-130)."""
    a_t, s_t = sigma_to_alpha_sigma_t(sigma_t)
    a_s, s_s = sigma_to_alpha_sigma_t(sigma_s)
    lam_t = jnp.log(a_t) - jnp.log(s_t)
    lam_s = jnp.log(a_s) - jnp.log(s_s)
    h = lam_t - lam_s
    if not sde:
        return _bcast(s_t / s_s, sample) * sample - _bcast(
            a_t * (jnp.exp(-h) - 1.0), sample
        ) * x0
    assert noise is not None
    return (
        _bcast(s_t / s_s * jnp.exp(-h), sample) * sample
        + _bcast(a_t * (1.0 - jnp.exp(-2.0 * h)), sample) * x0
        + _bcast(s_t * jnp.sqrt(1.0 - jnp.exp(-2.0 * h)), sample) * noise
    )


def dpm_second_order_update(
    x0: jax.Array,  # m0: current x0 prediction
    x0_prev: jax.Array,  # m1: previous x0 prediction
    sample: jax.Array,
    sigma_t: jax.Array,
    sigma_s0: jax.Array,
    sigma_s1: jax.Array,
    noise: jax.Array | None = None,
    solver_type: str = "midpoint",
    sde: bool = False,
) -> jax.Array:
    """Multistep DPM-Solver++(2M) (utilis_sd_v1_5.py:132-204)."""
    a_t, s_t = sigma_to_alpha_sigma_t(sigma_t)
    a_s0, s_s0 = sigma_to_alpha_sigma_t(sigma_s0)
    a_s1, s_s1 = sigma_to_alpha_sigma_t(sigma_s1)
    lam_t = jnp.log(a_t) - jnp.log(s_t)
    lam_s0 = jnp.log(a_s0) - jnp.log(s_s0)
    lam_s1 = jnp.log(a_s1) - jnp.log(s_s1)

    h = lam_t - lam_s0
    h_0 = lam_s0 - lam_s1
    r0 = h_0 / h
    d0 = x0
    d1 = (x0 - x0_prev) / _bcast(r0, sample)

    if not sde:
        base = _bcast(s_t / s_s0, sample) * sample - _bcast(
            a_t * (jnp.exp(-h) - 1.0), sample
        ) * d0
        if solver_type == "midpoint":
            return base - 0.5 * _bcast(a_t * (jnp.exp(-h) - 1.0), sample) * d1
        if solver_type == "heun":
            return base + _bcast(
                a_t * ((jnp.exp(-h) - 1.0) / h + 1.0), sample
            ) * d1
        raise ValueError(solver_type)

    assert noise is not None
    base = (
        _bcast(s_t / s_s0 * jnp.exp(-h), sample) * sample
        + _bcast(a_t * (1.0 - jnp.exp(-2.0 * h)), sample) * d0
        + _bcast(s_t * jnp.sqrt(1.0 - jnp.exp(-2.0 * h)), sample) * noise
    )
    if solver_type == "midpoint":
        return base + 0.5 * _bcast(a_t * (1.0 - jnp.exp(-2.0 * h)), sample) * d1
    if solver_type == "heun":
        return base + _bcast(
            a_t * ((1.0 - jnp.exp(-2.0 * h)) / (-2.0 * h) + 1.0), sample
        ) * d1
    raise ValueError(solver_type)


def ddpm_sigmas_from_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    schedule: str = "scaled_linear",
) -> jax.Array:
    """The SD1.5 training-noise table: sigma_i = sqrt((1-ᾱ_i)/ᾱ_i).

    Parity with diffusers DDPM scaled_linear betas (the `all_sigmas` table
    the reference indexes by integer timestep, utilis_sd_v1_5.py:47-48).
    """
    if schedule == "scaled_linear":
        betas = (
            jnp.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps,
                dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32,
            )
            ** 2
        )
    elif schedule == "linear":
        betas = jnp.linspace(beta_start, beta_end, num_train_timesteps)
    else:
        raise ValueError(schedule)
    alphas_cumprod = jnp.cumprod(1.0 - betas)
    return jnp.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)


def sigma_of_timestep(sigmas_table: jax.Array, t: jax.Array) -> jax.Array:
    """sigma at (possibly fractional) timestep t via linear interpolation.

    The reference indexes the table with integer timesteps
    (utilis_sd_v1_5.py:47-48); the TPM's continuous t = t_prev·ratio needs
    interpolation to stay on-device and differentiable-free.
    """
    t = jnp.clip(t, 0.0, sigmas_table.shape[0] - 1.0)
    lo = jnp.floor(t).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, sigmas_table.shape[0] - 1)
    frac = t - lo
    return sigmas_table[lo] * (1.0 - frac) + sigmas_table[hi] * frac
