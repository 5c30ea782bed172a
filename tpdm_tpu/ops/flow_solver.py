"""Second-order update formulas for the rectified-flow ODE, in fp32.

The reference integrates the flow ODE dx/dsigma = v(x, sigma) with plain
per-sample Euler only (src/models/model_utilis.py:52-74 — ours in
ops/flow_euler.py). These are the matching SECOND-order update rules —
Heun (explicit trapezoid), explicit midpoint, and a two-step
Adams–Bashforth rule — each taking per-sample (b,) sigmas like
`flow_euler_step`, so they compose with per-sample adaptive schedules.

Why they matter: global error drops from O(h) to O(h^2), i.e. matched
trajectory accuracy at roughly half the steps. Heun/midpoint pay 2 model
evaluations per step; AB2 is ONE evaluation per step (Euler cost) using
the previous step's velocity — the same trade DPM-Solver++(2M) makes for
the eps families (ops/dpm_solver.py), here in the velocity/flow
parameterization where the plain polynomial multistep rule is the
standard choice (the flow ODE has no stiff exp(-t) factor to integrate
out, so an exponential integrator buys nothing).

All math runs in float32 and casts back to the sample dtype, matching
`flow_euler_step`'s contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bshape(x: jax.Array, sample: jax.Array) -> jax.Array:
    return x.astype(jnp.float32).reshape(x.shape + (1,) * (sample.ndim - 1))


def flow_heun_combine(
    v0: jax.Array,
    v1: jax.Array,
    sigma_next: jax.Array,
    sigma: jax.Array,
    sample: jax.Array,
) -> jax.Array:
    """Heun (explicit trapezoid) update from velocities at both endpoints.

    ``v0`` is the velocity at (sample, sigma); ``v1`` the velocity at the
    Euler-predicted point (sample + h*v0, sigma_next). The corrector
    averages them: x' = x + h*(v0 + v1)/2. Per-sample sigmas, shape (b,).
    """
    out_dtype = sample.dtype
    h = _bshape(sigma_next - sigma, sample)
    avg = 0.5 * (v0.astype(jnp.float32) + v1.astype(jnp.float32))
    return (sample.astype(jnp.float32) + h * avg).astype(out_dtype)


def flow_ab2_step(
    v: jax.Array,
    v_prev: jax.Array,
    sigma_next: jax.Array,
    sigma: jax.Array,
    sigma_prev: jax.Array,
    sample: jax.Array,
) -> jax.Array:
    """Two-step Adams–Bashforth update (one model evaluation per step).

    Nonuniform-step AB2: with h = sigma_next − sigma and
    h_prev = sigma − sigma_prev,

        x' = x + h * ((1 + w) * v − w * v_prev),   w = h / (2 * h_prev)

    which is second-order accurate for any step-size ratio. Where
    ``h_prev`` is zero per sample (first step, or a sample whose schedule
    has stopped moving) the rule degrades to Euler (w = 0) instead of
    dividing by zero — callers need no special first-step branch.
    """
    out_dtype = sample.dtype
    h = (sigma_next - sigma).astype(jnp.float32)
    h_prev = (sigma - sigma_prev).astype(jnp.float32)
    safe = jnp.where(h_prev == 0.0, 1.0, h_prev)
    w = jnp.where(h_prev == 0.0, 0.0, h / (2.0 * safe))
    h = _bshape(h, sample)
    w = _bshape(w, sample)
    vel = (1.0 + w) * v.astype(jnp.float32) - w * v_prev.astype(jnp.float32)
    return (sample.astype(jnp.float32) + h * vel).astype(out_dtype)
