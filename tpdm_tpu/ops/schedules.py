"""Reference noise schedules for the KL anchor and fixed-step baselines."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

EPSILON = 1e-3
CONCENTRATION = 20.0
_E = math.e


def get_ref_beta(
    sigmas: jax.Array, num_steps: int = 28
) -> tuple[jax.Array, jax.Array]:
    """Per-sigma reference Beta(alpha, beta) anchor for the KL penalty.

    Expresses "the uniform num_steps flow schedule" as a Beta prior over the
    decay ratio: map sigma -> t through the SD3 shift curve
    t = sigma/(e + (1−e)·sigma), step t down by 1/num_steps (clamped at
    EPSILON), map back to sigma', and center a concentration-20 Beta at the
    mode sigma'/sigma. Parity with the reference
    (src/models/reference_distributions.py:9-19).

    Args:
        sigmas: current noise levels, any shape.
        num_steps: the uniform schedule length being mimicked.

    Returns:
        (alpha, beta) arrays of the same shape as `sigmas`.
    """
    t_1 = sigmas / (_E + (1.0 - _E) * sigmas)
    t_2 = jnp.clip(t_1 - 1.0 / num_steps, min=EPSILON)
    sigmas_2 = _E / (_E + 1.0 / t_2 - 1.0)
    mode = sigmas_2 / sigmas

    alpha = mode * (CONCENTRATION - 2.0) + 1.0
    beta = (1.0 - mode) * (CONCENTRATION - 2.0) + 1.0
    return alpha, beta


def uniform_flow_sigmas(num_steps: int = 28, shift: float = 3.0) -> jax.Array:
    """The fixed num_steps flow-matching sigma ladder used by SD3.

    sigma_i = shift·t_i / (1 + (shift−1)·t_i) with t descending linearly from
    sigma_max=1.0 to sigma_min=1/1000 — the FlowMatchEulerDiscreteScheduler
    ladder the reference inherits from diffusers (shift=3.0 is SD3-medium's
    scheduler config; num_train_timesteps=1000 sets sigma_min). Used for the
    fixed-28-step Euler baseline in benchmarks.

    Returns:
        sigmas of shape (num_steps,), descending from 1.0; append a terminal
        0.0 yourself when integrating to the clean image.
    """
    t = jnp.linspace(1.0, 1.0 / 1000.0, num_steps)
    return shift * t / (1.0 + (shift - 1.0) * t)


def img2img_sigmas(
    num_steps: int, strength: float, shift: float = 3.0
) -> jax.Array:
    """Fixed-schedule ladder starting at noise level ``strength``.

    The image-to-image (SDEdit) companion of `uniform_flow_sigmas`: the first
    sigma equals ``strength`` (the level the init latents were noised to via
    ``(1-s)*x0 + s*eps``); the ladder then follows the same shifted-t curve
    down to sigma_min. strength=1.0 reproduces `uniform_flow_sigmas` exactly.
    Inverts sigma = shift*t / (1+(shift-1)*t) to find the starting t.
    """
    if not (0.0 < strength <= 1.0):
        raise ValueError(f"strength must be in (0, 1], got {strength}")
    t0 = strength / (shift - (shift - 1.0) * strength)
    t = jnp.linspace(t0, 1.0 / 1000.0, num_steps)
    return shift * t / (1.0 + (shift - 1.0) * t)
