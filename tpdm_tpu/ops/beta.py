"""Beta-distribution math, fully vectorized for TPU.

The TPDM policy head emits per-sample Beta(alpha, beta) parameters; the
sampler needs log_prob / mode / sample, the trainer needs entropy and the
closed-form Beta-Beta KL. The reference computes these one sample at a time
through `torch.distributions.Beta` in Python loops (reference:
src/models/stable_diffusion_3/modeling_sd3_pnt.py:558-589 and
src/train/train_utilis.py:6-20); here everything is an elementwise jnp
expression that vectorizes over arbitrary batch/step shapes and stays inside
`jit`/`scan`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln


def _betaln(alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """log B(alpha, beta) = log Γ(a) + log Γ(b) − log Γ(a+b)."""
    return gammaln(alpha) + gammaln(beta) - gammaln(alpha + beta)


def beta_log_prob(alpha: jax.Array, beta: jax.Array, x: jax.Array) -> jax.Array:
    """Log-density of Beta(alpha, beta) at x ∈ (0, 1). Elementwise."""
    return (
        (alpha - 1.0) * jnp.log(x)
        + (beta - 1.0) * jnp.log1p(-x)
        - _betaln(alpha, beta)
    )


def beta_mode(alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """Mode of Beta(alpha, beta) for alpha, beta > 1: (a−1)/(a+b−2).

    The TPM head guarantees alpha, beta > 1 by construction (exp(x) + eps
    with eps >= 1), so the interior-mode formula always applies.
    """
    return (alpha - 1.0) / (alpha + beta - 2.0)


def beta_mean(alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """Mean of Beta(alpha, beta): a/(a+b)."""
    return alpha / (alpha + beta)


def beta_entropy(alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """Differential entropy of Beta(alpha, beta)."""
    total = alpha + beta
    return (
        _betaln(alpha, beta)
        - (alpha - 1.0) * digamma(alpha)
        - (beta - 1.0) * digamma(beta)
        + (total - 2.0) * digamma(total)
    )


def beta_kl(
    alpha1: jax.Array, beta1: jax.Array, alpha2: jax.Array, beta2: jax.Array
) -> jax.Array:
    """Closed-form KL( Beta(a1,b1) || Beta(a2,b2) ).

    Matches the reference closed form (src/train/train_utilis.py:6-20, which
    is itself self-checked against torch.distributions.kl_divergence).
    """
    b1 = _betaln(alpha1, beta1)
    b2 = _betaln(alpha2, beta2)
    return (
        (b2 - b1)
        + (alpha1 - alpha2) * digamma(alpha1)
        + (beta1 - beta2) * digamma(beta1)
        - (alpha1 - alpha2 + beta1 - beta2) * digamma(alpha1 + beta1)
    )


def beta_sample(
    key: jax.Array, alpha: jax.Array, beta: jax.Array, shape=None
) -> jax.Array:
    """Draw Beta(alpha, beta) samples on-device (threefry; two-Gamma method).

    Replaces the reference's per-sample host-side
    `torch.distributions.Beta(...).sample()` loop
    (modeling_sd3_pnt.py:558-569) with a single batched draw that is legal
    inside `lax.scan`.
    """
    return jax.random.beta(key, alpha, beta, shape=shape)


def mode_concentration_to_alpha_beta(
    mode: jax.Array, concentration: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Map (mode, concentration) -> (alpha, beta).

    alpha = mode·(c−2)+1, beta = (1−mode)·(c−2)+1 — the
    `prediction_type="mode_concentration"` remap of the reference
    (modeling_sd3_pnt.py:561-563) and the Beta construction used by the
    reference schedule (src/models/reference_distributions.py:16-17).
    """
    alpha = mode * (concentration - 2.0) + 1.0
    beta = (1.0 - mode) * (concentration - 2.0) + 1.0
    return alpha, beta
