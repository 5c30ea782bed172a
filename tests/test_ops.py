"""Golden tests for the core math layer against torch.distributions oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpdm_tpu.ops import (
    beta_entropy,
    beta_kl,
    beta_log_prob,
    beta_mean,
    beta_mode,
    beta_sample,
    flow_euler_step,
    get_ref_beta,
    mode_concentration_to_alpha_beta,
)


@pytest.fixture
def ab_grid():
    rng = np.random.default_rng(0)
    alpha = rng.uniform(1.01, 30.0, size=(64,)).astype(np.float32)
    beta = rng.uniform(1.01, 30.0, size=(64,)).astype(np.float32)
    return alpha, beta


class TestBeta:
    def test_log_prob_matches_torch(self, ab_grid):
        alpha, beta = ab_grid
        x = np.random.default_rng(1).uniform(1e-3, 1 - 1e-3, size=alpha.shape)
        x = x.astype(np.float32)
        ours = beta_log_prob(jnp.array(alpha), jnp.array(beta), jnp.array(x))
        ref = (
            torch.distributions.Beta(torch.tensor(alpha), torch.tensor(beta))
            .log_prob(torch.tensor(x))
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-3)

    def test_mode_matches_torch(self, ab_grid):
        alpha, beta = ab_grid
        ours = beta_mode(jnp.array(alpha), jnp.array(beta))
        ref = torch.distributions.Beta(
            torch.tensor(alpha), torch.tensor(beta)
        ).mode.numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)

    def test_mean(self, ab_grid):
        alpha, beta = ab_grid
        ours = beta_mean(jnp.array(alpha), jnp.array(beta))
        np.testing.assert_allclose(
            np.asarray(ours), alpha / (alpha + beta), rtol=1e-6
        )

    def test_entropy_matches_torch(self, ab_grid):
        alpha, beta = ab_grid
        ours = beta_entropy(jnp.array(alpha), jnp.array(beta))
        ref = torch.distributions.Beta(
            torch.tensor(alpha), torch.tensor(beta)
        ).entropy().numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)

    def test_kl_matches_torch(self, ab_grid):
        alpha, beta = ab_grid
        alpha2, beta2 = beta[::-1].copy(), alpha[::-1].copy()
        ours = beta_kl(
            jnp.array(alpha), jnp.array(beta), jnp.array(alpha2), jnp.array(beta2)
        )
        ref = torch.distributions.kl_divergence(
            torch.distributions.Beta(torch.tensor(alpha), torch.tensor(beta)),
            torch.distributions.Beta(torch.tensor(alpha2), torch.tensor(beta2)),
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-3, atol=5e-3)

    def test_kl_self_is_zero(self, ab_grid):
        alpha, beta = ab_grid
        kl = beta_kl(
            jnp.array(alpha), jnp.array(beta), jnp.array(alpha), jnp.array(beta)
        )
        np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-5)

    def test_sample_moments(self):
        key = jax.random.PRNGKey(0)
        alpha = jnp.full((20000,), 5.0)
        beta = jnp.full((20000,), 2.0)
        draws = beta_sample(key, alpha, beta)
        assert draws.shape == alpha.shape
        assert float(draws.min()) > 0.0 and float(draws.max()) < 1.0
        # mean a/(a+b) = 5/7, var = ab/((a+b)^2 (a+b+1)) ≈ 0.0255
        assert abs(float(draws.mean()) - 5.0 / 7.0) < 5e-3
        assert abs(float(draws.var()) - 10.0 / (49.0 * 8.0)) < 2e-3

    def test_sample_inside_jit_and_grad_of_logprob(self):
        # The whole point: sampling + logprob must be legal under jit/grad.
        def loss(params, key):
            a, b = params
            x = beta_sample(key, a, b)
            return -beta_log_prob(a, b, jax.lax.stop_gradient(x)).sum()

        g = jax.jit(jax.grad(loss))(
            (jnp.full((4,), 3.0), jnp.full((4,), 2.0)), jax.random.PRNGKey(1)
        )
        assert all(np.isfinite(np.asarray(gi)).all() for gi in g)

    def test_mode_concentration_remap(self):
        mode = jnp.array([0.3, 0.9])
        conc = jnp.array([20.0, 10.0])
        a, b = mode_concentration_to_alpha_beta(mode, conc)
        np.testing.assert_allclose(np.asarray(beta_mode(a, b)), np.asarray(mode), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a + b), np.asarray(conc), rtol=1e-6)


class TestRefSchedule:
    def test_matches_reference_formula(self):
        """Golden parity with reference_distributions.py:9-19 (torch oracle)."""
        import math

        ex = math.exp(1)
        sigmas = np.linspace(0.02, 1.0, 50).astype(np.float32)
        t_1 = torch.tensor(sigmas) / (ex + (1 - ex) * torch.tensor(sigmas))
        t_2 = torch.clamp(t_1 - 1.0 / 28, 1e-3)
        sigmas_2 = ex / (ex + 1 / t_2 - 1)
        mode = sigmas_2 / torch.tensor(sigmas)
        ref_alpha = mode * 18 + 1
        ref_beta = (1 - mode) * 18 + 1

        alpha, beta = get_ref_beta(jnp.array(sigmas))
        np.testing.assert_allclose(np.asarray(alpha), ref_alpha.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(beta), ref_beta.numpy(), rtol=1e-5)

    def test_mode_decreasing_in_sigma(self):
        # Lower sigma -> a full 1/28 t-step is a bigger relative cut -> smaller mode.
        sigmas = jnp.array([1.0, 0.5, 0.2, 0.1])
        alpha, beta = get_ref_beta(sigmas)
        mode = (alpha - 1) / (alpha + beta - 2)
        assert np.all(np.diff(np.asarray(mode)) < 0)


class TestFlowEuler:
    def test_matches_reference_custom_step(self):
        """fp32 parity with model_utilis.py:52-74 semantics."""
        rng = np.random.default_rng(2)
        b = 4
        sample = rng.normal(size=(b, 16, 8, 8)).astype(np.float32)
        vel = rng.normal(size=(b, 16, 8, 8)).astype(np.float32)
        sigma = rng.uniform(0.1, 1.0, size=(b,)).astype(np.float32)
        sigma_next = sigma * rng.uniform(0.3, 0.99, size=(b,)).astype(np.float32)

        ours = flow_euler_step(
            jnp.array(vel), jnp.array(sigma_next), jnp.array(sigma), jnp.array(sample)
        )
        t_sample = torch.tensor(sample, dtype=torch.float32)
        delta = (torch.tensor(sigma_next) - torch.tensor(sigma)).view(-1, 1, 1, 1)
        ref = (t_sample + delta * torch.tensor(vel)).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-6)

    def test_per_sample_sigmas_are_independent(self):
        sample = jnp.ones((2, 1, 2, 2))
        vel = jnp.ones((2, 1, 2, 2))
        out = flow_euler_step(
            vel, jnp.array([0.5, 0.9]), jnp.array([1.0, 1.0]), sample
        )
        np.testing.assert_allclose(np.asarray(out[0]), 0.5)
        np.testing.assert_allclose(np.asarray(out[1]), 0.9)

    def test_preserves_dtype(self):
        out = flow_euler_step(
            jnp.ones((1, 2, 2, 2), jnp.bfloat16),
            jnp.array([0.5]),
            jnp.array([1.0]),
            jnp.ones((1, 2, 2, 2), jnp.bfloat16),
        )
        assert out.dtype == jnp.bfloat16
