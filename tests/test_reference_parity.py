"""End-to-end sampler-loop parity vs a torch oracle of the reference loop.

The oracle re-implements the reference's denoising-loop *semantics*
(modeling_sd3_pnt.py:508-621) in torch with pluggable stub networks; both
sides run deterministic (predict=True) mode so no RNG coupling is needed.
This pins the ordering subtleties: mask decided on the step's input sigma,
sigma pinned to 0 only in predict mode, logprob computed pre-masking,
per-sample early termination only when ALL finish.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tpdm_tpu.pipeline.sampler import SamplerConfig, adaptive_sample

B, C, H = 3, 2, 4
INNER = 4


def np_denoise(latents):
    """Shared stub denoiser math (numpy source of truth)."""
    vel = -0.8 * latents
    temb = np.tile(latents.mean(axis=(1, 2, 3))[:, None], (1, INNER))
    h = np.tile(latents.mean(axis=1, keepdims=True), (1, 2 * INNER, 1, 1))
    return vel, temb, h


def np_tpm(h, temb):
    """Stub policy: alpha/beta vary with activations so schedules differ
    per sample."""
    a = 2.0 + np.tanh(h.mean(axis=(1, 2, 3))) * 0.5
    b = 1.2 + np.tanh(temb.mean(axis=1)) * 0.3
    return np.stack([a, b], axis=1)


def torch_reference_loop(init_latents, max_steps, min_sigma, epsilon=1e-3):
    """The reference forward loop, deterministic mode, torch semantics."""
    latents = torch.tensor(init_latents)
    bsz = latents.shape[0]
    sigma = torch.ones(bsz)
    sigmas = [[] for _ in range(bsz)]
    logprobs = [[] for _ in range(bsz)]
    prob_masks = [[] for _ in range(bsz)]
    alphas_l = [[] for _ in range(bsz)]
    betas_l = [[] for _ in range(bsz)]
    last_valid = latents.clone()

    steps_taken = 0
    for step in range(max_steps):
        vel, temb, h = np_denoise(latents.numpy())
        time_preds = torch.tensor(np_tpm(h, temb))
        sigma_next = torch.zeros_like(sigma)
        for i, (alpha, beta) in enumerate(time_preds):
            dist = torch.distributions.Beta(alpha, beta)
            ratio = dist.mode  # predict=True
            ratio = ratio.clamp(epsilon, 1 - epsilon)
            sigma_next[i] = sigma[i] * ratio
            sigmas[i].append(sigma_next[i].clone())
            prob = dist.log_prob(ratio)
            logprobs[i].append(prob)
            if sigma[i] < min_sigma:
                prob_masks[i].append(torch.tensor(1))
                sigma_next[i] = torch.tensor(0.0)
                sigmas[i][-1] = torch.tensor(0.0)  # view-aliasing in reference
            else:
                prob_masks[i].append(torch.tensor(0))
            alphas_l[i].append(alpha)
            betas_l[i].append(beta)

        # custom_step (model_utilis.py:52-74)
        delta = (sigma_next - sigma).view(-1, 1, 1, 1)
        latents = latents.float() + delta * torch.tensor(vel)

        for i in range(bsz):
            if not prob_masks[i][-1]:
                last_valid[i] = latents[i]

        steps_taken += 1
        if (sigma_next < min_sigma).all():
            break
        sigma = sigma_next

    stack = lambda ll: torch.stack([torch.stack(x) for x in ll])
    out_logprobs = stack(logprobs)
    masks = stack(prob_masks).bool()
    out_logprobs = torch.masked_fill(out_logprobs, masks, 1.0)
    return {
        "sigmas": stack(sigmas).numpy(),
        "logprobs": out_logprobs.numpy(),
        "masks": masks.numpy(),
        "alphas": stack(alphas_l).numpy(),
        "betas": stack(betas_l).numpy(),
        "steps": steps_taken,
        "last_valid": last_valid.numpy(),
    }


def jax_denoise_fn(latents, sigma):
    vel = -0.8 * latents
    temb = jnp.tile(latents.mean(axis=(1, 2, 3))[:, None], (1, INNER))
    h = jnp.tile(latents.mean(axis=1, keepdims=True), (1, 2 * INNER, 1, 1))
    return vel, temb, h


def jax_tpm_fn(h, temb):
    a = 2.0 + jnp.tanh(h.mean(axis=(1, 2, 3))) * 0.5
    b = 1.2 + jnp.tanh(temb.mean(axis=1)) * 0.3
    return jnp.stack([a, b], axis=1)


class TestLoopParity:
    def _run_both(self, max_steps, min_sigma):
        init = np.random.default_rng(0).normal(size=(B, C, H, H)).astype(np.float32)
        ref = torch_reference_loop(init, max_steps, min_sigma)
        ours = adaptive_sample(
            jax_denoise_fn,
            jax_tpm_fn,
            jnp.array(init),
            jax.random.PRNGKey(0),
            SamplerConfig(
                max_inference_steps=max_steps, min_sigma=min_sigma, predict=True
            ),
        )
        return ref, ours

    def test_full_rollout_parity(self):
        ref, ours = self._run_both(max_steps=12, min_sigma=0.05)
        n = ref["steps"]
        assert int(ours.num_steps) == n
        np.testing.assert_allclose(
            np.asarray(ours.sigmas)[:, :n], ref["sigmas"], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ours.logprobs)[:, :n], ref["logprobs"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(ours.prob_masks)[:, :n], ref["masks"]
        )
        np.testing.assert_allclose(
            np.asarray(ours.alphas)[:, :n], ref["alphas"], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ours.final_latents), ref["last_valid"], rtol=1e-4, atol=1e-5
        )

    def test_parity_when_cap_hit(self):
        # min_sigma so small the loop runs to the cap
        ref, ours = self._run_both(max_steps=6, min_sigma=1e-6)
        assert ref["steps"] == 6 and int(ours.num_steps) == 6
        np.testing.assert_allclose(
            np.asarray(ours.sigmas), ref["sigmas"], rtol=1e-5, atol=1e-7
        )

    def test_parity_mixed_termination(self):
        # threshold chosen so samples finish at different steps
        ref, ours = self._run_both(max_steps=20, min_sigma=0.02)
        n = ref["steps"]
        assert int(ours.num_steps) == n
        np.testing.assert_array_equal(
            np.asarray(ours.prob_masks)[:, :n], ref["masks"]
        )
        np.testing.assert_allclose(
            np.asarray(ours.final_latents), ref["last_valid"], rtol=1e-4, atol=1e-5
        )
