"""Guidance interval: CFG applied only while sigma is inside a window.

Beyond-reference, training-free acceleration/quality knob following
Kynkäänniemi et al. 2024 ("Applying guidance in a limited interval improves
sample and distribution quality in diffusion models"). The reference guides
every step unconditionally (modeling_sd3_pnt.py:504-552). Semantics pinned
here:

- per-sample effective weight: ``guidance_scale`` inside [lo, hi), 1.0
  (== conditional-only) outside — so a mixed batch is exact, not gated on
  the whole batch,
- whole-interval window reproduces the plain CFG builders,
- once EVERY sample has left the window, the uncond tower is physically
  skipped (lax.cond single-batch branch) — checked by making the window
  empty and comparing against a half-batch conditional-only forward,
- pipeline wiring: adaptive + fixed samplers accept ``guidance_interval``;
  invalid combos fail loudly.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdm_tpu.models import MMDiT, MMDiTConfig
from tpdm_tpu.pipeline.denoise import (
    make_cfg_denoise_fn,
    make_cfg_interval_denoise_fn,
    make_cfg_interval_velocity_fn,
    make_cfg_velocity_fn,
)


@pytest.fixture(scope="module")
def toy():
    cfg = MMDiTConfig.toy(num_layers=2)
    model = MMDiT(cfg)
    b, n_txt = 2, 7
    latents = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
    )
    ctx = jax.random.normal(
        jax.random.PRNGKey(1), (2 * b, n_txt, cfg.joint_attention_dim)
    )
    pooled = jax.random.normal(
        jax.random.PRNGKey(2), (2 * b, cfg.pooled_projection_dim)
    )
    params = model.init(
        jax.random.PRNGKey(3),
        jnp.concatenate([latents, latents]),
        jnp.ones((2 * b,)),
        ctx,
        pooled,
    )

    def apply(*a):
        return model.apply(params, *a)

    return cfg, model, params, apply, latents, ctx, pooled


GS = 5.0


class TestVelocityFn:
    def test_full_window_matches_plain_cfg(self, toy):
        cfg, _, _, apply, latents, ctx, pooled = toy
        plain = make_cfg_velocity_fn(apply, ctx, pooled, GS)
        ivl = make_cfg_interval_velocity_fn(
            apply, ctx, pooled, GS, (0.0, 10.0)
        )
        sigma = jnp.array([0.7, 0.3])
        np.testing.assert_allclose(
            np.asarray(plain(latents, sigma)),
            np.asarray(ivl(latents, sigma)),
            rtol=1e-4, atol=1e-5,
        )

    def test_empty_window_is_cond_only_single_batch(self, toy):
        """Outside the window the result equals a half-batch forward with
        only the conditional embeds — proof both of the w=1 collapse and of
        the branch actually taken (the cond_only branch computes exactly
        this)."""
        cfg, _, _, apply, latents, ctx, pooled = toy
        b = latents.shape[0]
        ivl = make_cfg_interval_velocity_fn(
            apply, ctx, pooled, GS, (2.0, 3.0)
        )
        sigma = jnp.array([0.7, 0.3])
        got = ivl(latents, sigma)
        want = apply(latents, sigma * 1000.0, ctx[b:], pooled[b:])[0]
        # cross-program tolerance: the lax.cond branch is a separately
        # compiled XLA program from the eager oracle (1e-6-class drift)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )

    def test_mixed_batch_per_sample_weights(self, toy):
        """One sample inside, one outside: the inside sample is guided at
        GS, the outside one collapses to conditional-only (w=1)."""
        cfg, _, _, apply, latents, ctx, pooled = toy
        b = latents.shape[0]
        ivl = make_cfg_interval_velocity_fn(
            apply, ctx, pooled, GS, (0.5, 1.0)
        )
        sigma = jnp.array([0.7, 0.3])  # [inside, outside]
        got = np.asarray(ivl(latents, sigma))

        lat2 = jnp.concatenate([latents, latents])
        vel = apply(lat2, jnp.concatenate([sigma, sigma]) * 1000.0, ctx, pooled)[0]
        uncond, cond = np.split(np.asarray(vel), 2)
        w = np.array([GS, 1.0], dtype=uncond.dtype).reshape(-1, 1, 1, 1)
        want = uncond + w * (cond - uncond)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_boundary_is_half_open(self, toy):
        cfg, _, _, apply, latents, ctx, pooled = toy
        ivl = make_cfg_interval_velocity_fn(
            apply, ctx, pooled, GS, (0.3, 0.7)
        )
        plain = make_cfg_velocity_fn(apply, ctx, pooled, GS)
        # sigma == hi is OUTSIDE; sigma == lo is INSIDE
        sigma = jnp.array([0.3, 0.7])
        got = np.asarray(ivl(latents, sigma))
        guided = np.asarray(plain(latents, sigma))
        cond_only = np.asarray(
            apply(latents, sigma * 1000.0, ctx[2:], pooled[2:])[0]
        )
        np.testing.assert_allclose(got[0], guided[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got[1], cond_only[1], rtol=1e-4, atol=1e-5)

    def test_requires_cfg(self, toy):
        _, _, _, apply, _, ctx, pooled = toy
        with pytest.raises(ValueError, match="requires CFG"):
            make_cfg_interval_velocity_fn(apply, ctx, pooled, None, (0, 1))


class TestDenoiseFn:
    def test_full_window_matches_plain_cfg(self, toy):
        cfg, _, _, apply, latents, ctx, pooled = toy
        grid = cfg.sample_size // cfg.patch_size
        plain = make_cfg_denoise_fn(apply, ctx, pooled, GS, grid, cfg.patch_size)
        ivl = make_cfg_interval_denoise_fn(
            apply, ctx, pooled, GS, (0.0, 10.0), grid, cfg.patch_size
        )
        sigma = jnp.array([0.7, 0.3])
        for a, b in zip(plain(latents, sigma), ivl(latents, sigma)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_empty_window_is_cond_only(self, toy):
        cfg, _, _, apply, latents, ctx, pooled = toy
        b = latents.shape[0]
        grid = cfg.sample_size // cfg.patch_size
        ivl = make_cfg_interval_denoise_fn(
            apply, ctx, pooled, GS, (2.0, 3.0), grid, cfg.patch_size
        )
        sigma = jnp.array([0.7, 0.3])
        vel, temb, h = ivl(latents, sigma)
        want_vel, want_temb, _, _ = apply(
            latents, sigma * 1000.0, ctx[b:], pooled[b:]
        )
        np.testing.assert_allclose(
            np.asarray(vel), np.asarray(want_vel), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(temb), np.asarray(want_temb), rtol=1e-4, atol=1e-5
        )
        assert h.shape == (b, 2 * cfg.inner_dim, grid, grid)


class TestPipelineWiring:
    @pytest.fixture(scope="class")
    def pipe(self, toy):
        from tpdm_tpu.models import TimePredictor
        from tpdm_tpu.pipeline.pipeline import TPDMPipeline

        cfg, model, params, *_ = toy
        grid = cfg.sample_size // cfg.patch_size
        tpm = TimePredictor(
            conv_out_channels=4,
            in_channels=2 * cfg.inner_dim,
            temb_dim=cfg.inner_dim,
            init_alpha=0.5,
            init_beta=2.0,
        )
        tpm_params = tpm.init(
            jax.random.PRNGKey(5),
            jnp.zeros((1, 2 * cfg.inner_dim, grid, grid)),
            jnp.zeros((1, cfg.inner_dim)),
        )
        return TPDMPipeline(
            model, params, tpm, tpm_params, None, None, None, min_sigma=0.01
        )

    def _embeds(self, pipe, b=2):
        cfg = pipe.mmdit.config
        k = jax.random.PRNGKey(9)
        pe = jax.random.normal(k, (b, 7, cfg.joint_attention_dim))
        pp = jax.random.normal(k, (b, cfg.pooled_projection_dim))
        return pe, pp

    def test_adaptive_interval_runs_and_full_window_matches(self, pipe):
        pe, pp = self._embeds(pipe)
        kw = dict(
            prompt_embeds=pe, pooled_prompt_embeds=pp,
            negative_prompt_embeds=0.1 * pe,
            negative_pooled_prompt_embeds=0.1 * pp,
            max_inference_steps=4, guidance_scale=3.0, seed=0,
        )
        base = pipe.generate(**kw)  # vae=None: images are raw latents
        full = pipe.generate(**kw, guidance_interval=(0.0, 10.0))
        np.testing.assert_allclose(
            base.images, full.images, rtol=1e-4, atol=1e-5
        )
        mid = pipe.generate(**kw, guidance_interval=(0.3, 0.9))
        assert mid.images.shape == base.images.shape
        assert np.isfinite(mid.images).all()

    def test_fixed_interval_runs(self, pipe):
        pe, pp = self._embeds(pipe)
        img = pipe.generate_fixed(
            pe, pp, negative_prompt_embeds=0.1 * pe,
            negative_pooled_prompt_embeds=0.1 * pp,
            num_steps=4, guidance_scale=3.0,
            guidance_interval=(0.2, 0.9),
        )
        assert img.shape[0] == 2

    def test_invalid_combos_fail_loudly(self, pipe):
        pe, pp = self._embeds(pipe)
        with pytest.raises(ValueError, match="requires classifier-free"):
            pipe.generate(
                prompt_embeds=pe, pooled_prompt_embeds=pp,
                guidance_scale=None, guidance_interval=(0.2, 0.9),
            )
        # cache_interval now COMPOSES with the interval instead of raising —
        # numerics + pipeline wiring are pinned in
        # tests/test_cache_interval_compose.py (this fixture's 2-layer toy
        # can't cache: cache_front_blocks defaults to 4)


class TestEpsFamilies:
    """The integer-t families (SD1.5/SDXL): same window semantics in
    t-units, wired through SD15SamplerConfig.guidance_interval and the
    variant pipelines' ``guidance_interval`` kwarg."""

    def _sd15(self):
        sys.path.insert(0, "tests")
        from test_draft import _eps_agent

        agent, rows = _eps_agent("sd15", guidance_scale=5.0)
        pe = jnp.asarray(np.stack([r["prompt_embeds"] for r in rows[:2]]))
        npe = jnp.asarray(
            np.stack([r["negative_prompt_embeds"] for r in rows[:2]])
        )
        return agent, jnp.concatenate([npe, pe])

    def test_sd15_full_window_matches_plain(self):
        from tpdm_tpu.train.sd15_agent import (
            make_sd15_denoise_fn,
            make_sd15_interval_denoise_fn,
        )

        agent, pe2 = self._sd15()
        apply = lambda *a: agent.unet.apply(agent.unet_params, *a)
        plain = make_sd15_denoise_fn(apply, pe2, 5.0)
        ivl = make_sd15_interval_denoise_fn(apply, pe2, 5.0, (0.0, 2000.0))
        lat = agent.prepare_latents(jax.random.PRNGKey(0), 2)
        t = jnp.array([800.0, 200.0])
        for a, b in zip(plain(lat, t), ivl(lat, t)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_sd15_empty_window_is_cond_only(self):
        from tpdm_tpu.train.sd15_agent import make_sd15_interval_denoise_fn

        agent, pe2 = self._sd15()
        apply = lambda *a: agent.unet.apply(agent.unet_params, *a)
        ivl = make_sd15_interval_denoise_fn(
            apply, pe2, 5.0, (2000.0, 3000.0)
        )
        lat = agent.prepare_latents(jax.random.PRNGKey(0), 2)
        t = jnp.array([800.0, 200.0])
        eps, temb, h = ivl(lat, t)
        want_eps, want_temb, h1, h2 = apply(lat, t, pe2[2:])
        np.testing.assert_allclose(
            np.asarray(eps), np.asarray(want_eps), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(temb), np.asarray(want_temb), rtol=1e-4, atol=1e-5
        )

    def test_sdxl_full_window_matches_plain(self):
        sys.path.insert(0, "tests")
        from test_draft import _eps_agent

        from tpdm_tpu.train.sdxl_agent import (
            make_sdxl_denoise_fn,
            make_sdxl_interval_denoise_fn,
        )

        agent, rows = _eps_agent("sdxl", guidance_scale=5.0)
        pe = jnp.asarray(np.stack([r["prompt_embeds"] for r in rows[:2]]))
        npe = jnp.asarray(
            np.stack([r["negative_prompt_embeds"] for r in rows[:2]])
        )
        pp = jnp.asarray(
            np.stack([r["pooled_prompt_embeds"] for r in rows[:2]])
        )
        npp = jnp.asarray(
            np.stack([r["negative_pooled_prompt_embeds"] for r in rows[:2]])
        )
        pe2 = jnp.concatenate([npe, pe])
        tids = agent.default_time_ids(2)
        added = {
            "text_embeds": jnp.concatenate([npp, pp]),
            "time_ids": jnp.concatenate([tids, tids]),
        }
        apply = lambda *a: agent.unet.apply(agent.unet_params, *a)
        plain = make_sdxl_denoise_fn(apply, pe2, added, 5.0)
        ivl = make_sdxl_interval_denoise_fn(
            apply, pe2, added, 5.0, (0.0, 2000.0)
        )
        lat = agent.prepare_latents(jax.random.PRNGKey(0), 2)
        t = jnp.array([800.0, 200.0])
        for a, b in zip(plain(lat, t), ivl(lat, t)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_sd15_pipeline_kwarg_and_invalid_combos(self):
        sys.path.insert(0, "tests")
        from test_draft import _eps_agent

        from tpdm_tpu.pipeline.variants import SD15Pipeline

        agent, rows = _eps_agent("sd15", guidance_scale=5.0)
        pipe = SD15Pipeline(agent)
        pe = jnp.asarray(np.stack([r["prompt_embeds"] for r in rows[:2]]))
        npe = jnp.asarray(
            np.stack([r["negative_prompt_embeds"] for r in rows[:2]])
        )
        out = pipe.generate(
            prompt_embeds=pe, negative_prompt_embeds=npe, seed=0,
            guidance_interval=(100.0, 700.0),
        )
        assert np.isfinite(out.images).all()
        # cache_interval composes (DeepCache × integer-t window; numerics in
        # tests/test_cache_interval_compose.py)
        composed = pipe.generate(
            prompt_embeds=pe, negative_prompt_embeds=npe, seed=0,
            guidance_interval=(100.0, 700.0), cache_interval=3,
        )
        assert np.isfinite(composed.images).all()

        no_cfg, rows2 = _eps_agent("sd15", guidance_scale=1.0)
        pipe2 = SD15Pipeline(no_cfg)
        pe2 = jnp.asarray(np.stack([r["prompt_embeds"] for r in rows2[:2]]))
        with pytest.raises(ValueError, match="requires classifier-free"):
            pipe2.generate(
                prompt_embeds=pe2,
                negative_prompt_embeds=jnp.zeros_like(pe2),
                guidance_interval=(100.0, 700.0),
            )
