"""Composition of the two training-free accelerations: residual/deep-feature
caching × guidance interval.

Previously mutually exclusive; pipeline.denoise.make_interval_cached_denoise_pair
composes them so reuse steps outside the guidance window run only the shallow
blocks on a SINGLE-batch conditional forward. Invariants pinned here:

- a window covering every noise level collapses to the pure cached pair,
- an all-False reuse schedule collapses to the pure guidance-interval path,
- the full composition (incl. the PROMOTION of a reuse step that enters the
  window over a stale uncond cache to a full guided forward) matches an eager
  per-step python oracle implementing the same rule,
- the SD1.5/SDXL agents run the composed DeepCache × integer-t-window pair
  end to end through their adaptive loops.

Cross-program comparisons use the repo's usual 1-ulp-class tolerances (the
lax.cond/switch restructures XLA's fusion; see tests/test_cache_accel.py).
"""

import dataclasses as _dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
from tpdm_tpu.ops.flow_euler import flow_euler_step
from tpdm_tpu.ops.schedules import uniform_flow_sigmas
from tpdm_tpu.pipeline.denoise import (
    _interval_weight,
    interval_cached_init_delta,
    make_cfg_denoise_cached_fns,
    make_cfg_interval_denoise_cached_fns,
    make_cfg_interval_velocity_cached_fns,
    make_cfg_interval_velocity_fn,
    make_cfg_velocity_cached_fns,
)
from tpdm_tpu.pipeline.sampler import (
    CachedDenoise,
    SamplerConfig,
    adaptive_sample,
    cache_reuse_schedule,
    fixed_schedule_sample,
    fixed_schedule_sample_cached,
)

GS = 4.0
ALL = (0.0, 9.9)  # window covering every sigma — composition == pure cache


@pytest.fixture(scope="module")
def toy():
    cfg = MMDiTConfig.toy(num_layers=3, cache_front_blocks=1)
    model = MMDiT(cfg)
    b = 2
    latents = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
    )
    timestep = jnp.array([1000.0, 400.0])
    ctx = jax.random.normal(
        jax.random.PRNGKey(1), (b, 11, cfg.joint_attention_dim)
    )
    pooled = jax.random.normal(
        jax.random.PRNGKey(2), (b, cfg.pooled_projection_dim)
    )
    params = model.init(jax.random.PRNGKey(3), latents, timestep, ctx, pooled)
    return cfg, model, params


def _io(cfg, b=2):
    pe = jax.random.normal(
        jax.random.PRNGKey(7), (2 * b, 9, cfg.joint_attention_dim)
    )
    pp = jax.random.normal(
        jax.random.PRNGKey(8), (2 * b, cfg.pooled_projection_dim)
    )
    lat = jax.random.normal(
        jax.random.PRNGKey(9),
        (b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
    )
    return pe, pp, lat


def _mode_apply(model, params):
    return lambda mode: (
        lambda l, t, pe_, pp_, d: model.apply(
            params, l, t, pe_, pp_, delta=d, cache_mode=mode
        )
    )


def _zero_delta(cfg, b):
    n_img = (cfg.sample_size // cfg.patch_size) ** 2
    return jnp.zeros((2 * b, n_img, cfg.inner_dim), cfg.dtype)


class TestFixedComposed:
    def test_all_guided_window_matches_pure_cached(self, toy):
        cfg, model, params = toy
        pe, pp, lat = _io(cfg)
        ma = _mode_apply(model, params)
        pure_full, pure_reuse = make_cfg_velocity_cached_fns(
            ma("record"), ma("reuse"), pe, pp, GS
        )
        comp_full, comp_reuse = make_cfg_interval_velocity_cached_fns(
            ma("record"), ma("reuse"), pe, pp, GS, ALL
        )
        sig = uniform_flow_sigmas(5)
        sched = cache_reuse_schedule(5, 2)
        pure = fixed_schedule_sample_cached(
            pure_full, pure_reuse, lat, sig, _zero_delta(cfg, 2), sched
        )
        comp = fixed_schedule_sample_cached(
            comp_full, comp_reuse, lat, sig,
            interval_cached_init_delta(_zero_delta(cfg, 2)), sched,
        )
        np.testing.assert_allclose(
            np.asarray(pure), np.asarray(comp), rtol=1e-3, atol=1e-4
        )

    def test_no_reuse_schedule_matches_pure_interval(self, toy):
        cfg, model, params = toy
        pe, pp, lat = _io(cfg)
        ma = _mode_apply(model, params)
        window = (0.4, 0.95)
        vfn = make_cfg_interval_velocity_fn(
            lambda *a: model.apply(params, *a), pe, pp, GS, window
        )
        comp_full, comp_reuse = make_cfg_interval_velocity_cached_fns(
            ma("record"), ma("reuse"), pe, pp, GS, window
        )
        sig = uniform_flow_sigmas(5)
        base = fixed_schedule_sample(vfn, lat, sig)
        comp = fixed_schedule_sample_cached(
            comp_full, comp_reuse, lat, sig,
            interval_cached_init_delta(_zero_delta(cfg, 2)),
            jnp.zeros((5,), bool),
        )
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(comp), rtol=1e-3, atol=1e-4
        )

    def test_composition_matches_eager_oracle_incl_promotion(self, toy):
        """sigmas(5) = [1.0, 0.9, 0.75, 0.5, 0.003]; window (0.4, 0.95)
        and interval-2 schedule walk EVERY branch: step0 cond-full, step1
        PROMOTED guided-full (reuse step entering the window over a stale
        uncond cache), step2 guided-full, step3 guided-reuse, step4
        cond-full."""
        cfg, model, params = toy
        b = 2
        pe, pp, lat = _io(cfg)
        ma = _mode_apply(model, params)
        window = (0.4, 0.95)
        T = 5
        sig = uniform_flow_sigmas(T)
        sched = cache_reuse_schedule(T, 2)

        comp_full, comp_reuse = make_cfg_interval_velocity_cached_fns(
            ma("record"), ma("reuse"), pe, pp, GS, window
        )
        comp = fixed_schedule_sample_cached(
            comp_full, comp_reuse, lat, sig,
            interval_cached_init_delta(_zero_delta(cfg, 2)), sched,
        )

        # eager per-step oracle, python control flow
        sig_np = np.asarray(sig, np.float64)
        sig_ext = np.concatenate([sig_np, [0.0]])
        x = lat
        delta = _zero_delta(cfg, 2)
        valid = False
        branches = []
        for i in range(T):
            s = jnp.full((b,), sig_np[i], jnp.float32)
            s_next = jnp.full((b,), sig_ext[i + 1], jnp.float32)
            reuse = bool(sched[i])
            in_iv = window[0] <= sig_np[i] < window[1]
            if in_iv:
                full = (not reuse) or (not valid)
                mode = "record" if full else "reuse"
                lat2 = jnp.concatenate([x, x])
                t2 = jnp.concatenate([s, s]) * 1000.0
                vel2, *_, d_new = model.apply(
                    params, lat2, t2, pe, pp, delta=delta, cache_mode=mode
                )
                if full:
                    delta, valid = d_new, True
                    branches.append("guided-full")
                else:
                    branches.append("guided-reuse")
                u, c = jnp.split(vel2, 2)
                w, _ = _interval_weight(s, GS, window, u.dtype)
                vel = u + w.reshape((-1, 1, 1, 1)) * (c - u)
            else:
                mode = "reuse" if reuse else "record"
                vel, *_, d_new = model.apply(
                    params, x, s * 1000.0, pe[b:], pp[b:],
                    delta=delta[b:], cache_mode=mode,
                )
                if not reuse:
                    delta = delta.at[b:].set(d_new)
                    valid = False
                    branches.append("cond-full")
                else:
                    branches.append("cond-reuse")
            x = flow_euler_step(vel, s_next, s, x)
        assert branches == [
            "cond-full", "guided-full", "guided-full", "guided-reuse",
            "cond-full",
        ]
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(comp), rtol=1e-3, atol=1e-4
        )


class TestAdaptiveComposed:
    def test_all_guided_window_matches_pure_cached(self, toy):
        cfg, model, params = toy
        b = 2
        pe, pp, lat = _io(cfg)
        grid = cfg.sample_size // cfg.patch_size
        tpm = TimePredictor(
            conv_out_channels=4,
            in_channels=2 * cfg.inner_dim,
            temb_dim=cfg.inner_dim,
        )
        tpm_params = tpm.init(
            jax.random.PRNGKey(5),
            jnp.zeros((b, 2 * cfg.inner_dim, grid, grid)),
            jnp.zeros((b, cfg.inner_dim)),
        )
        tpm_fn = lambda h, t: tpm.apply(tpm_params, h, t)
        ma = _mode_apply(model, params)
        pure_full, pure_reuse = make_cfg_denoise_cached_fns(
            ma("record"), ma("reuse"), pe, pp, GS, grid
        )
        comp_full, comp_reuse = make_cfg_interval_denoise_cached_fns(
            ma("record"), ma("reuse"), pe, pp, GS, ALL, grid
        )
        scfg = SamplerConfig(
            max_inference_steps=4, min_sigma=0.01, cache_activations=False
        )
        key = jax.random.PRNGKey(11)
        sched = cache_reuse_schedule(4, 2)

        def run(full_fn, reuse_fn, init_delta):
            cached = CachedDenoise(full_fn, reuse_fn, init_delta, sched)
            return jax.jit(
                lambda l, k: adaptive_sample(
                    None, tpm_fn, l, k, scfg, cached=cached
                )
            )(lat, key)

        pure = run(pure_full, pure_reuse, _zero_delta(cfg, b))
        comp = run(
            comp_full, comp_reuse,
            interval_cached_init_delta(_zero_delta(cfg, b)),
        )
        np.testing.assert_array_equal(
            np.asarray(pure.prob_masks), np.asarray(comp.prob_masks)
        )
        np.testing.assert_allclose(
            np.asarray(pure.final_latents), np.asarray(comp.final_latents),
            rtol=1e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(pure.logprobs), np.asarray(comp.logprobs),
            rtol=1e-3, atol=5e-3,
        )

    def test_real_window_runs_and_is_anchored(self, toy):
        cfg, model, params = toy
        b = 2
        pe, pp, lat = _io(cfg)
        grid = cfg.sample_size // cfg.patch_size
        tpm = TimePredictor(
            conv_out_channels=4,
            in_channels=2 * cfg.inner_dim,
            temb_dim=cfg.inner_dim,
        )
        tpm_params = tpm.init(
            jax.random.PRNGKey(5),
            jnp.zeros((b, 2 * cfg.inner_dim, grid, grid)),
            jnp.zeros((b, cfg.inner_dim)),
        )
        tpm_fn = lambda h, t: tpm.apply(tpm_params, h, t)
        ma = _mode_apply(model, params)
        comp_full, comp_reuse = make_cfg_interval_denoise_cached_fns(
            ma("record"), ma("reuse"), pe, pp, GS, (0.3, 0.95), grid
        )
        scfg = SamplerConfig(
            max_inference_steps=5, min_sigma=0.01, cache_activations=False
        )
        cached = CachedDenoise(
            comp_full, comp_reuse,
            interval_cached_init_delta(_zero_delta(cfg, b)),
            cache_reuse_schedule(5, 2),
        )
        out = jax.jit(
            lambda l, k: adaptive_sample(
                None, tpm_fn, l, k, scfg, cached=cached
            )
        )(lat, jax.random.PRNGKey(11))
        assert np.isfinite(np.asarray(out.final_latents)).all()


class TestPipelineComposed:
    @pytest.fixture(scope="class")
    def pipe(self):
        from tpdm_tpu.pipeline.pipeline import TPDMPipeline

        cfg = MMDiTConfig.toy(num_layers=3, cache_front_blocks=1)
        model = MMDiT(cfg)
        b = 2
        lat = jnp.zeros((b, cfg.in_channels, cfg.sample_size, cfg.sample_size))
        params = model.init(
            jax.random.PRNGKey(0), lat, jnp.zeros((b,)),
            jnp.zeros((b, 9, cfg.joint_attention_dim)),
            jnp.zeros((b, cfg.pooled_projection_dim)),
        )
        tpm = TimePredictor(
            conv_out_channels=4,
            in_channels=2 * cfg.inner_dim,
            temb_dim=cfg.inner_dim,
        )
        grid = cfg.sample_size // cfg.patch_size
        tpm_params = tpm.init(
            jax.random.PRNGKey(5),
            jnp.zeros((b, 2 * cfg.inner_dim, grid, grid)),
            jnp.zeros((b, cfg.inner_dim)),
        )
        return TPDMPipeline(
            model, params, tpm, tpm_params, None, None, None, min_sigma=0.01
        ), cfg

    def _embeds(self, cfg, b=2):
        rng = np.random.default_rng(3)
        pe = rng.normal(size=(b, 9, cfg.joint_attention_dim)).astype(np.float32)
        npe = rng.normal(size=(b, 9, cfg.joint_attention_dim)).astype(np.float32)
        pp = rng.normal(size=(b, cfg.pooled_projection_dim)).astype(np.float32)
        npp = rng.normal(size=(b, cfg.pooled_projection_dim)).astype(np.float32)
        return pe, pp, npe, npp

    def test_generate_composed(self, pipe):
        pipeline, cfg = pipe
        pe, pp, npe, npp = self._embeds(cfg)
        out = pipeline.generate(
            prompt_embeds=pe, pooled_prompt_embeds=pp,
            negative_prompt_embeds=npe, negative_pooled_prompt_embeds=npp,
            max_inference_steps=5, guidance_scale=4.0, seed=0, decode=False,
            cache_interval=2, guidance_interval=(0.3, 0.95),
        )
        assert np.isfinite(np.asarray(out.images)).all()
        assert out.images.shape[0] == 2
        # deterministic per seed
        again = pipeline.generate(
            prompt_embeds=pe, pooled_prompt_embeds=pp,
            negative_prompt_embeds=npe, negative_pooled_prompt_embeds=npp,
            max_inference_steps=5, guidance_scale=4.0, seed=0, decode=False,
            cache_interval=2, guidance_interval=(0.3, 0.95),
        )
        np.testing.assert_array_equal(out.images, again.images)

    def test_generate_fixed_composed(self, pipe):
        pipeline, cfg = pipe
        pe, pp, npe, npp = self._embeds(cfg)
        base = pipeline.generate_fixed(
            pe, pp, npe, npp, num_steps=4, guidance_scale=4.0, seed=1,
        )
        comp = pipeline.generate_fixed(
            pe, pp, npe, npp, num_steps=4, guidance_scale=4.0, seed=1,
            cache_interval=2, guidance_interval=(0.3, 0.95),
        )
        assert np.isfinite(np.asarray(comp)).all()
        assert comp.shape == base.shape
        # approximate but anchored to the exact trajectory
        d = float(np.abs(np.asarray(base) - np.asarray(comp)).mean())
        assert d < float(np.abs(np.asarray(base)).mean()) * 2.0


class TestEpsFamiliesComposed:
    def _world(self, cfg):
        from tpdm_tpu.models.unet_sd15 import UNetSD15

        model = UNetSD15(cfg)
        b = 2
        lat = jax.random.normal(
            jax.random.PRNGKey(0), (b, 4, cfg.sample_size, cfg.sample_size)
        )
        t = jnp.array([999.0, 500.0])
        ctx = jax.random.normal(
            jax.random.PRNGKey(1), (b, 5, cfg.cross_attention_dim)
        )
        added = None
        if cfg.addition_embed:
            added = {
                "text_embeds": jax.random.normal(
                    jax.random.PRNGKey(2), (b, cfg.addition_pooled_dim)
                ),
                "time_ids": jnp.broadcast_to(
                    jnp.asarray([128.0, 128.0, 0.0, 0.0, 128.0, 128.0]),
                    (b, 6),
                ),
            }
        params = model.init(jax.random.PRNGKey(3), lat, t, ctx, added)
        return model, params

    def test_sd15_agent_composed(self):
        from tpdm_tpu.models.unet_sd15 import UNetConfig
        from tpdm_tpu.train.config import RLOOConfig
        from tpdm_tpu.train.sd15_agent import SD15Agent

        cfg = UNetConfig.toy()
        model, params = self._world(cfg)
        config = RLOOConfig(
            per_device_train_batch_size=2, rloo_k=2, max_inference_steps=5,
            total_episodes=2, learning_rate=1e-3,
        )
        agent = SD15Agent(model, params, config, guidance_scale=7.5)
        tpm_params = agent.init_tpm_params(jax.random.PRNGKey(5))
        rng = np.random.default_rng(0)
        batch = {
            "prompt_embeds": rng.normal(
                size=(2, 5, cfg.cross_attention_dim)
            ).astype(np.float32),
            "negative_prompt_embeds": rng.normal(
                size=(2, 5, cfg.cross_attention_dim)
            ).astype(np.float32),
        }
        key = jax.random.PRNGKey(7)
        base_cfg = _dc.replace(
            agent.sampler_cfg, predict=True, cache_activations=False,
            cache_interval=2,
        )
        pure = agent.sample(tpm_params, batch, key, sampler_cfg=base_cfg)
        # integer-t window covering every timestep == pure DeepCache
        comp_all = agent.sample(
            tpm_params, batch, key,
            sampler_cfg=_dc.replace(base_cfg, guidance_interval=(0, 1001)),
        )
        np.testing.assert_allclose(
            np.asarray(pure.final_latents),
            np.asarray(comp_all.final_latents),
            rtol=1e-3, atol=1e-4,
        )
        # a real window runs finite and differs from the always-guided run
        comp = agent.sample(
            tpm_params, batch, key,
            sampler_cfg=_dc.replace(base_cfg, guidance_interval=(200, 800)),
        )
        assert np.isfinite(np.asarray(comp.final_latents)).all()
        assert (
            float(
                jnp.abs(comp.final_latents - pure.final_latents).mean()
            ) > 0.0
        )

    def test_sdxl_agent_composed(self):
        from tpdm_tpu.models.unet_sd15 import UNetConfig
        from tpdm_tpu.train.config import RLOOConfig
        from tpdm_tpu.train.sdxl_agent import SDXLAgent

        cfg = UNetConfig.toy_xl()
        model, params = self._world(cfg)
        config = RLOOConfig(
            per_device_train_batch_size=2, rloo_k=2, max_inference_steps=5,
            total_episodes=2, learning_rate=1e-3,
        )
        agent = SDXLAgent(model, params, config, guidance_scale=5.0)
        tpm_params = agent.init_tpm_params(jax.random.PRNGKey(5))
        rng = np.random.default_rng(0)
        batch = {
            "prompt_embeds": rng.normal(
                size=(2, 5, cfg.cross_attention_dim)
            ).astype(np.float32),
            "negative_prompt_embeds": rng.normal(
                size=(2, 5, cfg.cross_attention_dim)
            ).astype(np.float32),
            "pooled_prompt_embeds": rng.normal(
                size=(2, cfg.addition_pooled_dim)
            ).astype(np.float32),
            "negative_pooled_prompt_embeds": rng.normal(
                size=(2, cfg.addition_pooled_dim)
            ).astype(np.float32),
        }
        out = agent.sample(
            tpm_params, batch, jax.random.PRNGKey(9),
            sampler_cfg=_dc.replace(
                agent.sampler_cfg, predict=True, cache_activations=False,
                cache_interval=3, guidance_interval=(200, 800),
            ),
        )
        assert np.isfinite(np.asarray(out.final_latents)).all()
        assert out.final_latents.shape == (
            2, 4, cfg.sample_size, cfg.sample_size
        )
