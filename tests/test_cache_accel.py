"""Δ-DiT-style residual block caching (training-free acceleration).

The reference has no analogue — this is beyond-reference work following
arXiv 2406.01125 (Δ-DiT): on "record" forwards the MMDiT returns the back
block group's residual Δ = x_after_all_blocks − x_after_front_blocks; on
"reuse" forwards only `cache_front_blocks` blocks run and the cached Δ
stands in for the rest. Exactness invariants pinned here:

- record mode is bit-identical to the normal forward (plus Δ),
- reuse with the Δ recorded at the SAME inputs reproduces the full
  forward exactly (the approximation enters only across timesteps),
- the cached samplers with an all-False reuse schedule match the uncached
  ones (to cross-program tolerance: the lax.cond restructures XLA's
  fusion/reassociation, so 1-ulp-class drift is expected — same seam as
  the engine-vs-engine image parity tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
from tpdm_tpu.pipeline.denoise import (
    make_cfg_denoise_cached_fns,
    make_cfg_denoise_fn,
    make_cfg_velocity_cached_fns,
    make_cfg_velocity_fn,
)
from tpdm_tpu.pipeline.pipeline import TPDMPipeline
from tpdm_tpu.pipeline.sampler import (
    CachedDenoise,
    SamplerConfig,
    adaptive_sample,
    cache_reuse_schedule,
    fixed_schedule_sample,
    fixed_schedule_sample_cached,
)
from tpdm_tpu.ops.schedules import uniform_flow_sigmas


@pytest.fixture(scope="module")
def toy():
    cfg = MMDiTConfig.toy(num_layers=3, cache_front_blocks=1)
    model = MMDiT(cfg)
    b, n_txt = 2, 11
    latents = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
    )
    timestep = jnp.array([1000.0, 400.0])
    ctx = jax.random.normal(
        jax.random.PRNGKey(1), (b, n_txt, cfg.joint_attention_dim)
    )
    pooled = jax.random.normal(
        jax.random.PRNGKey(2), (b, cfg.pooled_projection_dim)
    )
    params = model.init(jax.random.PRNGKey(3), latents, timestep, ctx, pooled)
    return cfg, model, params, (latents, timestep, ctx, pooled)


class TestCacheModes:
    def test_record_matches_normal_forward(self, toy):
        cfg, model, params, args = toy
        base = model.apply(params, *args)
        rec = model.apply(params, *args, cache_mode="record")
        assert len(rec) == 5
        for a, b in zip(base, rec[:4]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        b_, n_img = args[0].shape[0], (cfg.sample_size // cfg.patch_size) ** 2
        assert rec[4].shape == (b_, n_img, cfg.inner_dim)

    def test_reuse_with_fresh_delta_is_exact(self, toy):
        """Δ recorded at the same inputs reproduces the full forward: the
        approximation error is zero when nothing moved."""
        _, model, params, args = toy
        full = model.apply(params, *args, cache_mode="record")
        reused = model.apply(params, *args, delta=full[4], cache_mode="reuse")
        for a, b in zip(full[:4], reused[:4]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )
        np.testing.assert_array_equal(np.asarray(full[4]), np.asarray(reused[4]))

    def test_reuse_actually_skips_back_blocks(self, toy):
        """Zero Δ must NOT reproduce the full forward — proof the back
        group's computation is really gone, not re-run."""
        _, model, params, args = toy
        full = model.apply(params, *args, cache_mode="record")
        zero = model.apply(
            params, *args, delta=jnp.zeros_like(full[4]), cache_mode="reuse"
        )
        assert float(jnp.abs(full[0] - zero[0]).mean()) > 1e-4

    def test_reuse_does_not_touch_back_block_params(self, toy):
        """Corrupting a back block's weights must not change a reuse
        forward (its FLOPs are skipped, not just ignored)."""
        cfg, model, params, args = toy
        delta = model.apply(params, *args, cache_mode="record")[4]
        broken = jax.tree_util.tree_map(lambda x: x, params)
        last = f"transformer_blocks_{cfg.num_layers - 1}"
        broken["params"][last] = jax.tree_util.tree_map(
            lambda x: x * 100.0 + 3.0, broken["params"][last]
        )
        a = model.apply(params, *args, delta=delta, cache_mode="reuse")
        b = model.apply(broken, *args, delta=delta, cache_mode="reuse")
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_front_blocks_validation(self, toy):
        _, model, params, args = toy
        bad = MMDiT(MMDiTConfig.toy(num_layers=3, cache_front_blocks=3))
        with pytest.raises(ValueError, match="cache_front_blocks"):
            bad.apply(params, *args, cache_mode="record")
        with pytest.raises(ValueError, match="delta"):
            model.apply(params, *args, cache_mode="reuse")


def _cfg_io(toy, b):
    cfg, _, _, _ = toy
    pe = jax.random.normal(jax.random.PRNGKey(7), (2 * b, 9, cfg.joint_attention_dim))
    pp = jax.random.normal(jax.random.PRNGKey(8), (2 * b, cfg.pooled_projection_dim))
    lat = jax.random.normal(
        jax.random.PRNGKey(9), (b, cfg.in_channels, cfg.sample_size, cfg.sample_size)
    )
    return pe, pp, lat


class TestCachedSamplers:
    def test_fixed_all_false_schedule_is_bitwise(self, toy):
        cfg, model, params, _ = toy
        b = 2
        pe, pp, lat = _cfg_io(toy, b)
        apply = lambda *a: model.apply(params, *a)
        mode_apply = lambda mode: (
            lambda l, t, pe_, pp_, d: model.apply(
                params, l, t, pe_, pp_, delta=d, cache_mode=mode
            )
        )
        vfn = make_cfg_velocity_fn(apply, pe, pp, 4.0)
        full_fn, reuse_fn = make_cfg_velocity_cached_fns(
            mode_apply("record"), mode_apply("reuse"), pe, pp, 4.0
        )
        sig = uniform_flow_sigmas(4)
        n_img = (cfg.sample_size // cfg.patch_size) ** 2
        delta0 = jnp.zeros((2 * b, n_img, cfg.inner_dim), cfg.dtype)
        base = jax.jit(fixed_schedule_sample, static_argnums=0)(vfn, lat, sig)
        cached = jax.jit(
            fixed_schedule_sample_cached, static_argnums=(0, 1)
        )(full_fn, reuse_fn, lat, sig, delta0, jnp.zeros((4,), bool))
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(cached), rtol=1e-3, atol=1e-4
        )

    def test_fixed_interval2_runs_and_differs(self, toy):
        cfg, model, params, _ = toy
        b = 2
        pe, pp, lat = _cfg_io(toy, b)
        mode_apply = lambda mode: (
            lambda l, t, pe_, pp_, d: model.apply(
                params, l, t, pe_, pp_, delta=d, cache_mode=mode
            )
        )
        apply = lambda *a: model.apply(params, *a)
        vfn = make_cfg_velocity_fn(apply, pe, pp, 4.0)
        full_fn, reuse_fn = make_cfg_velocity_cached_fns(
            mode_apply("record"), mode_apply("reuse"), pe, pp, 4.0
        )
        sig = uniform_flow_sigmas(6)
        n_img = (cfg.sample_size // cfg.patch_size) ** 2
        delta0 = jnp.zeros((2 * b, n_img, cfg.inner_dim), cfg.dtype)
        sched = cache_reuse_schedule(6, 2)
        assert not bool(sched[0]) and bool(sched[1]) and not bool(sched[2])
        exact = fixed_schedule_sample(vfn, lat, sig)
        fast = fixed_schedule_sample_cached(
            full_fn, reuse_fn, lat, sig, delta0, sched
        )
        assert np.isfinite(np.asarray(fast)).all()
        # approximate, not identical — but anchored: the refresh steps keep
        # it in the same ballpark as the exact trajectory
        diff = float(jnp.abs(exact - fast).mean())
        assert 0.0 < diff < float(jnp.abs(exact).mean()) * 2.0

    def test_adaptive_all_false_schedule_is_bitwise(self, toy):
        cfg, model, params, _ = toy
        b = 2
        pe, pp, lat = _cfg_io(toy, b)
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
        apply = lambda *a: model.apply(params, *a)
        mode_apply = lambda mode: (
            lambda l, t, pe_, pp_, d: model.apply(
                params, l, t, pe_, pp_, delta=d, cache_mode=mode
            )
        )
        dfn = make_cfg_denoise_fn(apply, pe, pp, 4.0, grid)
        full_fn, reuse_fn = make_cfg_denoise_cached_fns(
            mode_apply("record"), mode_apply("reuse"), pe, pp, 4.0, grid
        )
        scfg = SamplerConfig(
            max_inference_steps=4, min_sigma=0.01, cache_activations=False
        )
        key = jax.random.PRNGKey(11)
        base = jax.jit(adaptive_sample, static_argnums=(0, 1, 4))(
            dfn, tpm_fn, lat, key, scfg
        )
        cached = CachedDenoise(
            full_fn,
            reuse_fn,
            jnp.zeros((2 * b, grid * grid, cfg.inner_dim), cfg.dtype),
            jnp.zeros((4,), bool),
        )

        def run_cached(lat_, key_):
            return adaptive_sample(
                None, tpm_fn, lat_, key_, scfg, cached=cached
            )

        fast = jax.jit(run_cached)(lat, key)
        np.testing.assert_array_equal(
            np.asarray(base.prob_masks), np.asarray(fast.prob_masks)
        )
        np.testing.assert_allclose(
            np.asarray(base.final_latents),
            np.asarray(fast.final_latents),
            rtol=1e-3,
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(base.logprobs), np.asarray(fast.logprobs),
            rtol=1e-3, atol=5e-3,
        )

    def _vel_pair(self, toy, b):
        cfg, model, params, _ = toy
        pe, pp, lat = _cfg_io(toy, b)
        mode_apply = lambda mode: (
            lambda l, t, pe_, pp_, d: model.apply(
                params, l, t, pe_, pp_, delta=d, cache_mode=mode
            )
        )
        apply = lambda *a: model.apply(params, *a)
        vfn = make_cfg_velocity_fn(apply, pe, pp, 4.0)
        full_fn, reuse_fn = make_cfg_velocity_cached_fns(
            mode_apply("record"), mode_apply("reuse"), pe, pp, 4.0
        )
        n_img = (cfg.sample_size // cfg.patch_size) ** 2
        delta0 = jnp.zeros((2 * b, n_img, cfg.inner_dim), cfg.dtype)
        return vfn, full_fn, reuse_fn, lat, delta0

    def test_autocached_tau_semantics(self, toy):
        """Input-aware (TeaCache-class) policy over the same full/reuse
        pair: tau=0 refreshes every step (== exact to cross-program
        tolerance), a huge tau refreshes only step 0, and the number of
        full forwards is MONOTONE non-increasing in tau."""
        from tpdm_tpu.pipeline.sampler import fixed_schedule_sample_autocached

        vfn, full_fn, reuse_fn, lat, delta0 = self._vel_pair(toy, 2)
        sig = uniform_flow_sigmas(6)
        exact = fixed_schedule_sample(vfn, lat, sig)

        run = jax.jit(
            fixed_schedule_sample_autocached, static_argnums=(0, 1)
        )
        out0, n0 = run(full_fn, reuse_fn, lat, sig, delta0, 0.0)
        assert int(n0) == 6  # the trajectory moves every step
        np.testing.assert_allclose(
            np.asarray(exact), np.asarray(out0), rtol=1e-3, atol=1e-4
        )

        out_inf, n_inf = run(full_fn, reuse_fn, lat, sig, delta0, 1e9)
        assert int(n_inf) == 1  # only the mandatory step-0 refresh
        assert np.isfinite(np.asarray(out_inf)).all()

        counts = []
        for tau in (0.0, 0.05, 0.2, 1.0, 1e9):
            _, n = run(full_fn, reuse_fn, lat, sig, delta0, tau)
            counts.append(int(n))
        assert counts == sorted(counts, reverse=True), counts
        # a mid tau actually lands strictly between the extremes
        assert any(1 < c < 6 for c in counts), counts

    def test_adaptive_sampler_tau_policy(self, toy):
        """adaptive_sample with CachedDenoise.tau: tau=0 matches the
        uncached adaptive loop (every step refreshes); a huge tau still
        produces finite latents and identical step decisions (the TPM
        consumes h/temb from the full/reuse outputs either way)."""
        cfg, model, params, _ = toy
        b = 2
        pe, pp, lat = _cfg_io(toy, b)
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
        apply = lambda *a: model.apply(params, *a)
        mode_apply = lambda mode: (
            lambda l, t, pe_, pp_, d: model.apply(
                params, l, t, pe_, pp_, delta=d, cache_mode=mode
            )
        )
        dfn = make_cfg_denoise_fn(apply, pe, pp, 4.0, grid)
        full_fn, reuse_fn = make_cfg_denoise_cached_fns(
            mode_apply("record"), mode_apply("reuse"), pe, pp, 4.0, grid
        )
        scfg = SamplerConfig(
            max_inference_steps=4, min_sigma=0.01, cache_activations=False
        )
        key = jax.random.PRNGKey(11)
        base = jax.jit(adaptive_sample, static_argnums=(0, 1, 4))(
            dfn, tpm_fn, lat, key, scfg
        )
        delta0 = jnp.zeros((2 * b, grid * grid, cfg.inner_dim), cfg.dtype)

        def run_tau(tau):
            cached = CachedDenoise(
                full_fn, reuse_fn, delta0, jnp.zeros((4,), bool), tau=tau
            )
            return jax.jit(
                lambda lat_, key_: adaptive_sample(
                    None, tpm_fn, lat_, key_, scfg, cached=cached
                )
            )(lat, key)

        fast0 = run_tau(0.0)
        np.testing.assert_array_equal(
            np.asarray(base.prob_masks), np.asarray(fast0.prob_masks)
        )
        np.testing.assert_allclose(
            np.asarray(base.final_latents),
            np.asarray(fast0.final_latents),
            rtol=1e-3, atol=1e-4,
        )

        lazy = run_tau(1e9)  # only step 0 full — approximate but finite
        assert np.isfinite(np.asarray(lazy.final_latents)).all()
        diff = float(
            jnp.abs(lazy.final_latents - base.final_latents).mean()
        )
        assert diff > 0.0  # it really is the approximate path

    def test_cache_reuse_schedule(self):
        assert not cache_reuse_schedule(5, 0).any()
        assert not cache_reuse_schedule(5, 1).any()
        np.testing.assert_array_equal(
            np.asarray(cache_reuse_schedule(6, 3)),
            np.array([False, True, True, False, True, True]),
        )


class TestUNetDeepCache:
    """DeepCache-style deep-feature reuse for the SD1.5/SDXL UNet
    (arXiv 2312.00858): record == normal forward; reuse with the feature
    recorded at the SAME inputs == full forward (shallow levels recompute
    identically, the cached deep output is exactly what the full pass
    produced); the skip-connection bookkeeping holds at every split level."""

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
        return model, params, (lat, t, ctx, added)

    @pytest.mark.parametrize("shallow", [1, 2])
    def test_record_and_reuse_exactness(self, shallow):
        from tpdm_tpu.models.unet_sd15 import (
            UNetConfig,
            deepcache_feature_shape,
        )

        cfg = UNetConfig.toy(cache_shallow_levels=shallow)
        model, params, args = self._world(cfg)
        base = model.apply(params, *args)
        rec = model.apply(params, *args, cache_mode="record")
        for a, b in zip(base, rec[:4]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert rec[4].shape == deepcache_feature_shape(cfg, 2)
        reused = model.apply(params, *args, cache=rec[4], cache_mode="reuse")
        for a, b in zip(rec[:4], reused[:4]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )
        zero = model.apply(
            params, *args, cache=jnp.zeros_like(rec[4]), cache_mode="reuse"
        )
        assert float(jnp.abs(rec[0] - zero[0]).mean()) > 1e-5

    def test_sdxl_topology_exactness(self):
        from tpdm_tpu.models.unet_sd15 import UNetConfig

        cfg = UNetConfig.toy_xl()  # (0,1,2) depths; shallow level attn-free
        model, params, args = self._world(cfg)
        rec = model.apply(params, *args, cache_mode="record")
        reused = model.apply(params, *args, cache=rec[4], cache_mode="reuse")
        for a, b in zip(rec[:4], reused[:4]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    def test_sd15_agent_cached_sampling(self):
        from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
        from tpdm_tpu.train.config import RLOOConfig
        from tpdm_tpu.train.sd15_agent import SD15Agent

        cfg = UNetConfig.toy()
        model, params, _ = self._world(cfg)
        config = RLOOConfig(
            per_device_train_batch_size=2, rloo_k=2, max_inference_steps=5,
            total_episodes=2, learning_rate=1e-3,
        )
        agent = SD15Agent(model, params, config, guidance_scale=7.5)
        tpm_params = agent.init_tpm_params(jax.random.PRNGKey(5))
        b = 2
        batch = {
            "prompt_embeds": np.random.default_rng(0)
            .normal(size=(b, 5, cfg.cross_attention_dim))
            .astype(np.float32),
            "negative_prompt_embeds": np.random.default_rng(1)
            .normal(size=(b, 5, cfg.cross_attention_dim))
            .astype(np.float32),
        }
        import dataclasses as _dc

        key = jax.random.PRNGKey(7)
        base_cfg = _dc.replace(
            agent.sampler_cfg, predict=True, cache_activations=False
        )
        exact = agent.sample(tpm_params, batch, key, sampler_cfg=base_cfg)
        fast = agent.sample(
            tpm_params, batch, key,
            sampler_cfg=_dc.replace(base_cfg, cache_interval=2),
        )
        assert np.isfinite(np.asarray(fast.final_latents)).all()
        d = float(jnp.abs(exact.final_latents - fast.final_latents).mean())
        assert d < float(jnp.abs(exact.final_latents).mean()) * 2.0
        # input-aware policy through the same agent surface: tau=0 ==
        # refresh-every-step (matches exact to cross-program tolerance),
        # large tau finite + actually approximate
        tau0 = agent.sample(
            tpm_params, batch, key,
            sampler_cfg=_dc.replace(base_cfg, cache_tau=1e-12),
        )
        np.testing.assert_allclose(
            np.asarray(exact.final_latents), np.asarray(tau0.final_latents),
            rtol=1e-3, atol=1e-4,
        )
        lazy = agent.sample(
            tpm_params, batch, key,
            sampler_cfg=_dc.replace(base_cfg, cache_tau=1e9),
        )
        assert np.isfinite(np.asarray(lazy.final_latents)).all()
        assert float(
            jnp.abs(lazy.final_latents - exact.final_latents).mean()
        ) > 0.0

    def test_sdxl_agent_cached_sampling(self):
        from tpdm_tpu.models.unet_sd15 import UNetConfig
        from tpdm_tpu.train.config import RLOOConfig
        from tpdm_tpu.train.sdxl_agent import SDXLAgent

        cfg = UNetConfig.toy_xl()
        model, params, (lat, t, ctx, added) = self._world(cfg)
        config = RLOOConfig(
            per_device_train_batch_size=2, rloo_k=2, max_inference_steps=5,
            total_episodes=2, learning_rate=1e-3,
        )
        agent = SDXLAgent(model, params, config, guidance_scale=5.0)
        tpm_params = agent.init_tpm_params(jax.random.PRNGKey(5))
        rng = np.random.default_rng(0)
        b = 2
        batch = {
            "prompt_embeds": rng.normal(
                size=(b, 5, cfg.cross_attention_dim)
            ).astype(np.float32),
            "negative_prompt_embeds": rng.normal(
                size=(b, 5, cfg.cross_attention_dim)
            ).astype(np.float32),
            "pooled_prompt_embeds": rng.normal(
                size=(b, cfg.addition_pooled_dim)
            ).astype(np.float32),
            "negative_pooled_prompt_embeds": rng.normal(
                size=(b, cfg.addition_pooled_dim)
            ).astype(np.float32),
        }
        import dataclasses as _dc

        key = jax.random.PRNGKey(9)
        fast = agent.sample(
            tpm_params, batch, key,
            sampler_cfg=_dc.replace(
                agent.sampler_cfg, predict=True, cache_activations=False,
                cache_interval=3,
            ),
        )
        assert np.isfinite(np.asarray(fast.final_latents)).all()
        assert fast.final_latents.shape == (b, 4, cfg.sample_size, cfg.sample_size)


class TestPipelineIntegration:
    @pytest.fixture(scope="class")
    def pipe(self, toy):
        cfg, model, params, _ = toy
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

    def _embeds(self, toy, b):
        cfg = toy[0]
        k = jax.random.PRNGKey
        return dict(
            prompt_embeds=jax.random.normal(k(20), (b, 9, cfg.joint_attention_dim)),
            pooled_prompt_embeds=jax.random.normal(k(21), (b, cfg.pooled_projection_dim)),
            negative_prompt_embeds=jax.random.normal(k(22), (b, 9, cfg.joint_attention_dim)),
            negative_pooled_prompt_embeds=jax.random.normal(k(23), (b, cfg.pooled_projection_dim)),
        )

    def test_generate_cached_matches_structure(self, toy, pipe):
        em = self._embeds(toy, 2)
        exact = pipe.generate(
            **em, max_inference_steps=5, guidance_scale=3.0, seed=0,
            decode=False,
        )
        fast = pipe.generate(
            **em, max_inference_steps=5, guidance_scale=3.0, seed=0,
            decode=False, cache_interval=2,
        )
        assert fast.images.shape == exact.images.shape
        assert np.isfinite(fast.images).all()
        # deterministic per seed
        again = pipe.generate(
            **em, max_inference_steps=5, guidance_scale=3.0, seed=0,
            decode=False, cache_interval=2,
        )
        np.testing.assert_array_equal(fast.images, again.images)

    def test_generate_cache_tau(self, toy, pipe):
        """Input-aware caching through the public pipeline API: runs,
        deterministic per seed, composes with guidance_interval, and the
        fixed-schedule/tau combination is rejected."""
        em = self._embeds(toy, 2)
        fast = pipe.generate(
            **em, max_inference_steps=5, guidance_scale=3.0, seed=0,
            decode=False, cache_tau=0.05,
        )
        assert np.isfinite(fast.images).all()
        again = pipe.generate(
            **em, max_inference_steps=5, guidance_scale=3.0, seed=0,
            decode=False, cache_tau=0.05,
        )
        np.testing.assert_array_equal(fast.images, again.images)
        # composes with the guidance interval (the composed combinator is
        # schedule-agnostic)
        both = pipe.generate(
            **em, max_inference_steps=5, guidance_scale=3.0, seed=0,
            decode=False, cache_tau=0.05, guidance_interval=(0.2, 0.9),
        )
        assert np.isfinite(both.images).all()
        with pytest.raises(ValueError, match="mutually exclusive"):
            pipe.generate(
                **em, max_inference_steps=5, guidance_scale=3.0, seed=0,
                decode=False, cache_tau=0.05, cache_interval=2,
            )
        with pytest.raises(ValueError, match="mutually exclusive"):
            pipe.generate_fixed(
                **em, num_steps=5, guidance_scale=3.0, seed=0,
                cache_tau=0.05, cache_interval=2,
            )

    def test_generate_fixed_cache_tau(self, toy, pipe):
        em = self._embeds(toy, 2)
        out = pipe.generate_fixed(
            **em, num_steps=5, guidance_scale=3.0, seed=0, cache_tau=0.05,
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_flux_cache_modes_and_agent(self):
        """FLUX mirror of the MMDiT invariants: record == normal forward,
        reuse with a fresh Δ == full forward, and the agent's adaptive
        sampling path accepts cache_interval (trajectory stays finite and
        tracks the exact one)."""
        from tpdm_tpu.models.flux import Flux, FluxConfig, pack_latents
        from tpdm_tpu.train.config import RLOOConfig
        from tpdm_tpu.train.flux_agent import FluxAgent

        cfg = FluxConfig.toy(depth_double=2, depth_single=2, cache_front_blocks=1)
        model = Flux(cfg)
        b, n_txt = 2, 5
        lat = jax.random.normal(jax.random.PRNGKey(0), (b, 4, 8, 8))
        tokens, img_ids = pack_latents(lat)
        txt = jax.random.normal(jax.random.PRNGKey(1), (b, n_txt, cfg.txt_dim))
        txt_ids = jnp.zeros((b, n_txt, 3))
        t = jnp.array([1.0, 0.5])
        pooled = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.vec_dim))
        g = jnp.full((b,), 3.5)
        args = (tokens, img_ids, txt, txt_ids, t, pooled, g)
        params = model.init(jax.random.PRNGKey(3), *args)

        base = model.apply(params, *args)
        rec = model.apply(params, *args, cache_mode="record")
        for a, bb in zip(base, rec[:4]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
        assert rec[4].shape == (b, tokens.shape[1], cfg.hidden_size)
        reused = model.apply(params, *args, delta=rec[4], cache_mode="reuse")
        for a, bb in zip(rec[:4], reused[:4]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-6
            )
        zero = model.apply(
            params, *args, delta=jnp.zeros_like(rec[4]), cache_mode="reuse"
        )
        assert float(jnp.abs(rec[0] - zero[0]).mean()) > 1e-4

        config = RLOOConfig(
            per_device_train_batch_size=b, rloo_k=2, max_inference_steps=4,
            total_episodes=b, learning_rate=1e-3,
        )
        from tpdm_tpu.models.tpm import TimePredictor as TP

        agent = FluxAgent(
            model, params, config,
            tpm=TP(conv_out_channels=4, in_channels=2 * cfg.hidden_size,
                   temb_dim=cfg.hidden_size),
            latent_size=8, latent_channels=4,
        )
        tpm_params = agent.init_tpm_params(jax.random.PRNGKey(5))
        batch = {
            "prompt_embeds": np.asarray(txt, np.float32),
            "pooled_prompt_embeds": np.asarray(pooled, np.float32),
        }
        import dataclasses as _dc

        key = jax.random.PRNGKey(7)
        exact = agent.sample(
            tpm_params, batch, key, predict=True,
            sampler_cfg=_dc.replace(
                agent.sampler_cfg, predict=True, cache_activations=False
            ),
        )
        fast = agent.sample(
            tpm_params, batch, key, predict=True,
            sampler_cfg=_dc.replace(
                agent.sampler_cfg, predict=True, cache_activations=False,
                cache_interval=2,
            ),
        )
        assert np.isfinite(np.asarray(fast.final_latents)).all()
        assert fast.final_latents.shape == exact.final_latents.shape
        # step 0 is a full forward in both; trajectories stay in the same
        # ballpark (approximation, not divergence)
        d = float(jnp.abs(exact.final_latents - fast.final_latents).mean())
        assert d < float(jnp.abs(exact.final_latents).mean()) * 2.0

    def test_generate_fixed_cached(self, toy, pipe):
        em = self._embeds(toy, 1)
        exact = pipe.generate_fixed(
            em["prompt_embeds"], em["pooled_prompt_embeds"],
            em["negative_prompt_embeds"], em["negative_pooled_prompt_embeds"],
            num_steps=4, guidance_scale=3.0, seed=1,
        )
        fast = pipe.generate_fixed(
            em["prompt_embeds"], em["pooled_prompt_embeds"],
            em["negative_prompt_embeds"], em["negative_pooled_prompt_embeds"],
            num_steps=4, guidance_scale=3.0, seed=1, cache_interval=2,
        )
        assert fast.shape == exact.shape
        assert np.isfinite(fast).all()
