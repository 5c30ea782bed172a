"""SD1.5 variant: DPM-Solver math oracles, UNet contract, adaptive loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpdm_tpu.ops.dpm_solver import (
    ddpm_sigmas_from_betas,
    dpm_first_order_update,
    dpm_second_order_update,
    epsilon_to_x0,
    sigma_of_timestep,
    sigma_to_alpha_sigma_t,
)


class TestDPMSolverMath:
    """Oracles re-derive the reference formulas (utilis_sd_v1_5.py:63-204)
    with torch ops on per-sample sigma tensors."""

    def _torch_alpha_sigma(self, sigma):
        alpha_t = 1.0 / (sigma**2 + 1) ** 0.5
        return alpha_t, sigma * alpha_t

    def test_sigma_table_matches_diffusers_formula(self):
        betas = torch.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
        ac = torch.cumprod(1 - betas, 0)
        ref = ((1 - ac) / ac) ** 0.5
        ours = ddpm_sigmas_from_betas()
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-3, atol=1e-4)

    def test_epsilon_to_x0(self):
        rng = np.random.default_rng(0)
        b = 3
        sample = rng.normal(size=(b, 2, 4, 4)).astype(np.float32)
        eps = rng.normal(size=(b, 2, 4, 4)).astype(np.float32)
        sigma = rng.uniform(0.1, 10, b).astype(np.float32)
        ours = epsilon_to_x0(jnp.array(eps), jnp.array(sample), jnp.array(sigma))
        a, st = self._torch_alpha_sigma(torch.tensor(sigma).view(-1, 1, 1, 1))
        ref = (torch.tensor(sample) - st * torch.tensor(eps)) / a
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_first_order_update(self):
        rng = np.random.default_rng(1)
        b = 2
        x0 = rng.normal(size=(b, 2, 4, 4)).astype(np.float32)
        sample = rng.normal(size=(b, 2, 4, 4)).astype(np.float32)
        sigma_t = rng.uniform(0.1, 1.0, b).astype(np.float32)
        sigma_s = sigma_t + rng.uniform(0.5, 2.0, b).astype(np.float32)
        ours = dpm_first_order_update(
            jnp.array(x0), jnp.array(sample), jnp.array(sigma_t), jnp.array(sigma_s)
        )
        at, st = self._torch_alpha_sigma(torch.tensor(sigma_t).view(-1, 1, 1, 1))
        as_, ss = self._torch_alpha_sigma(torch.tensor(sigma_s).view(-1, 1, 1, 1))
        h = (torch.log(at) - torch.log(st)) - (torch.log(as_) - torch.log(ss))
        ref = (st / ss) * torch.tensor(sample) - at * (torch.exp(-h) - 1) * torch.tensor(x0)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("solver_type", ["midpoint", "heun"])
    def test_second_order_update(self, solver_type):
        rng = np.random.default_rng(2)
        b = 2
        m0 = rng.normal(size=(b, 2, 4, 4)).astype(np.float32)
        m1 = rng.normal(size=(b, 2, 4, 4)).astype(np.float32)
        sample = rng.normal(size=(b, 2, 4, 4)).astype(np.float32)
        sigma_t = rng.uniform(0.1, 0.5, b).astype(np.float32)
        sigma_s0 = sigma_t + rng.uniform(0.2, 1.0, b).astype(np.float32)
        sigma_s1 = sigma_s0 + rng.uniform(0.2, 1.0, b).astype(np.float32)
        ours = dpm_second_order_update(
            jnp.array(m0), jnp.array(m1), jnp.array(sample),
            jnp.array(sigma_t), jnp.array(sigma_s0), jnp.array(sigma_s1),
            solver_type=solver_type,
        )

        def las(sig):
            a, s = self._torch_alpha_sigma(torch.tensor(sig).view(-1, 1, 1, 1))
            return a, s, torch.log(a) - torch.log(s)

        at, st, lt = las(sigma_t)
        a0, s0, l0 = las(sigma_s0)
        a1, s1, l1 = las(sigma_s1)
        h, h0 = lt - l0, l0 - l1
        r0 = h0 / h
        D0 = torch.tensor(m0)
        D1 = (torch.tensor(m0) - torch.tensor(m1)) / r0
        if solver_type == "midpoint":
            ref = (
                (st / s0) * torch.tensor(sample)
                - at * (torch.exp(-h) - 1) * D0
                - 0.5 * at * (torch.exp(-h) - 1) * D1
            )
        else:
            ref = (
                (st / s0) * torch.tensor(sample)
                - at * (torch.exp(-h) - 1) * D0
                + at * ((torch.exp(-h) - 1) / h + 1) * D1
            )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_sigma_interpolation_at_integers(self):
        table = ddpm_sigmas_from_betas()
        t = jnp.array([0.0, 10.0, 999.0])
        out = sigma_of_timestep(table, t)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(table)[[0, 10, 999]], rtol=1e-6
        )


@pytest.fixture(scope="module")
def sd15_world():
    from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15

    cfg = UNetConfig.toy()
    unet = UNetSD15(cfg)
    b, n_txt = 2, 7
    lat = jax.random.normal(jax.random.PRNGKey(0), (b, 4, cfg.sample_size, cfg.sample_size))
    t = jnp.array([999.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, n_txt, cfg.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(2), lat, t, ctx)
    return cfg, unet, params, (lat, t, ctx)


class TestUNetSD15:
    def test_four_output_contract(self, sd15_world):
        cfg, unet, params, (lat, t, ctx) = sd15_world
        eps, temb, h1, h2 = unet.apply(params, lat, t, ctx)
        b = lat.shape[0]
        s = cfg.sample_size
        assert eps.shape == lat.shape
        # pre-MLP sinusoidal width (reference returns time_proj output,
        # unet_sd_v1_5.py:929,1316)
        assert temb.shape == (b, cfg.block_out_channels[0])
        assert h1.shape == (b, cfg.block_out_channels[0], s, s)
        assert h2.shape == (b, cfg.block_out_channels[0], s, s)
        for a in (eps, temb, h1, h2):
            assert np.isfinite(np.asarray(a)).all()

    def test_timestep_sensitivity(self, sd15_world):
        cfg, unet, params, (lat, _, ctx) = sd15_world
        e1, *_ = unet.apply(params, lat, jnp.array([999.0, 999.0]), ctx)
        e2, *_ = unet.apply(params, lat, jnp.array([10.0, 10.0]), ctx)
        assert float(jnp.abs(e1 - e2).mean()) > 1e-5

    def test_context_sensitivity(self, sd15_world):
        cfg, unet, params, (lat, t, ctx) = sd15_world
        e1, *_ = unet.apply(params, lat, t, ctx)
        e2, *_ = unet.apply(params, lat, t, ctx * 2.0)
        assert float(jnp.abs(e1 - e2).mean()) > 1e-6


class TestSD15Sampler:
    def _setup(self):
        from tpdm_tpu.models import TimePredictor
        from tpdm_tpu.pipeline.sd15_sampler import (
            SD15SamplerConfig,
            sd15_adaptive_sample,
        )

        b = 2
        ch = 6

        def denoise_fn(latents, t):
            eps = latents * 0.5
            temb = jnp.tile(t[:, None] / 999.0, (1, 8))
            h = jnp.tile(latents.mean(axis=1, keepdims=True), (1, 2 * ch, 1, 1))
            return eps, temb, h

        tpm = TimePredictor(conv_out_channels=4, in_channels=2 * ch, temb_dim=8)
        params = tpm.init(
            jax.random.PRNGKey(0), jnp.zeros((b, 2 * ch, 8, 8)), jnp.zeros((b, 8))
        )
        lat = jax.random.normal(jax.random.PRNGKey(1), (b, 4, 8, 8))
        return denoise_fn, tpm, params, lat, SD15SamplerConfig, sd15_adaptive_sample

    def test_time_decay_and_masks(self):
        denoise_fn, tpm, params, lat, Cfg, sample = self._setup()
        cfg = Cfg(num_inference_steps=12, min_time=10)
        out = sample(
            denoise_fn, lambda h, t: tpm.apply(params, h, t), lat,
            jax.random.PRNGKey(2), cfg,
        )
        times = np.asarray(out.times)
        n = int(out.num_steps)
        assert (times[:, 0] == 999).all()
        for i in range(times.shape[0]):
            # strictly decreasing until finished
            for j in range(1, n + 1):
                assert times[i, j] <= times[i, j - 1]
        # masks correspond to t < min_time at step start
        masks = np.asarray(out.prob_masks)
        for i in range(times.shape[0]):
            np.testing.assert_array_equal(masks[i, :n], times[i, :n] < 10)

    def test_early_stop_when_aggressive(self):
        denoise_fn, tpm, params, lat, Cfg, sample = self._setup()
        aggressive = lambda h, t: jnp.tile(jnp.array([[1.05, 51.0]]), (h.shape[0], 1))
        cfg = Cfg(num_inference_steps=25, min_time=10, predict=True)
        out = sample(denoise_fn, aggressive, lat, jax.random.PRNGKey(3), cfg)
        assert int(out.num_steps) < 8
        # finished samples pinned to t == 0
        assert (np.asarray(out.times)[:, int(out.num_steps)] == 0).all()

    def test_replay_matches_rollout(self):
        from tpdm_tpu.pipeline.sd15_sampler import sd15_replay_logprobs

        denoise_fn, tpm, params, lat, Cfg, sample = self._setup()
        cfg = Cfg(num_inference_steps=10, min_time=50)
        tpm_fn = lambda h, t: tpm.apply(params, h, t)
        out = sample(denoise_fn, tpm_fn, lat, jax.random.PRNGKey(4), cfg)
        lp = sd15_replay_logprobs(
            tpm_fn, out.h_cache, out.temb_cache, out.ratios, out.prob_masks, cfg
        )
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(out.logprobs), rtol=1e-4, atol=1e-5
        )


    def test_step_caps_none_equals_full(self):
        denoise_fn, tpm, params, lat, Cfg, sample = self._setup()
        cfg = Cfg(num_inference_steps=8, min_time=10, predict=True)
        tpm_fn = lambda h, t: tpm.apply(params, h, t)
        a = sample(denoise_fn, tpm_fn, lat, jax.random.PRNGKey(5), cfg)
        b = sample(denoise_fn, tpm_fn, lat, jax.random.PRNGKey(5), cfg,
                   step_caps=jnp.array([8, 8], jnp.int32))
        np.testing.assert_array_equal(np.asarray(a.final_latents),
                                      np.asarray(b.final_latents))
        np.testing.assert_array_equal(np.asarray(a.times), np.asarray(b.times))
        np.testing.assert_array_equal(np.asarray(a.last_valid_index),
                                      np.asarray(b.last_valid_index))

    def test_step_caps_per_sample(self):
        """Capped sample executes exactly cap steps; its terminal step
        integrates to x0 (t pinned to 0 after cap); the uncapped sample is
        untouched by its neighbor's cap."""
        denoise_fn, tpm, params, lat, Cfg, sample = self._setup()
        cfg = Cfg(num_inference_steps=10, min_time=10, predict=True)
        tpm_fn = lambda h, t: tpm.apply(params, h, t)
        full = sample(denoise_fn, tpm_fn, lat, jax.random.PRNGKey(6), cfg)
        capped = sample(denoise_fn, tpm_fn, lat, jax.random.PRNGKey(6), cfg,
                        step_caps=jnp.array([3, 10], jnp.int32))
        lvi = np.asarray(capped.last_valid_index)
        assert lvi[0] == 2  # 3 steps -> last valid index 2
        times = np.asarray(capped.times)
        assert (times[0, 3:] == 0).all()  # pinned after the cap
        # sample 1 (uncapped) matches the all-uncapped run exactly
        np.testing.assert_array_equal(times[1], np.asarray(full.times)[1])
        np.testing.assert_array_equal(
            np.asarray(capped.final_latents)[1], np.asarray(full.final_latents)[1]
        )
        assert np.isfinite(np.asarray(capped.final_latents)).all()


class TestSD15TrainerIntegration:
    def test_rloo_trainer_runs_with_sd15_agent(self):
        from tpdm_tpu.models import TimePredictor
        from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
        from tpdm_tpu.train import RLOOConfig, RLOOTrainer
        from tpdm_tpu.train.sd15_agent import SD15Agent

        cfg = UNetConfig.toy()
        unet = UNetSD15(cfg)
        b = 4
        n_txt = 7
        params = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 4, cfg.sample_size, cfg.sample_size)),
            jnp.ones((2,)),
            jnp.zeros((2, n_txt, cfg.cross_attention_dim)),
        )
        config = RLOOConfig(
            per_device_train_batch_size=b,
            rloo_k=2,
            max_inference_steps=3,
            total_episodes=2 * b,
            learning_rate=1e-3,
            kl_coef=0.0,
        )
        agent = SD15Agent(
            unet,
            params,
            config,
            tpm=TimePredictor(
                conv_out_channels=4,
                in_channels=2 * cfg.block_out_channels[0],
                temb_dim=cfg.time_embed_dim,
            ),
        )
        rng = np.random.default_rng(0)
        dataset = [
            {
                "prompt": f"p{i}",
                "prompt_embeds": rng.normal(size=(n_txt, cfg.cross_attention_dim)).astype(np.float32),
                "negative_prompt_embeds": np.zeros((n_txt, cfg.cross_attention_dim), np.float32),
            }
            for i in range(4)
        ]

        def reward_fn(prompts, outputs):
            s = np.asarray(jnp.tanh(outputs.final_latents.mean(axis=(1, 2, 3))))
            return s, s

        trainer = RLOOTrainer(config, agent, reward_fn, dataset)
        p0 = agent.init_tpm_params(jax.random.PRNGKey(9))
        p1, _ = trainer.train(tpm_params=jax.tree.map(jnp.copy, p0))
        m = trainer.metrics_history[-1]
        assert np.isfinite(list(m.values())).all()
        assert m["objective/kl"] == 0.0  # SD1.5 KL identically zero
        diffs = jax.tree.map(lambda a, b_: float(jnp.abs(a - b_).max()), p0, p1)
        assert max(jax.tree.leaves(diffs)) > 0

    def test_eval_callback_on_trained_policy(self, tmp_path):
        """Eval-callback pseudo-sigma branch against a TRAINED SD1.5 policy
        (not a fresh init): the callback runs inside a real training run,
        recomputes rewards on eval outputs produced under
        cache_activations=False, and the times-derived pseudo-sigmas it
        plots are a valid decreasing schedule (reference eval flow:
        src/train/callbacks.py:54-97 with the SD1.5 model's integer-t
        outputs, src/models/stable_diffusion_v1_5/modeling_sd_v1_5.py:816-825).
        """
        from tpdm_tpu.models import TimePredictor
        from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
        from tpdm_tpu.train import RLOOConfig, RLOOTrainer
        from tpdm_tpu.train.callbacks import EvalVisualizationCallback
        from tpdm_tpu.train.sd15_agent import SD15Agent

        cfg = UNetConfig.toy()
        unet = UNetSD15(cfg)
        b = 4
        n_txt = 7
        params = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, 4, cfg.sample_size, cfg.sample_size)),
            jnp.ones((2,)),
            jnp.zeros((2, n_txt, cfg.cross_attention_dim)),
        )
        config = RLOOConfig(
            per_device_train_batch_size=b,
            rloo_k=2,
            max_inference_steps=3,
            total_episodes=2 * b,
            learning_rate=1e-3,
            kl_coef=0.0,
        )
        agent = SD15Agent(
            unet, params, config,
            tpm=TimePredictor(
                conv_out_channels=4,
                in_channels=2 * cfg.block_out_channels[0],
                temb_dim=cfg.time_embed_dim,
            ),
        )
        rng = np.random.default_rng(0)
        dataset = [
            {
                "prompt": f"p{i}",
                "prompt_embeds": rng.normal(
                    size=(n_txt, cfg.cross_attention_dim)
                ).astype(np.float32),
                "negative_prompt_embeds": np.zeros(
                    (n_txt, cfg.cross_attention_dim), np.float32
                ),
            }
            for i in range(4)
        ]

        def reward_fn(prompts, outputs):
            s = np.asarray(jnp.tanh(outputs.final_latents.mean(axis=(1, 2, 3))))
            return s, s

        eval_batch = {
            "prompt": ["e0", "e1"],
            "prompt_embeds": jnp.asarray(
                rng.normal(size=(2, n_txt, cfg.cross_attention_dim)),
                jnp.float32,
            ),
            "negative_prompt_embeds": jnp.zeros(
                (2, n_txt, cfg.cross_attention_dim), jnp.float32
            ),
        }
        cb = EvalVisualizationCallback(
            eval_batch, str(tmp_path), reward_fn=reward_fn, eval_steps=2,
            max_inference_steps=4,
        )
        trainer = RLOOTrainer(
            config, agent, reward_fn, dataset, callbacks=[cb]
        )
        trainer.train()

        # fired at update 2 of 2, with the policy the run actually trained
        assert len(cb.history) == 1
        rec = cb.history[0]
        assert rec["update"] == 2
        # rewards recomputed on the eval rollout (weak item: this path)
        assert rec["rewards"].shape == (2,) and np.isfinite(rec["rewards"]).all()
        # pseudo-sigmas t/1000: in (0, 1], strictly decreasing while alive
        sig = rec["sigmas"]
        assert sig.shape == (2, 4)
        assert (sig <= 1.0).all() and (sig >= 0.0).all()
        alive = np.asarray(rec["masks"])[:, :] == 0  # mask 1 = already done
        for i in range(2):
            s_alive = sig[i][alive[i][: sig.shape[1]]]
            assert (np.diff(s_alive) < 0).all()
        # curve figure written to disk for the trained policy
        assert (tmp_path / "eval_curves_2.png").exists()


class TestSD15Pipeline:
    def test_generate_with_text_encoder_and_vae(self):
        from tpdm_tpu.models import TimePredictor
        from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
        from tpdm_tpu.models.vae import VAE, VAEConfig
        from tpdm_tpu.pipeline.variants import SD15Pipeline
        from tpdm_tpu.train import RLOOConfig
        from tpdm_tpu.train.sd15_agent import SD15Agent

        cfg = UNetConfig.toy(cross_attention_dim=32)
        unet = UNetSD15(cfg)
        tcfg = CLIPTextConfig.toy(hidden_size=32, max_position_embeddings=8)
        text = CLIPTextModel(tcfg)
        key = jax.random.PRNGKey(0)
        text_params = text.init(key, jnp.zeros((1, 8), jnp.int32))
        unet_params = unet.init(
            key,
            jnp.zeros((2, 4, cfg.sample_size, cfg.sample_size)),
            jnp.ones((2,)),
            jnp.zeros((2, 8, 32)),
        )
        config = RLOOConfig(max_inference_steps=4)
        agent = SD15Agent(
            unet, unet_params, config,
            tpm=TimePredictor(
                conv_out_channels=4,
                in_channels=2 * cfg.block_out_channels[0],
                temb_dim=cfg.time_embed_dim,
            ),
        )
        vae = VAE(VAEConfig.toy(latent_channels=4))
        vae_params = vae.init(
            key,
            jnp.zeros((1, 4, cfg.sample_size, cfg.sample_size)),
            jnp.zeros((1, 3, 2 * cfg.sample_size, 2 * cfg.sample_size)),
        )
        pipe = SD15Pipeline(agent, vae, vae_params, text, text_params)
        ids = np.array([[97, 1, 2, 98, 0, 0, 0, 0]], np.int32)
        res = pipe.generate(clip_ids=ids, negative_clip_ids=np.zeros_like(ids))
        assert res.images.shape == (1, 2 * cfg.sample_size, 2 * cfg.sample_size, 3)
        assert res.images.dtype == np.uint8
        assert res.schedule[0, 0] == 999


class TestSD15BlockOracles:
    def test_resnet_time_emb_matches_torch(self):
        from tpdm_tpu.models.unet_sd15 import ResnetBlockTimeEmb

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
        temb = rng.normal(size=(2, 12)).astype(np.float32)
        block = ResnetBlockTimeEmb(out_channels=12, groups=4)
        params = block.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(temb))
        ours = block.apply(params, jnp.array(x), jnp.array(temb))

        import torch.nn.functional as F

        p = params["params"]
        xt = torch.tensor(x).permute(0, 3, 1, 2)

        def conv(h, name, k=3):
            w = torch.tensor(np.asarray(p[name]["kernel"])).permute(3, 2, 0, 1)
            return F.conv2d(h, w, torch.tensor(np.asarray(p[name]["bias"])), padding=(k - 1) // 2)

        def gn(h, name):
            return F.group_norm(
                h, 4,
                torch.tensor(np.asarray(p[name]["scale"])),
                torch.tensor(np.asarray(p[name]["bias"])), eps=1e-6,
            )

        h = conv(F.silu(gn(xt, "norm1")), "conv1")
        te = F.silu(torch.tensor(temb)) @ torch.tensor(np.asarray(p["time_emb_proj"]["kernel"])) + torch.tensor(np.asarray(p["time_emb_proj"]["bias"]))
        h = h + te[:, :, None, None]
        h = conv(F.silu(gn(h, "norm2")), "conv2")
        short = conv(xt, "conv_shortcut", k=1)
        ref = (short + h).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-3, atol=1e-4)

    def test_spatial_transformer_matches_torch(self):
        """diffusers Transformer2DModel: GN -> 1x1 conv in -> basic block
        (self-attn, cross-attn, GEGLU) -> 1x1 conv out + residual."""
        from tpdm_tpu.models.unet_sd15 import SpatialTransformer

        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        c, heads, ctx_dim = 8, 2, 6
        x = rng.normal(size=(1, 4, 4, c)).astype(np.float32)
        ctx = rng.normal(size=(1, 3, ctx_dim)).astype(np.float32)
        st = SpatialTransformer(dim=c, heads=heads, ctx_dim=ctx_dim, groups=4)
        params = st.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(ctx))
        ours = st.apply(params, jnp.array(x), jnp.array(ctx))

        p = params["params"]
        xt = torch.tensor(x)
        h = F.group_norm(
            xt.permute(0, 3, 1, 2), 4,
            torch.tensor(np.asarray(p["norm"]["scale"])),
            torch.tensor(np.asarray(p["norm"]["bias"])), eps=1e-6,
        )
        w_in = torch.tensor(np.asarray(p["proj_in"]["kernel"])).permute(3, 2, 0, 1)
        h = F.conv2d(h, w_in, torch.tensor(np.asarray(p["proj_in"]["bias"])))
        h = h.permute(0, 2, 3, 1).reshape(1, 16, c)

        bp = p["block"]

        def lin(t, name, bias=True):
            out = t @ torch.tensor(np.asarray(bp[name]["kernel"]))
            if bias and "bias" in bp[name]:
                out = out + torch.tensor(np.asarray(bp[name]["bias"]))
            return out

        def ln(t, name):
            return F.layer_norm(
                t, (t.shape[-1],),
                torch.tensor(np.asarray(bp[name]["scale"])),
                torch.tensor(np.asarray(bp[name]["bias"])), eps=1e-5,
            )

        def mha(qs, kvs, prefix):
            q = lin(qs, f"{prefix}_to_q", bias=False)
            k = lin(kvs, f"{prefix}_to_k", bias=False)
            v = lin(kvs, f"{prefix}_to_v", bias=False)
            b_, n_, d_ = q.shape
            m_ = k.shape[1]
            hd = d_ // heads
            q = q.view(b_, n_, heads, hd).transpose(1, 2)
            k = k.view(b_, m_, heads, hd).transpose(1, 2)
            v = v.view(b_, m_, heads, hd).transpose(1, 2)
            o = F.scaled_dot_product_attention(q, k, v)
            o = o.transpose(1, 2).reshape(b_, n_, d_)
            return lin(o, f"{prefix}_to_out")

        n1 = ln(h, "norm1")
        h = h + mha(n1, n1, "attn1")
        h = h + mha(ln(h, "norm2"), torch.tensor(ctx), "attn2")
        y = ln(h, "norm3")
        gate = lin(y, "ff_proj")
        a, g = gate.chunk(2, dim=-1)
        y = a * F.gelu(g)
        h = h + lin(y, "ff_out")

        h = h.reshape(1, 4, 4, c).permute(0, 3, 1, 2)
        w_out = torch.tensor(np.asarray(p["proj_out"]["kernel"])).permute(3, 2, 0, 1)
        h = F.conv2d(h, w_out, torch.tensor(np.asarray(p["proj_out"]["bias"])))
        ref = h.permute(0, 2, 3, 1) + xt
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-3, atol=1e-4)


class TestUNetConverter:
    """diffusers UNet2DConditionModel layout <-> UNetSD15 params.

    Round-trips a toy UNet's param tree through the diffusers-layout export
    and back (mapping consistency), and checks canonical diffusers keys and
    torch weight layouts so a systematically wrong mapping can't cancel out.
    """

    def _toy(self):
        from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15

        cfg = UNetConfig.toy(cross_attention_dim=16)
        unet = UNetSD15(cfg)
        params = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, cfg.sample_size, cfg.sample_size)),
            jnp.ones((1,)),
            jnp.zeros((1, 5, 16)),
        )
        return cfg, unet, params

    def test_round_trip_identity(self):
        from tpdm_tpu.utils.convert import convert_unet_sd15, export_unet_sd15

        cfg, unet, params = self._toy()
        sd = export_unet_sd15(params)
        back = convert_unet_sd15(
            sd,
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
        )
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(back)}
        assert len(flat_a) == len(flat_b)
        for k, v in flat_a:
            np.testing.assert_array_equal(np.asarray(v), flat_b[str(k)], err_msg=str(k))
        # converted params actually run
        out = unet.apply(
            back,
            jnp.ones((1, 4, cfg.sample_size, cfg.sample_size)),
            jnp.ones((1,)),
            jnp.ones((1, 5, 16)),
        )[0]
        assert np.isfinite(np.asarray(out)).all()

    def test_canonical_diffusers_keys_and_layouts(self):
        from tpdm_tpu.utils.convert import export_unet_sd15

        cfg, unet, params = self._toy()
        sd = export_unet_sd15(params)
        ch = cfg.block_out_channels
        d = ch[0]
        # canonical key spellings a real SD1.5 checkpoint uses
        for key in (
            "conv_in.weight",
            "time_embedding.linear_1.weight",
            "down_blocks.0.resnets.0.conv1.weight",
            "down_blocks.0.resnets.0.time_emb_proj.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
            "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias",
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
            "down_blocks.0.downsamplers.0.conv.weight",
            "mid_block.attentions.0.proj_in.weight",
            "up_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k.weight",
            "up_blocks.0.upsamplers.0.conv.weight",
            "conv_norm_out.weight",
            "conv_out.bias",
        ):
            assert key in sd, key
        # torch layouts: conv (out, in, kh, kw); dense (out, in)
        assert sd["conv_in.weight"].shape == (d, 4, 3, 3)
        assert sd["down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"].shape == (
            d,
            cfg.cross_attention_dim,
        )
        assert sd[
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight"
        ].shape == (8 * d, d)
        # attn projections carry no bias (diffusers SD1.5)
        assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.bias" not in sd
        # UpBlock2D (up_blocks.0) has no attentions
        assert not any(k.startswith("up_blocks.0.attentions") for k in sd)
