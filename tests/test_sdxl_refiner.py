"""SDXL refiner family: topology oracle, converter, aesthetic CFG, ensemble.

The refiner is the second expert of SDXL's ensemble-of-experts (beyond-
reference family; the reference ships SD3 + SD1.5 only). What is pinned
here:
- the (0,4,4,0)-style wiring with attention-free FIRST AND LAST levels and
  5 time_ids against the independent torch functional oracle from
  tests/test_sdxl_fullstack.py (which is config-generic);
- diffusers-layout converter round-trip at refiner topology;
- the aesthetic-score micro-conditioning: cond/uncond CFG branches carry
  DIFFERENT time_ids rows (aesthetic 6.0 vs 2.5), unlike base SDXL;
- adaptive ensemble-of-experts handoff: base stops at the denoising_end
  cutoff, refiner resumes from the exact per-sample (latents, t) handoff;
- standalone image refinement (img2img at low strength).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
from tpdm_tpu.models.vae import VAEConfig
from tpdm_tpu.train.config import RLOOConfig
from tpdm_tpu.train.sdxl_agent import SDXLAgent, SDXLRefinerAgent
from tpdm_tpu.utils.convert import convert_unet_sdxl, export_unet_sdxl


def _toy_rloo_config(**kw):
    d = dict(max_inference_steps=8, init_alpha=1.5, init_beta=0.5)
    d.update(kw)
    return RLOOConfig(**d)


@pytest.fixture(scope="module")
def refiner_world():
    cfg = UNetConfig.toy_refiner()
    unet = UNetSD15(cfg)
    key = jax.random.PRNGKey(11)
    b, n_ctx = 2, 5
    latents = jax.random.normal(
        jax.random.fold_in(key, 1), (b, 4, cfg.sample_size, cfg.sample_size)
    )
    timestep = jnp.array([17.0, 643.0])
    ctx = jax.random.normal(
        jax.random.fold_in(key, 2), (b, n_ctx, cfg.cross_attention_dim)
    )
    added = {
        "text_embeds": jax.random.normal(
            jax.random.fold_in(key, 3), (b, cfg.addition_pooled_dim)
        ),
        # refiner ids: [orig_h, orig_w, crop_top, crop_left, aesthetic]
        "time_ids": jnp.asarray(
            [[128.0, 128.0, 0.0, 0.0, 6.0], [96.0, 64.0, 8.0, 4.0, 2.5]]
        ),
    }
    params = unet.init(key, latents, timestep, ctx, added)
    params = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(
            jax.random.fold_in(key, x.size % 977), x.shape, x.dtype
        ),
        params,
    )
    return cfg, unet, params, latents, timestep, ctx, added


class TestRefinerTopologyOracle:
    def test_presets(self):
        big = UNetConfig.sdxl_refiner()
        assert big.depths == (0, 4, 4, 0)
        assert big.num_time_ids == 5
        assert big.cross_attention_dim == 1280
        assert big.heads_for(big.block_out_channels[-1]) == 24
        toy = UNetConfig.toy_refiner()
        assert toy.depths == (0, 1, 1, 0) and toy.num_time_ids == 5

    def test_full_forward_matches_torch(self, refiner_world):
        pytest.importorskip("torch")
        from test_sdxl_fullstack import _torch_unet_xl

        cfg, unet, params, latents, timestep, ctx, added = refiner_world
        ours = unet.apply(params, latents, timestep, ctx, added)
        sd = export_unet_sdxl(params)
        want = _torch_unet_xl(sd, cfg, latents, timestep, ctx, added)
        for name, a, b_ in zip(("noise_pred", "t_feat", "h1", "h2"), ours, want):
            a = np.asarray(a, np.float64)
            rel = np.abs(a - b_).max() / (np.abs(b_).max() + 1e-12)
            assert rel < 2e-5, f"{name}: max rel err {rel:.2e}"

    def test_converter_round_trip(self, refiner_world):
        cfg, unet, params, latents, timestep, ctx, added = refiner_world
        sd = export_unet_sdxl(params)
        back = convert_unet_sdxl(
            sd,
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            transformer_layers_per_block=cfg.depths,
            mid_transformer_layers=cfg.mid_transformer_layers,
        )
        a = unet.apply(params, latents, timestep, ctx, added)[0]
        b_ = unet.apply(back, latents, timestep, ctx, added)[0]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-6
        )

    def test_attention_free_levels_have_no_attn_params(self, refiner_world):
        _, _, params, *_ = refiner_world
        names = set(params["params"])
        assert "down_1_attn_0" in names and "down_2_attn_0" in names
        assert "down_0_attn_0" not in names and "down_3_attn_0" not in names
        assert "up_0_attn_0" not in names and "up_3_attn_0" not in names


def _tiny_tpm(ucfg):
    from tpdm_tpu.models.tpm import TimePredictor

    return TimePredictor(
        conv_out_channels=4,
        in_channels=2 * ucfg.block_out_channels[0],
        temb_dim=ucfg.block_out_channels[0],
    )


def _refiner_agent(cfg=None, **kw):
    ucfg = UNetConfig.toy_refiner()
    unet = UNetSD15(ucfg)
    key = jax.random.PRNGKey(0)
    b = 2
    params = unet.init(
        key,
        jnp.zeros((b, 4, ucfg.sample_size, ucfg.sample_size)),
        jnp.zeros((b,)),
        jnp.zeros((b, 5, ucfg.cross_attention_dim)),
        {
            "text_embeds": jnp.zeros((b, ucfg.addition_pooled_dim)),
            "time_ids": jnp.zeros((b, 5)),
        },
    )
    return SDXLRefinerAgent(
        unet, params, cfg or _toy_rloo_config(), tpm=_tiny_tpm(ucfg), **kw
    )


def _refiner_batch(agent, b=2, seed=3):
    ucfg = agent.unet.config
    key = jax.random.PRNGKey(seed)
    return {
        "prompt_embeds": jax.random.normal(
            jax.random.fold_in(key, 0), (b, 5, ucfg.cross_attention_dim)
        ),
        "negative_prompt_embeds": jax.random.normal(
            jax.random.fold_in(key, 1), (b, 5, ucfg.cross_attention_dim)
        ),
        "pooled_prompt_embeds": jax.random.normal(
            jax.random.fold_in(key, 2), (b, ucfg.addition_pooled_dim)
        ),
        "negative_pooled_prompt_embeds": jax.random.normal(
            jax.random.fold_in(key, 3), (b, ucfg.addition_pooled_dim)
        ),
    }


class TestRefinerAgent:
    def test_rejects_six_id_config(self):
        ucfg = UNetConfig.toy_xl()
        unet = UNetSD15(ucfg)
        with pytest.raises(ValueError, match="num_time_ids=5"):
            SDXLRefinerAgent(unet, {}, _toy_rloo_config())

    def test_default_time_ids_carry_aesthetic(self):
        agent = _refiner_agent(aesthetic_score=6.0)
        ids = agent.default_time_ids(3)
        assert ids.shape == (3, 5)
        assert float(ids[0, -1]) == 6.0
        neg = agent.negative_time_ids(ids)
        assert float(neg[0, -1]) == 2.5
        np.testing.assert_array_equal(np.asarray(neg[:, :4]), np.asarray(ids[:, :4]))

    def test_negative_aesthetic_steers_cfg(self):
        """The uncond branch must actually see the negative aesthetic
        score: two agents differing ONLY in negative_aesthetic_score must
        produce different guided predictions on identical params/inputs."""
        a1 = _refiner_agent(negative_aesthetic_score=2.5)
        a2 = SDXLRefinerAgent(
            a1.unet, a1.unet_params, _toy_rloo_config(),
            tpm=_tiny_tpm(a1.unet.config), negative_aesthetic_score=5.9,
        )
        batch = _refiner_batch(a1)
        lat = jnp.ones((2, 4, 16, 16))
        t = jnp.asarray([500.0, 500.0])
        e1 = a1.denoise_builder(a1.unet_params, batch)(lat, t)[0]
        e2 = a2.denoise_builder(a2.unet_params, batch)(lat, t)[0]
        assert float(jnp.abs(e1 - e2).max()) > 1e-7

    def test_explicit_negative_time_ids_win(self):
        agent = _refiner_agent()
        ids = agent.default_time_ids(2)
        explicit = np.full((2, 5), 7.0, np.float32)
        out = agent.negative_time_ids(ids, {"negative_time_ids": explicit})
        np.testing.assert_array_equal(np.asarray(out), explicit)

    def test_adaptive_sample_runs_and_replays(self):
        agent = _refiner_agent()
        batch = _refiner_batch(agent)
        tpm = agent.init_tpm_params(jax.random.PRNGKey(7))
        out = agent.sample(tpm, batch, jax.random.PRNGKey(5))
        assert np.isfinite(np.asarray(out.final_latents)).all()
        lp = agent.logprobs(tpm, out)
        recorded = np.asarray(out.logprobs)
        valid = ~np.asarray(out.prob_masks)
        np.testing.assert_allclose(
            np.asarray(lp)[valid], recorded[valid], rtol=1e-5, atol=1e-5
        )


def _pipelines(seed=0):
    from tpdm_tpu.models.vae import VAE
    from tpdm_tpu.pipeline.variants import SDXLPipeline, SDXLRefinerPipeline

    base_cfg = UNetConfig.toy_xl()
    base_unet = UNetSD15(base_cfg)
    key = jax.random.PRNGKey(seed)
    b = 2
    bparams = base_unet.init(
        key,
        jnp.zeros((b, 4, 16, 16)),
        jnp.zeros((b,)),
        jnp.zeros((b, 5, base_cfg.cross_attention_dim)),
        {
            "text_embeds": jnp.zeros((b, base_cfg.addition_pooled_dim)),
            "time_ids": jnp.zeros((b, 6)),
        },
    )
    base_agent = SDXLAgent(
        base_unet, bparams, _toy_rloo_config(), tpm=_tiny_tpm(base_cfg)
    )
    ref_agent = _refiner_agent()

    vae = VAE(VAEConfig.toy(latent_channels=4))
    vparams = vae.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 4, 16, 16)),
        jnp.zeros((1, 3, 32, 32)),
    )
    base = SDXLPipeline(base_agent, vae=vae, vae_params=vparams)
    refiner = SDXLRefinerPipeline(ref_agent, vae=vae, vae_params=vparams)
    return base, refiner


class TestEnsemble:
    def test_handoff_semantics(self):
        from tpdm_tpu.pipeline.variants import sdxl_ensemble_generate

        base, refiner = _pipelines()
        b = 2
        key = jax.random.PRNGKey(9)
        bb = _refiner_batch(base.agent)  # same shapes minus ctx dim
        bb["prompt_embeds"] = jax.random.normal(
            jax.random.fold_in(key, 0),
            (b, 5, base.agent.unet.config.cross_attention_dim),
        )
        bb["negative_prompt_embeds"] = jax.random.normal(
            jax.random.fold_in(key, 1),
            (b, 5, base.agent.unet.config.cross_attention_dim),
        )
        rb = _refiner_batch(refiner.agent)
        res = sdxl_ensemble_generate(
            base, refiner, denoising_end=0.75, seed=4,
            base_kwargs=bb, refiner_kwargs=rb,
        )
        t_cut = int(round(999 * 0.25))
        base_sched = res.base_schedule  # (b, T+1)
        # every base time BEFORE the handoff is >= cutoff; the handoff
        # itself is the first time below it
        for i in range(b):
            hand = res.handoff_t[i]
            assert hand < t_cut
            trail = base_sched[i]
            pre = trail[trail > hand]
            assert (pre >= t_cut).all(), (trail, hand)
        # refiner resumed exactly at the handoff
        np.testing.assert_array_equal(res.refiner_schedule[:, 0], res.handoff_t)
        assert res.num_steps == res.base_steps + res.refiner_steps
        assert res.images.shape[0] == b
        assert np.isfinite(res.images.astype(np.float64)).all()

    def test_invalid_denoising_end(self):
        from tpdm_tpu.pipeline.variants import sdxl_ensemble_generate

        base, refiner = _pipelines()
        with pytest.raises(ValueError, match="denoising_end"):
            sdxl_ensemble_generate(base, refiner, denoising_end=1.5)

    def test_refine_from_image(self):
        base, refiner = _pipelines()
        rb = _refiner_batch(refiner.agent)
        img = np.random.default_rng(0).integers(
            0, 256, (2, 32, 32, 3), np.uint8
        )
        res = refiner.refine(init_image=img, strength=0.3, seed=2, **rb)
        # integer-t img2img entry: schedule starts at round(0.3*999)
        assert int(res.schedule[0, 0]) == int(round(0.3 * 999))
        assert res.images.shape == (2, 32, 32, 3)

    def test_refine_validates_inputs(self):
        base, refiner = _pipelines()
        rb = _refiner_batch(refiner.agent)
        with pytest.raises(ValueError, match="exactly one"):
            refiner.refine(**rb)
        with pytest.raises(ValueError, match="init_t"):
            refiner.refine(latents=jnp.zeros((2, 4, 16, 16)), **rb)
        with pytest.raises(NotImplementedError, match="refiner"):
            refiner.generate()
