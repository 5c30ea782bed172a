"""SDXL family: generalized UNet topology, agent protocol, converter,
text encoding, and pipeline.

Beyond-reference model family — the reference ships SD3 + SD1.5
(src/models/stable_diffusion_v1_5/modeling_sd_v1_5.py); SDXL reuses the
same integer-t DPM-Solver++ adaptive machinery with the SDXL conditioning
surface (dual CLIP towers + text_time added embedding). Block-level math
is covered by the SD1.5/CLIP torch oracles (tests/test_sd15_fullstack.py,
tests/test_text_encoders.py); these tests pin the SDXL-specific wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15


def _added(b, cfg, fill=1.0):
    px = float(cfg.sample_size * 8)
    return {
        "text_embeds": jnp.full((b, cfg.addition_pooled_dim), fill, jnp.float32),
        "time_ids": jnp.tile(
            jnp.asarray([px, px, 0.0, 0.0, px, px], jnp.float32), (b, 1)
        ),
    }


@pytest.fixture(scope="module")
def xl_world():
    cfg = UNetConfig.toy_xl()
    unet = UNetSD15(cfg)
    lat = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 16, 16)), jnp.float32)
    t = jnp.asarray([100.0, 500.0])
    ctx = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 7, cfg.cross_attention_dim)),
        jnp.float32,
    )
    params = unet.init(jax.random.PRNGKey(0), lat, t, ctx, _added(2, cfg))
    return cfg, unet, params, lat, t, ctx


class TestUNetSDXLTopology:
    def test_four_output_contract(self, xl_world):
        cfg, unet, params, lat, t, ctx = xl_world
        eps, t_feat, h1, h2 = unet.apply(params, lat, t, ctx, _added(2, cfg))
        assert eps.shape == (2, 4, 16, 16)
        assert t_feat.shape == (2, cfg.block_out_channels[0])
        assert h1.shape == h2.shape == (2, cfg.block_out_channels[0], 16, 16)
        assert all(bool(jnp.isfinite(x).all()) for x in (eps, t_feat, h1, h2))

    def test_added_cond_required(self, xl_world):
        cfg, unet, params, lat, t, ctx = xl_world
        with pytest.raises(ValueError, match="addition_embed"):
            unet.apply(params, lat, t, ctx)

    def test_added_cond_sensitivity(self, xl_world):
        """Both pooled text and time_ids must reach the output."""
        cfg, unet, params, lat, t, ctx = xl_world
        base = unet.apply(params, lat, t, ctx, _added(2, cfg))[0]
        other_pool = unet.apply(params, lat, t, ctx, _added(2, cfg, fill=-2.0))[0]
        ac = _added(2, cfg)
        ac["time_ids"] = ac["time_ids"] * 0.25  # different size/crop ids
        other_ids = unet.apply(params, lat, t, ctx, ac)[0]
        assert float(jnp.abs(base - other_pool).max()) > 1e-6
        assert float(jnp.abs(base - other_ids).max()) > 1e-6

    def test_depth_and_gating_structure(self, xl_world):
        """toy_xl depths (0,1,2): level 0 attention-free (SDXL DownBlock2D),
        level 2 depth-2 (block_0/block_1); up path mirrors reversed."""
        cfg, unet, params, _, _, _ = xl_world
        p = params["params"]
        assert "down_0_attn_0" not in p
        assert "block" in p["down_1_attn_0"]
        assert {"block_0", "block_1"} <= set(p["down_2_attn_0"])
        assert {"block_0", "block_1"} <= set(p["mid_attn"])
        # up level 0 is the deepest (depth 2), last up level attention-free
        assert {"block_0", "block_1"} <= set(p["up_0_attn_0"])
        assert "up_2_attn_0" not in p
        assert "add_linear_1" in p and "add_linear_2" in p

    def test_sd15_defaults_unchanged(self):
        """The generalization must not move SD1.5 param names (ckpt compat):
        attention at every level but the last, single 'block', no add MLP."""
        cfg = UNetConfig.toy()
        unet = UNetSD15(cfg)
        p = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, 16, 16)),
            jnp.ones((1,)),
            jnp.zeros((1, 7, cfg.cross_attention_dim)),
        )["params"]
        assert "down_0_attn_0" in p and "down_3_attn_0" not in p
        assert "block" in p["down_0_attn_0"]
        assert "add_linear_1" not in p
        assert "up_0_attn_0" not in p and "up_1_attn_0" in p

    def test_heads_per_level(self):
        cfg = UNetConfig.sdxl()
        assert cfg.heads_for(640) == 10 and cfg.heads_for(1280) == 20
        assert cfg.depths == (0, 2, 10)
        toy = UNetConfig.toy()
        assert toy.heads_for(999) == toy.num_attention_heads
        assert toy.depths == (1, 1, 1, 0)


def _make_agent(cfg=None, guidance_scale=None, max_steps=3):
    from tpdm_tpu.models import TimePredictor
    from tpdm_tpu.train import RLOOConfig
    from tpdm_tpu.train.sdxl_agent import SDXLAgent

    cfg = cfg or UNetConfig.toy_xl()
    unet = UNetSD15(cfg)
    params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 4, cfg.sample_size, cfg.sample_size)),
        jnp.ones((2,)),
        jnp.zeros((2, 7, cfg.cross_attention_dim)),
        _added(2, cfg),
    )
    config = RLOOConfig(
        per_device_train_batch_size=4,
        rloo_k=2,
        max_inference_steps=max_steps,
        total_episodes=8,
        learning_rate=1e-3,
        kl_coef=0.0,
    )
    agent = SDXLAgent(
        unet, params, config,
        tpm=TimePredictor(
            conv_out_channels=4,
            in_channels=2 * cfg.block_out_channels[0],
            temb_dim=cfg.block_out_channels[0],
        ),
        guidance_scale=guidance_scale,
    )
    return cfg, agent, config


def _batch(b, cfg, with_neg=False, seed=0):
    rng = np.random.default_rng(seed)
    out = {
        "prompt_embeds": jnp.asarray(
            rng.normal(size=(b, 7, cfg.cross_attention_dim)), jnp.float32
        ),
        "pooled_prompt_embeds": jnp.asarray(
            rng.normal(size=(b, cfg.addition_pooled_dim)), jnp.float32
        ),
    }
    if with_neg:
        out["negative_prompt_embeds"] = jnp.zeros_like(out["prompt_embeds"])
        out["negative_pooled_prompt_embeds"] = jnp.zeros_like(
            out["pooled_prompt_embeds"]
        )
    return out


class TestSDXLAgent:
    def test_sample_and_replay(self):
        cfg, agent, _ = _make_agent()
        tpm_params = agent.init_tpm_params(jax.random.PRNGKey(1))
        out = agent.sample(tpm_params, _batch(2, cfg), jax.random.PRNGKey(2))
        assert out.final_latents.shape == (2, 4, cfg.sample_size, cfg.sample_size)
        assert bool(jnp.isfinite(out.logprobs).all())
        lp = agent.logprobs(tpm_params, out)
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(out.logprobs), rtol=1e-5, atol=1e-5
        )
        # SDXL inherits SD1.5's zero-KL semantics
        # (modeling_sd_v1_5.py:1005-1009)
        assert float(jnp.abs(agent.kl_divergence(out)).max()) == 0.0

    def test_cfg_requires_negatives(self):
        cfg, agent, _ = _make_agent(guidance_scale=5.0)
        tpm_params = agent.init_tpm_params(jax.random.PRNGKey(1))
        with pytest.raises(ValueError, match="negative_pooled"):
            agent.sample(tpm_params, _batch(2, cfg), jax.random.PRNGKey(2))
        out = agent.sample(
            tpm_params, _batch(2, cfg, with_neg=True), jax.random.PRNGKey(2)
        )
        assert bool(jnp.isfinite(out.final_latents).all())

    def test_rloo_trainer_runs_with_sdxl_agent(self):
        from tpdm_tpu.train import RLOOTrainer

        cfg, agent, config = _make_agent()
        rng = np.random.default_rng(0)
        dataset = [
            {
                "prompt": f"p{i}",
                "prompt_embeds": rng.normal(
                    size=(7, cfg.cross_attention_dim)
                ).astype(np.float32),
                "pooled_prompt_embeds": rng.normal(
                    size=(cfg.addition_pooled_dim,)
                ).astype(np.float32),
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
        assert m["objective/kl"] == 0.0
        diffs = jax.tree.map(lambda a, b_: float(jnp.abs(a - b_).max()), p0, p1)
        assert max(jax.tree.leaves(diffs)) > 0


class TestSDXLConverter:
    def test_export_convert_round_trip(self, xl_world):
        from tpdm_tpu.utils.convert import convert_unet_sdxl, export_unet_sdxl

        cfg, unet, params, lat, t, ctx = xl_world
        sd = export_unet_sdxl(params)
        # diffusers SDXL convention: transformer projections are Linear (2D)
        assert sd["mid_block.attentions.0.proj_in.weight"].ndim == 2
        assert "add_embedding.linear_1.weight" in sd
        back = convert_unet_sdxl(
            sd,
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            transformer_layers_per_block=cfg.transformer_layers_per_block,
            mid_transformer_layers=cfg.mid_transformer_layers,
        )
        a = unet.apply(params, lat, t, ctx, _added(2, cfg))[0]
        b = unet.apply(back, lat, t, ctx, _added(2, cfg))[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(back)
        )
        assert len(flat_a) == len(flat_b)
        for k, v in flat_a:
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(flat_b[jax.tree_util.keystr(k)])
            )

    def test_conv_projection_round_trip(self, xl_world):
        """linear_projection=False writes 4D conv weights; both load back."""
        from tpdm_tpu.utils.convert import convert_unet_sdxl, export_unet_sdxl

        cfg, unet, params, lat, t, ctx = xl_world
        sd = export_unet_sdxl(params, linear_projection=False)
        assert sd["mid_block.attentions.0.proj_in.weight"].ndim == 4
        back = convert_unet_sdxl(
            sd,
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
            transformer_layers_per_block=cfg.transformer_layers_per_block,
            mid_transformer_layers=cfg.mid_transformer_layers,
        )
        a = unet.apply(params, lat, t, ctx, _added(2, cfg))[0]
        b = unet.apply(back, lat, t, ctx, _added(2, cfg))[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSDXLTextEncoders:
    def test_assembly(self):
        from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        from tpdm_tpu.pipeline.text_encoding import SDXLTextEncoders

        lcfg = CLIPTextConfig.toy(hidden_size=16, projection_dim=8)
        gcfg = CLIPTextConfig.toy(hidden_size=24, projection_dim=12)
        lm, gm = CLIPTextModel(lcfg), CLIPTextModel(gcfg)
        ids = jnp.asarray(np.array([[97, 1, 2, 98, 0, 0, 0, 0]], np.int32))
        lp = lm.init(jax.random.PRNGKey(0), ids)
        gp = gm.init(jax.random.PRNGKey(1), ids)
        enc = SDXLTextEncoders(lm, lp, gm, gp)
        pe = enc.encode(ids)
        # concat of both penultimate widths; pooled is bigG's projection only
        assert pe.prompt_embeds.shape == (1, 8, 16 + 24)
        assert pe.pooled_prompt_embeds.shape == (1, 12)
        pen_l = lm.apply(lp, ids)[0]
        np.testing.assert_allclose(
            np.asarray(pe.prompt_embeds[..., :16]), np.asarray(pen_l),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(pe.pooled_prompt_embeds), np.asarray(gm.apply(gp, ids)[3]),
            rtol=1e-6, atol=1e-6,
        )


class TestSDXLPipeline:
    def test_generate_with_text_encoders_and_vae(self):
        from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        from tpdm_tpu.models.vae import VAE, VAEConfig
        from tpdm_tpu.pipeline.text_encoding import SDXLTextEncoders
        from tpdm_tpu.pipeline.variants import SDXLPipeline

        cfg = UNetConfig.toy_xl(cross_attention_dim=16 + 24, addition_pooled_dim=12)
        _, agent, _ = _make_agent(cfg, guidance_scale=5.0, max_steps=4)
        lcfg = CLIPTextConfig.toy(hidden_size=16, projection_dim=8, max_position_embeddings=8)
        gcfg = CLIPTextConfig.toy(hidden_size=24, projection_dim=12, max_position_embeddings=8)
        lm, gm = CLIPTextModel(lcfg), CLIPTextModel(gcfg)
        ids = np.array([[97, 1, 2, 98, 0, 0, 0, 0]], np.int32)
        key = jax.random.PRNGKey(0)
        lp = lm.init(key, jnp.asarray(ids))
        gp = gm.init(jax.random.PRNGKey(1), jnp.asarray(ids))
        enc = SDXLTextEncoders(lm, lp, gm, gp)
        vae = VAE(VAEConfig.toy(latent_channels=4))
        vae_params = vae.init(
            key,
            jnp.zeros((1, 4, cfg.sample_size, cfg.sample_size)),
            jnp.zeros((1, 3, 2 * cfg.sample_size, 2 * cfg.sample_size)),
        )
        pipe = SDXLPipeline(agent, vae, vae_params, text_encoders=enc)
        res = pipe.generate(clip_ids=ids, negative_clip_ids=np.zeros_like(ids))
        assert res.images.shape == (1, 2 * cfg.sample_size, 2 * cfg.sample_size, 3)
        assert res.images.dtype == np.uint8
        assert res.schedule[0, 0] == 999


class TestAdviceFixes:
    """Round-3 ADVICE items: per-tower CLIP ids, the SDXL VAE preset, and
    up-front pooled-embed validation."""

    def _encoders(self):
        from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
        from tpdm_tpu.pipeline.text_encoding import SDXLTextEncoders

        lcfg = CLIPTextConfig.toy(hidden_size=16, projection_dim=8)
        gcfg = CLIPTextConfig.toy(hidden_size=24, projection_dim=12)
        lm, gm = CLIPTextModel(lcfg), CLIPTextModel(gcfg)
        ids = jnp.asarray(np.array([[97, 1, 2, 98, 0, 0, 0, 0]], np.int32))
        lp = lm.init(jax.random.PRNGKey(0), ids)
        gp = gm.init(jax.random.PRNGKey(1), ids)
        return SDXLTextEncoders(lm, lp, gm, gp), ids

    def test_per_tower_clip_g_ids(self):
        """diffusers SDXL tokenizes per tower (tokenizer_2 pads with 0,
        not 49407) and supports prompt_2 — the bigG tower must be able to
        receive its own ids. Default keeps the shared-ids behavior."""
        enc, ids = self._encoders()
        shared = enc.encode(ids)
        same = enc.encode(ids, clip_g_ids=ids)
        np.testing.assert_array_equal(
            np.asarray(shared.prompt_embeds), np.asarray(same.prompt_embeds)
        )
        g_ids = ids.at[0, 4:].set(3)  # different pad token for the g tower
        split = enc.encode(ids, clip_g_ids=g_ids)
        # CLIP-L half unchanged, bigG half (and its pooled) moved
        np.testing.assert_array_equal(
            np.asarray(split.prompt_embeds[..., :16]),
            np.asarray(shared.prompt_embeds[..., :16]),
        )
        assert (
            float(
                jnp.abs(
                    split.prompt_embeds[..., 16:]
                    - shared.prompt_embeds[..., 16:]
                ).max()
            )
            > 0
        )

    def test_vae_sdxl_preset(self):
        from tpdm_tpu.models.vae import VAEConfig

        cfg = VAEConfig.sdxl()
        assert cfg.scaling_factor == 0.13025
        assert cfg.shift_factor == 0.0
        assert cfg.latent_channels == 4

    def test_generate_validates_pooled_up_front(self):
        from tpdm_tpu.pipeline.variants import SDXLPipeline

        cfg = UNetConfig.toy_xl()
        _, agent, _ = _make_agent(cfg, guidance_scale=5.0, max_steps=2)
        pipe = SDXLPipeline(agent)
        pe = jnp.zeros((1, 5, cfg.cross_attention_dim))
        with pytest.raises(ValueError, match="pooled_prompt_embeds"):
            pipe.generate(prompt_embeds=pe)  # missing pooled
        with pytest.raises(ValueError, match="negative_pooled"):
            pipe.generate(
                prompt_embeds=pe,
                pooled_prompt_embeds=jnp.zeros((1, cfg.addition_pooled_dim)),
                negative_prompt_embeds=pe,  # missing the pooled negative
            )
