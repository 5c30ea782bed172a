"""End-to-end pipeline tests on toy towers: ids -> embeds -> images."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from tpdm_tpu.models.t5 import T5Config, T5Encoder
from tpdm_tpu.models.vae import VAE, VAEConfig
from tpdm_tpu.pipeline.pipeline import TPDMPipeline
from tpdm_tpu.pipeline.text_encoding import SD3TextEncoders


@pytest.fixture(scope="module")
def toy_pipeline():
    key = jax.random.PRNGKey(0)

    # text encoders sized so concat/pad logic is exercised: l=32, g=48 ->
    # clip 80 padded to t5 width 96
    lcfg = CLIPTextConfig.toy(hidden_size=32, projection_dim=24, num_attention_heads=4)
    gcfg = CLIPTextConfig.toy(hidden_size=48, projection_dim=40, num_attention_heads=4)
    tcfg = T5Config.toy(d_model=96)
    clip_l, clip_g, t5 = CLIPTextModel(lcfg), CLIPTextModel(gcfg), T5Encoder(tcfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    lparams = clip_l.init(key, ids)
    gparams = clip_g.init(key, ids)
    tparams = t5.init(key, jnp.zeros((1, 12), jnp.int32))
    text = SD3TextEncoders(clip_l, lparams, clip_g, gparams, t5, tparams, t5_width=96)

    mcfg = MMDiTConfig.toy(joint_attention_dim=96, pooled_projection_dim=64)
    mmdit = MMDiT(mcfg)
    b = 2
    mparams = mmdit.init(
        key,
        jnp.zeros((b, mcfg.in_channels, mcfg.sample_size, mcfg.sample_size)),
        jnp.ones((b,)),
        jnp.zeros((b, 20, 96)),
        jnp.zeros((b, 64)),
    )

    grid = mcfg.sample_size // mcfg.patch_size
    tpm = TimePredictor(
        conv_out_channels=4, in_channels=2 * mcfg.inner_dim, temb_dim=mcfg.inner_dim,
        init_alpha=0.5, init_beta=2.0,  # small ratios -> early stop
    )
    tpm_params = tpm.init(
        key, jnp.zeros((b, 2 * mcfg.inner_dim, grid, grid)), jnp.zeros((b, mcfg.inner_dim))
    )

    vcfg = VAEConfig.toy(latent_channels=mcfg.in_channels)
    vae = VAE(vcfg)
    vae_params = vae.init(
        key,
        jnp.zeros((1, mcfg.in_channels, mcfg.sample_size, mcfg.sample_size)),
        jnp.zeros((1, 3, 2 * mcfg.sample_size, 2 * mcfg.sample_size)),
    )

    return TPDMPipeline(
        mmdit, mparams, tpm, tpm_params, vae, vae_params, text, min_sigma=0.01
    )


class TestTextEncoding:
    def test_assembly_shapes(self, toy_pipeline):
        te = toy_pipeline.text_encoders
        clip_ids = np.array([[97, 1, 2, 98, 0, 0, 0, 0]] * 2, np.int32)
        t5_ids = np.array([[5, 6, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0]] * 2, np.int32)
        pe = te.encode(clip_ids, t5_ids)
        assert pe.prompt_embeds.shape == (2, 8 + 12, 96)
        assert pe.pooled_prompt_embeds.shape == (2, 24 + 40)

    def test_clip_section_padded_with_zeros(self, toy_pipeline):
        te = toy_pipeline.text_encoders
        clip_ids = np.array([[97, 1, 2, 98, 0, 0, 0, 0]], np.int32)
        pe = te.encode(clip_ids, np.zeros((1, 12), np.int32))
        clip_part = np.asarray(pe.prompt_embeds[:, :8, :])
        assert np.abs(clip_part[..., :80]).max() > 0
        np.testing.assert_allclose(clip_part[..., 80:], 0.0)

    def test_t5_none_gives_zero_block(self, toy_pipeline):
        te = toy_pipeline.text_encoders
        clip_ids = np.array([[97, 1, 2, 98, 0, 0, 0, 0]], np.int32)
        pe = te.encode(clip_ids, None)
        assert pe.prompt_embeds.shape == (1, 8 + 256, 96)
        np.testing.assert_allclose(np.asarray(pe.prompt_embeds[:, 8:, :]), 0.0)


class TestGenerate:
    def test_ids_to_images(self, toy_pipeline):
        clip_ids = np.array([[97, 1, 2, 98, 0, 0, 0, 0]] * 2, np.int32)
        t5_ids = np.ones((2, 12), np.int32)
        res = toy_pipeline.generate(
            clip_ids=clip_ids,
            t5_ids=t5_ids,
            negative_clip_ids=np.zeros_like(clip_ids),
            negative_t5_ids=np.zeros_like(t5_ids),
            max_inference_steps=10,
            seed=3,
        )
        s = toy_pipeline.mmdit.config.sample_size
        assert res.images.shape == (2, 2 * s, 2 * s, 3)
        assert res.images.dtype == np.uint8
        assert res.num_steps <= 10
        # the aggressive TPM init should stop early
        assert res.num_steps < 10
        assert (res.last_valid_index + 1 <= res.num_steps).all()

    def test_history_images(self, toy_pipeline):
        clip_ids = np.array([[97, 1, 98, 0, 0, 0, 0, 0]], np.int32)
        res = toy_pipeline.generate(
            clip_ids=clip_ids,
            t5_ids=np.ones((1, 12), np.int32),
            negative_clip_ids=np.zeros_like(clip_ids),
            negative_t5_ids=np.ones((1, 12), np.int32),
            max_inference_steps=6,
            return_full_process_images=True,
        )
        assert res.history_images is not None
        assert res.history_images.shape[0] == res.num_steps

    def test_no_guidance_path(self, toy_pipeline):
        clip_ids = np.array([[97, 1, 98, 0, 0, 0, 0, 0]], np.int32)
        res = toy_pipeline.generate(
            clip_ids=clip_ids,
            t5_ids=np.ones((1, 12), np.int32),
            guidance_scale=None,
            max_inference_steps=4,
        )
        assert res.images.shape[0] == 1

    def test_fixed_baseline(self, toy_pipeline):
        te = toy_pipeline.text_encoders
        clip_ids = np.array([[97, 1, 98, 0, 0, 0, 0, 0]], np.int32)
        pe = te.encode(clip_ids, np.ones((1, 12), np.int32))
        ne = te.encode(np.zeros_like(clip_ids), np.zeros((1, 12), np.int32))
        imgs = toy_pipeline.generate_fixed(
            pe.prompt_embeds, pe.pooled_prompt_embeds,
            ne.prompt_embeds, ne.pooled_prompt_embeds,
            num_steps=4,
        )
        assert imgs.dtype == np.uint8

    def test_deterministic_given_seed(self, toy_pipeline):
        clip_ids = np.array([[97, 1, 98, 0, 0, 0, 0, 0]], np.int32)
        kw = dict(
            clip_ids=clip_ids,
            t5_ids=np.ones((1, 12), np.int32),
            negative_clip_ids=np.zeros_like(clip_ids),
            negative_t5_ids=np.ones((1, 12), np.int32),
            max_inference_steps=5,
            seed=11,
        )
        r1 = toy_pipeline.generate(**kw)
        r2 = toy_pipeline.generate(**kw)
        np.testing.assert_array_equal(r1.images, r2.images)
