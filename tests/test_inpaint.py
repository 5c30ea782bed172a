"""Inpainting (masked image-to-image): per-step projection + final composite.

Beyond-reference capability on top of the img2img path (test_img2img.py):
the known region is re-imposed at each adaptive step's noise level
(RePaint/diffusers-legacy convention, fixed eps), and the final latents
composite the init image's latents exactly where mask = 0. The reference
has no image-conditioned generation at all (modeling_sd3_pnt.py only
decodes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
from tpdm_tpu.models.vae import VAE, VAEConfig
from tpdm_tpu.pipeline.pipeline import TPDMPipeline


@pytest.fixture(scope="module")
def pipe():
    key = jax.random.PRNGKey(0)
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
        conv_out_channels=4, in_channels=2 * mcfg.inner_dim,
        temb_dim=mcfg.inner_dim,
    )
    tpm_params = tpm.init(
        key, jnp.zeros((b, 2 * mcfg.inner_dim, grid, grid)),
        jnp.zeros((b, mcfg.inner_dim)),
    )
    vcfg = VAEConfig.toy(latent_channels=mcfg.in_channels)
    vae = VAE(vcfg)
    vae_params = vae.init(
        key,
        jnp.zeros((1, mcfg.in_channels, mcfg.sample_size, mcfg.sample_size)),
        jnp.zeros((1, 3, 2 * mcfg.sample_size, 2 * mcfg.sample_size)),
    )
    return TPDMPipeline(
        mmdit, mparams, tpm, tpm_params, vae, vae_params, min_sigma=0.01
    )


def _embeds(b=2, seed=7):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (
        jax.random.normal(k1, (b, 20, 96)) * 0.05,
        jax.random.normal(k2, (b, 64)) * 0.05,
    )


def _image(pipe, b=2, seed=11):
    s = 2 * pipe.mmdit.config.sample_size  # toy VAE factor 2
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8)


def _kw(pe, pp, **extra):
    kw = dict(
        prompt_embeds=pe, pooled_prompt_embeds=pp, guidance_scale=None,
        max_inference_steps=4, predict=True, seed=5, decode=False,
    )
    kw.update(extra)
    return kw


class TestInpaint:
    def test_all_ones_mask_equals_plain_img2img(self, pipe):
        pe, pp = _embeds()
        img = _image(pipe)
        plain = pipe.generate(**_kw(pe, pp, init_image=img, strength=0.8))
        ones = np.ones((2,) + img.shape[1:3], np.float32)
        masked = pipe.generate(
            **_kw(pe, pp, init_image=img, strength=0.8, mask=ones)
        )
        np.testing.assert_allclose(
            np.asarray(masked.images), np.asarray(plain.images),
            rtol=0, atol=1e-6,
        )

    def test_all_zeros_mask_returns_init_latents(self, pipe):
        pe, pp = _embeds()
        img = _image(pipe)
        clean = np.asarray(pipe.encode_image(img), np.float32)
        zeros = np.zeros((2,) + img.shape[1:3], np.float32)
        res = pipe.generate(
            **_kw(pe, pp, init_image=img, strength=1.0, mask=zeros)
        )
        np.testing.assert_allclose(
            np.asarray(res.images, np.float32), clean, rtol=0, atol=1e-6
        )

    def test_half_mask_keeps_known_half_exactly(self, pipe):
        pe, pp = _embeds()
        img = _image(pipe)
        clean = np.asarray(pipe.encode_image(img), np.float32)
        H = img.shape[1]
        m = np.zeros((2, H, H), np.float32)
        m[:, :, H // 2:] = 1.0  # regenerate right half, keep left
        res = pipe.generate(
            **_kw(pe, pp, init_image=img, strength=1.0, mask=m)
        )
        out = np.asarray(res.images, np.float32)
        lw = clean.shape[-1]
        # kept region: exactly the init image's latents (final composite);
        # the downsampled soft seam spans one latent column at the boundary
        np.testing.assert_allclose(
            out[:, :, :, : lw // 2 - 1], clean[:, :, :, : lw // 2 - 1],
            rtol=0, atol=1e-6,
        )
        # regenerated region genuinely changed
        d = np.abs(out[:, :, :, lw // 2 + 1 :] - clean[:, :, :, lw // 2 + 1 :])
        assert d.mean() > 1e-3

    def test_mask_shapes_accepted(self, pipe):
        pe, pp = _embeds()
        img = _image(pipe)
        H = img.shape[1]
        m3 = np.ones((2, H, H), np.float32)
        m4 = m3[:, None]
        r3 = pipe.generate(**_kw(pe, pp, init_image=img, mask=m3))
        r4 = pipe.generate(**_kw(pe, pp, init_image=img, mask=m4))
        np.testing.assert_array_equal(
            np.asarray(r3.images), np.asarray(r4.images)
        )

    def test_validation(self, pipe):
        pe, pp = _embeds()
        img = _image(pipe)
        H = img.shape[1]
        with pytest.raises(ValueError, match="requires init_image"):
            pipe.generate(**_kw(pe, pp, mask=np.ones((2, H, H))))
        with pytest.raises(ValueError, match="mask must be"):
            pipe.generate(
                **_kw(pe, pp, init_image=img, mask=np.ones((2, 2, H, H)))
            )
        with pytest.raises(ValueError, match="init_image is"):
            pipe.generate(
                **_kw(pe, pp, init_image=img, mask=np.ones((2, H // 2, H)))
            )

    def test_rectangular_inpaint(self, pipe):
        pe, pp = _embeds()
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (2, 8, 16, 3), dtype=np.uint8)
        m = np.zeros((2, 8, 16), np.float32)
        m[:, :, 8:] = 1.0
        res = pipe.generate(
            **_kw(pe, pp, init_image=img, strength=1.0, mask=m)
        )
        assert res.images.shape[-2:] == (4, 8)  # latent grid of 8x16 px

    def test_soft_mask_blends(self, pipe):
        pe, pp = _embeds()
        img = _image(pipe)
        clean = np.asarray(pipe.encode_image(img), np.float32)
        H = img.shape[1]
        kw = _kw(pe, pp, init_image=img, strength=1.0)
        full = pipe.generate(mask=np.ones((2, H, H), np.float32), **kw)
        half = pipe.generate(
            mask=np.full((2, H, H), 0.5, np.float32), **kw
        )
        # a 0.5 mask pulls the output toward the init latents (the blended
        # trajectory differs from full-regen, so no exact midpoint claim —
        # only the ordering)
        d_full = np.abs(np.asarray(full.images, np.float32) - clean).mean()
        d_half = np.abs(np.asarray(half.images, np.float32) - clean).mean()
        assert 1e-4 < d_half < d_full, (d_half, d_full)
