"""Serving the SD1.5 and FLUX families through the shared BatchingEngine.

The reference serves only SD3 (gradio_sd3_inference.py); here the engine's
production machinery (coalescing, padding, stats) is family-agnostic via
the `runner` delegate (tpdm_tpu/serving_families.py), with per-request
seed determinism and per-request step caps for every family.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpdm_tpu.serving import BatchingEngine
from tpdm_tpu.serving_families import (
    make_flux_runner,
    make_sd15_runner,
    make_vae_decoder,
)


def _tokenize_ids(prompt, n=8):
    ids = [97] + [abs(hash(w)) % 90 + 1 for w in prompt.split()[:6]] + [98]
    ids = ids[:n] + [0] * (n - len(ids))
    return np.array([ids], np.int32)


@pytest.fixture(scope="module")
def sd15_world():
    from tpdm_tpu.models import TimePredictor
    from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from tpdm_tpu.models.vae import VAE, VAEConfig
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
    tpm_params = agent.init_tpm_params(jax.random.PRNGKey(0))

    def encode(prompts):
        ids = np.concatenate([_tokenize_ids(p) for p in prompts])
        pe = text.apply(text_params, jnp.asarray(ids))[1]
        npe = text.apply(text_params, jnp.zeros_like(jnp.asarray(ids)))[1]
        return pe, npe

    decode = make_vae_decoder(vae, vae_params)
    runner = make_sd15_runner(agent, tpm_params, encode, decode)
    return dict(
        agent=agent, tpm_params=tpm_params, encode=encode, decode=decode,
        runner=runner, text=text, text_params=text_params, vae=vae,
        vae_params=vae_params, sample_size=cfg.sample_size,
    )


@pytest.fixture(scope="module")
def flux_world():
    from tpdm_tpu.models import TimePredictor
    from tpdm_tpu.models.flux import Flux, FluxConfig, pack_latents
    from tpdm_tpu.models.vae import VAE, VAEConfig
    from tpdm_tpu.train import RLOOConfig
    from tpdm_tpu.train.flux_agent import FluxAgent

    cfg = FluxConfig.toy()
    model = Flux(cfg)
    n_txt = 5
    lat = jnp.zeros((2, 4, 8, 8))
    tokens, img_ids = pack_latents(lat)
    params = model.init(
        jax.random.PRNGKey(0),
        tokens,
        img_ids,
        jnp.zeros((2, n_txt, cfg.txt_dim)),
        jnp.zeros((2, n_txt, 3)),
        jnp.ones((2,)),
        jnp.zeros((2, cfg.vec_dim)),
        jnp.full((2,), 3.5),
    )
    config = RLOOConfig(max_inference_steps=4)
    agent = FluxAgent(
        model, params, config,
        tpm=TimePredictor(
            conv_out_channels=4,
            in_channels=2 * cfg.hidden_size,
            temb_dim=cfg.hidden_size,
        ),
        latent_size=8,
        latent_channels=4,
    )
    key = jax.random.PRNGKey(1)
    vae = VAE(VAEConfig.toy(latent_channels=4))
    vae_params = vae.init(
        key, jnp.zeros((1, 4, 8, 8)), jnp.zeros((1, 3, 16, 16))
    )
    tpm_params = agent.init_tpm_params(jax.random.PRNGKey(0))

    def encode(prompts):
        # deterministic per-prompt toy features (a hash-seeded stand-in for
        # the T5 + CLIP-pooled towers)
        txt = np.stack([
            np.random.default_rng(abs(hash(p)) % 2**31)
            .normal(size=(n_txt, cfg.txt_dim)).astype(np.float32)
            for p in prompts
        ])
        pooled = np.stack([
            np.random.default_rng(abs(hash(p)) % 2**31 + 1)
            .normal(size=(cfg.vec_dim,)).astype(np.float32)
            for p in prompts
        ])
        return jnp.asarray(txt), jnp.asarray(pooled)

    decode = make_vae_decoder(vae, vae_params)
    runner = make_flux_runner(agent, tpm_params, encode, decode)
    return dict(agent=agent, tpm_params=tpm_params, runner=runner)


def _noop_tokenize(prompt, n=8):
    return _tokenize_ids(prompt), np.ones((1, 12), np.int32)


class TestSD15Serving:
    def test_requests_coalesce_and_decode(self, sd15_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=3, window_ms=200, max_steps=4,
            runner=sd15_world["runner"],
        )
        eng.start()
        try:
            reqs = [eng.submit(f"prompt {i}", seed=i) for i in range(3)]
            results = [r.result(timeout=300) for r in reqs]
        finally:
            eng.stop()
        assert eng.batches_run == 1
        ss = sd15_world["sample_size"]
        for res in results:
            assert res["image"].shape == (2 * ss, 2 * ss, 3)
            assert res["image"].dtype == np.uint8
            assert 1 <= res["inference_steps"] <= 4
            # SD1.5 schedule entries are integer timesteps in [0, 999)
            assert all(0 <= t < 999 for t in res["sigmas"])

    def test_seed_parity_with_direct_pipeline(self, sd15_world):
        from tpdm_tpu.pipeline.variants import SD15Pipeline

        w = sd15_world
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=w["runner"],
        )
        via_engine = eng.generate_batch(["a cat"], [7])[0]["image"]
        pipe = SD15Pipeline(
            w["agent"], w["vae"], w["vae_params"], w["text"], w["text_params"]
        )
        ids = _tokenize_ids("a cat")
        direct = pipe.generate(
            clip_ids=ids, negative_clip_ids=np.zeros_like(ids), seed=7,
            tpm_params=w["tpm_params"],
        )
        np.testing.assert_array_equal(via_engine, direct.images[0])

    def test_same_seed_same_image_across_batch_compositions(self, sd15_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=sd15_world["runner"],
        )
        solo = eng.generate_batch(["a cat"], [9])[0]
        paired = eng.generate_batch(["a dog", "a cat"], [3, 9])[1]
        np.testing.assert_array_equal(solo["image"], paired["image"])

    def test_per_request_step_caps(self, sd15_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=sd15_world["runner"],
        )
        out = eng.generate_batch(
            ["a", "b"], [1, 2], steps=[2, None]
        )
        assert out[0]["inference_steps"] <= 2
        assert np.isfinite(out[0]["image"]).all() or out[0]["image"].dtype == np.uint8

    def test_runner_exclusive_with_placement(self, sd15_world):
        with pytest.raises(ValueError, match="runner"):
            BatchingEngine(
                None, _noop_tokenize, max_batch=2, dp=2,
                runner=sd15_world["runner"],
            )


class TestFluxServing:
    def test_requests_coalesce_and_decode(self, flux_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=200, max_steps=4,
            runner=flux_world["runner"],
        )
        eng.start()
        try:
            reqs = [eng.submit(f"p {i}", seed=i) for i in range(2)]
            results = [r.result(timeout=300) for r in reqs]
        finally:
            eng.stop()
        assert eng.batches_run == 1
        for res in results:
            assert res["image"].shape == (16, 16, 3)
            assert res["image"].dtype == np.uint8
            assert 1 <= res["inference_steps"] <= 4
            assert all(0.0 <= s <= 1.0 for s in res["sigmas"])

    def test_same_seed_same_image_across_batch_compositions(self, flux_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=flux_world["runner"],
        )
        solo = eng.generate_batch(["a cat"], [5])[0]
        paired = eng.generate_batch(["a dog", "a cat"], [1, 5])[1]
        np.testing.assert_array_equal(solo["image"], paired["image"])

    def test_per_request_step_caps(self, flux_world):
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=flux_world["runner"],
        )
        out = eng.generate_batch(["a", "b"], [1, 2], steps=[1, None])
        assert out[0]["inference_steps"] == 1

    def test_stats_tolerate_runner_records(self, flux_world):
        """Runner-path stage records carry no tokenize_s/decode_s; stats()
        must aggregate what exists instead of KeyError-ing (regression:
        GET /stats during family serving crashed the handler)."""
        eng = BatchingEngine(
            None, _noop_tokenize, max_batch=2, window_ms=1, max_steps=4,
            runner=flux_world["runner"],
        )
        eng.generate_batch(["a"], [1])
        s = eng.stats()
        assert s["batches_run"] == 1
        assert s["device_s_p50"] > 0
        assert s["tokenize_s_p50"] == 0.0
        assert s["padded_slots"] == 1
