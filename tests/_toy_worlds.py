"""Shared toy SD1.5 / FLUX serving worlds (agent + encode/decode parts).

Used by test_serving_families.py (fixed-batch runner path) and
test_serving_continuous_families.py (slot-recycling engines) so both
engine families are proven against the SAME weights and encoders.
"""

import numpy as np

import jax
import jax.numpy as jnp


def tokenize_ids(prompt, n=8):
    ids = [97] + [abs(hash(w)) % 90 + 1 for w in prompt.split()[:6]] + [98]
    ids = ids[:n] + [0] * (n - len(ids))
    return np.array([ids], np.int32)


def build_sd15_world(max_steps=4):
    from tpdm_tpu.models import TimePredictor
    from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from tpdm_tpu.models.vae import VAE, VAEConfig
    from tpdm_tpu.serving_families import make_sd15_runner, make_vae_decoder
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
    config = RLOOConfig(max_inference_steps=max_steps)
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
        ids = np.concatenate([tokenize_ids(p) for p in prompts])
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


def build_sdxl_world(max_steps=4):
    from tpdm_tpu.models import TimePredictor
    from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
    from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from tpdm_tpu.models.vae import VAE, VAEConfig
    from tpdm_tpu.pipeline.text_encoding import SDXLTextEncoders
    from tpdm_tpu.serving_families import make_sdxl_runner, make_vae_decoder
    from tpdm_tpu.train import RLOOConfig
    from tpdm_tpu.train.sdxl_agent import SDXLAgent

    cfg = UNetConfig.toy_xl(cross_attention_dim=16 + 24, addition_pooled_dim=12)
    unet = UNetSD15(cfg)
    lcfg = CLIPTextConfig.toy(
        hidden_size=16, projection_dim=8, max_position_embeddings=8
    )
    gcfg = CLIPTextConfig.toy(
        hidden_size=24, projection_dim=12, max_position_embeddings=8
    )
    lm, gm = CLIPTextModel(lcfg), CLIPTextModel(gcfg)
    key = jax.random.PRNGKey(0)
    lparams = lm.init(key, jnp.zeros((1, 8), jnp.int32))
    gparams = gm.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))
    enc = SDXLTextEncoders(lm, lparams, gm, gparams)
    unet_params = unet.init(
        key,
        jnp.zeros((2, 4, cfg.sample_size, cfg.sample_size)),
        jnp.ones((2,)),
        jnp.zeros((2, 8, cfg.cross_attention_dim)),
        {
            "text_embeds": jnp.zeros((2, cfg.addition_pooled_dim)),
            "time_ids": jnp.zeros((2, 6)),
        },
    )
    config = RLOOConfig(max_inference_steps=max_steps)
    agent = SDXLAgent(
        unet, unet_params, config,
        tpm=TimePredictor(
            conv_out_channels=4,
            in_channels=2 * cfg.block_out_channels[0],
            temb_dim=cfg.block_out_channels[0],
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
        ids = np.concatenate([tokenize_ids(p) for p in prompts])
        pe = enc.encode(ids)
        ne = enc.encode(np.zeros_like(ids))
        return (
            pe.prompt_embeds, pe.pooled_prompt_embeds,
            ne.prompt_embeds, ne.pooled_prompt_embeds,
        )

    decode = make_vae_decoder(vae, vae_params)
    runner = make_sdxl_runner(agent, tpm_params, encode, decode)
    return dict(
        agent=agent, tpm_params=tpm_params, encode=encode, decode=decode,
        runner=runner, text_encoders=enc, vae=vae,
        vae_params=vae_params, sample_size=cfg.sample_size,
    )


def build_sdxl_ensemble_world(max_steps=4, denoising_end=0.75):
    """build_sdxl_world + a toy refiner expert (bigG-only conditioning,
    aesthetic-score CFG) behind make_sdxl_ensemble_runner."""
    from tpdm_tpu.models import TimePredictor
    from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from tpdm_tpu.serving_families import make_sdxl_ensemble_runner
    from tpdm_tpu.train import RLOOConfig
    from tpdm_tpu.train.sdxl_agent import SDXLRefinerAgent

    w = build_sdxl_world(max_steps=max_steps)
    enc = w["text_encoders"]

    # bigG toy tower hidden is 24 -> refiner context dim
    rcfg = UNetConfig.toy_refiner(cross_attention_dim=24, addition_pooled_dim=12)
    runet = UNetSD15(rcfg)
    rparams = runet.init(
        jax.random.PRNGKey(6),
        jnp.zeros((2, 4, rcfg.sample_size, rcfg.sample_size)),
        jnp.ones((2,)),
        jnp.zeros((2, 8, rcfg.cross_attention_dim)),
        {
            "text_embeds": jnp.zeros((2, rcfg.addition_pooled_dim)),
            "time_ids": jnp.zeros((2, 5)),
        },
    )
    ragent = SDXLRefinerAgent(
        runet, rparams, RLOOConfig(max_inference_steps=max_steps),
        tpm=TimePredictor(
            conv_out_channels=4,
            in_channels=2 * rcfg.block_out_channels[0],
            temb_dim=rcfg.block_out_channels[0],
        ),
    )
    rtpm = ragent.init_tpm_params(jax.random.PRNGKey(7))

    def encode_refiner(prompts):
        ids = np.concatenate([tokenize_ids(p) for p in prompts])
        pe = enc.encode_refiner(ids)
        ne = enc.encode_refiner(np.zeros_like(ids))
        return (
            pe.prompt_embeds, pe.pooled_prompt_embeds,
            ne.prompt_embeds, ne.pooled_prompt_embeds,
        )

    w["refiner_agent"] = ragent
    w["refiner_tpm_params"] = rtpm
    w["encode_refiner"] = encode_refiner
    w["denoising_end"] = denoising_end
    w["ensemble_runner"] = make_sdxl_ensemble_runner(
        w["agent"], w["tpm_params"], ragent, rtpm,
        w["encode"], encode_refiner, w["decode"],
        denoising_end=denoising_end,
    )
    return w


def build_flux_world(max_steps=4):
    from tpdm_tpu.models import TimePredictor
    from tpdm_tpu.models.flux import Flux, FluxConfig, pack_latents
    from tpdm_tpu.models.vae import VAE, VAEConfig
    from tpdm_tpu.serving_families import make_flux_runner, make_vae_decoder
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
    config = RLOOConfig(max_inference_steps=max_steps)
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
    return dict(
        agent=agent, tpm_params=tpm_params, encode=encode, decode=decode,
        runner=runner,
    )
