"""Directional learning proofs for the non-SD3 agent families.

tests/test_learning.py pins that RLOO LEARNS on the SD3-shaped toy; the
SD1.5 / SDXL / FLUX agents previously had only one-update dryruns and
integration tests (round-3 VERDICT item 7). Same construction as there:
a constant positive score with gamma < 1 makes the step-discount
sum_i r*gamma^(L-i)/(L+1) (reference: modeling_sd3_pnt.py:838-841)
strictly favor shorter schedules, so a working rollout -> discount ->
leave-one-out advantage -> replay -> clipped-PG stack must drive
policy/steps_avg DOWN and objective/rlhf_reward UP — per family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdm_tpu.models import TimePredictor
from tpdm_tpu.train import RLOOConfig, RLOOTrainer


def _config(num_updates, seed=0, **kw):
    rloo_k = 4
    d = dict(
        seed=seed,
        per_device_train_batch_size=rloo_k,
        rloo_k=rloo_k,
        num_ppo_epochs=2,
        max_inference_steps=6,
        total_episodes=rloo_k * num_updates,
        learning_rate=3e-3,
        gamma=0.7,
        kl_coef=0.0,
        guidance_scale=None,
        logging_steps=1,
    )
    d.update(kw)
    return RLOOConfig(**d)


def _const_reward(prompts, outputs):
    b = outputs.final_latents.shape[0]
    ones = np.ones((b,), np.float32)
    return ones, ones


def _sd15_world(num_updates, family="sd15", seed=0):
    from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15

    n_txt = 5
    # init ratio mean 2/(2+1) = 2/3: the mean path crosses min_time=150
    # at step ~5 of 6, leaving both downward headroom and sampling
    # variance (the advantage signal)
    config = _config(
        num_updates, seed=seed, init_alpha=2.0, init_beta=1.0
    )
    if family == "sdxl":
        from tpdm_tpu.train.sdxl_agent import SDXLAgent

        ucfg = UNetConfig.toy_xl()
        unet = UNetSD15(ucfg)
        params = unet.init(
            jax.random.PRNGKey(1),
            jnp.ones((2, 4, ucfg.sample_size, ucfg.sample_size)),
            jnp.ones((2,)),
            jnp.ones((2, n_txt, ucfg.cross_attention_dim)),
            {
                "text_embeds": jnp.zeros((2, ucfg.addition_pooled_dim)),
                "time_ids": jnp.zeros((2, 6)),
            },
        )
        agent = SDXLAgent(
            unet, params, config,
            tpm=TimePredictor(
                conv_out_channels=4,
                in_channels=2 * ucfg.block_out_channels[0],
                temb_dim=ucfg.block_out_channels[0],
                init_alpha=config.init_alpha,
                init_beta=config.init_beta,
            ),
            min_time=150,
            guidance_scale=1.0,
        )
    else:
        from tpdm_tpu.train.sd15_agent import SD15Agent

        ucfg = UNetConfig.toy()
        unet = UNetSD15(ucfg)
        params = unet.init(
            jax.random.PRNGKey(1),
            jnp.ones((2, 4, ucfg.sample_size, ucfg.sample_size)),
            jnp.ones((2,)),
            jnp.ones((2, n_txt, ucfg.cross_attention_dim)),
        )
        agent = SD15Agent(
            unet, params, config,
            tpm=TimePredictor(
                conv_out_channels=4,
                in_channels=2 * ucfg.block_out_channels[0],
                temb_dim=ucfg.time_embed_dim,
                init_alpha=config.init_alpha,
                init_beta=config.init_beta,
            ),
            min_time=150,
            guidance_scale=1.0,
        )
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(4):
        row = {
            "prompt": f"p{i}",
            "prompt_embeds": rng.normal(
                size=(n_txt, ucfg.cross_attention_dim)
            ).astype(np.float32),
        }
        if family == "sdxl":
            row["pooled_prompt_embeds"] = rng.normal(
                size=(ucfg.addition_pooled_dim,)
            ).astype(np.float32)
        rows.append(row)
    return RLOOTrainer(config, agent, _const_reward, rows)


def _flux_world(num_updates, seed=0):
    from tpdm_tpu.models.flux import Flux, FluxConfig, pack_latents
    from tpdm_tpu.train.flux_agent import FluxAgent

    fcfg = FluxConfig.toy()
    model = Flux(fcfg)
    n_txt = 5
    lat = jnp.zeros((2, 4, 8, 8))
    tokens, img_ids = pack_latents(lat)
    params = model.init(
        jax.random.PRNGKey(1), tokens, img_ids,
        jnp.zeros((2, n_txt, fcfg.txt_dim)), jnp.zeros((2, n_txt, 3)),
        jnp.ones((2,)), jnp.zeros((2, fcfg.vec_dim)), jnp.full((2,), 3.5),
    )
    # same geometry as the SD3 learning test: sigma_6 of the mode path
    # stays above min_sigma, so the untrained policy runs ~all 6 steps
    config = _config(
        num_updates, seed=seed, min_sigma=0.3, init_alpha=2.5,
        init_beta=0.7,
    )
    agent = FluxAgent(
        model, params, config,
        tpm=TimePredictor(
            conv_out_channels=4, in_channels=2 * fcfg.hidden_size,
            temb_dim=fcfg.hidden_size,
            init_alpha=config.init_alpha, init_beta=config.init_beta,
        ),
        latent_size=8, latent_channels=4,
    )
    rng = np.random.default_rng(seed)
    rows = [
        {
            "prompt": f"p{i}",
            "prompt_embeds": rng.normal(size=(n_txt, fcfg.txt_dim)).astype(
                np.float32
            ),
            "pooled_prompt_embeds": rng.normal(size=(fcfg.vec_dim,)).astype(
                np.float32
            ),
        }
        for i in range(4)
    ]
    return RLOOTrainer(config, agent, _const_reward, rows)


def _assert_learns(trainer, num_updates, min_drop=1.0):
    trainer.train()
    hist = trainer.metrics_history
    assert len(hist) == num_updates

    def window(key, lo, hi):
        return float(np.mean([m[key] for m in hist[lo:hi]]))

    steps_first = window("policy/steps_avg", 0, 4)
    steps_last = window("policy/steps_avg", -4, None)
    reward_first = window("objective/rlhf_reward", 0, 4)
    reward_last = window("objective/rlhf_reward", -4, None)
    assert steps_last < steps_first - min_drop, (steps_first, steps_last)
    assert reward_last > reward_first + 0.02, (reward_first, reward_last)
    assert all(m["val/num_skipped"] == 0.0 for m in hist)


@pytest.mark.parametrize("family", ["sd15", "sdxl"])
def test_integer_t_families_learn_fewer_steps(family):
    _assert_learns(_sd15_world(16, family=family), 16)


def test_flux_learns_fewer_steps():
    _assert_learns(_flux_world(16), 16)
