"""Joint RLOO training of the SDXL base+refiner ensemble.

Beyond-reference (the reference trains one TPM per backbone): the
SDXLEnsembleAgent stitches base-then-refiner rollouts into ONE episode
(train/sdxl_agent.py EnsembleSampleOutput) and trains both TPM heads with
the shared trainer — the step discount (modeling_sd3_pnt.py:838-841)
applies to the TOTAL NFE across the denoising_end cutoff, so the two
policies learn to split the budget, not just shrink their own stage.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdm_tpu.models import TimePredictor
from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
from tpdm_tpu.train import RLOOConfig, RLOOTrainer
from tpdm_tpu.train.sdxl_agent import (
    SDXLAgent,
    SDXLEnsembleAgent,
    SDXLRefinerAgent,
)

N_TXT = 5


def _const_reward(prompts, outputs):
    b = outputs.final_latents.shape[0]
    ones = np.ones((b,), np.float32)
    return ones, ones


def _build_ensemble(config, denoising_end=0.5, refiner_min_time=150):
    xcfg = UNetConfig.toy_xl()
    xunet = UNetSD15(xcfg)
    xparams = xunet.init(
        jax.random.PRNGKey(1),
        jnp.ones((2, 4, xcfg.sample_size, xcfg.sample_size)),
        jnp.ones((2,)),
        jnp.ones((2, N_TXT, xcfg.cross_attention_dim)),
        {
            "text_embeds": jnp.zeros((2, xcfg.addition_pooled_dim)),
            "time_ids": jnp.zeros((2, 6)),
        },
    )
    base = SDXLAgent(
        xunet, xparams, config,
        tpm=TimePredictor(
            conv_out_channels=4,
            in_channels=2 * xcfg.block_out_channels[0],
            temb_dim=xcfg.block_out_channels[0],
            init_alpha=config.init_alpha,
            init_beta=config.init_beta,
        ),
        guidance_scale=1.0,
    )
    rcfg = UNetConfig.toy_refiner()
    runet = UNetSD15(rcfg)
    rparams = runet.init(
        jax.random.PRNGKey(2),
        jnp.ones((2, 4, rcfg.sample_size, rcfg.sample_size)),
        jnp.ones((2,)),
        jnp.ones((2, N_TXT, rcfg.cross_attention_dim)),
        {
            "text_embeds": jnp.zeros((2, rcfg.addition_pooled_dim)),
            "time_ids": jnp.zeros((2, 5)),
        },
    )
    refiner = SDXLRefinerAgent(
        runet, rparams, config,
        tpm=TimePredictor(
            conv_out_channels=4,
            in_channels=2 * rcfg.block_out_channels[0],
            temb_dim=rcfg.block_out_channels[0],
            init_alpha=config.init_alpha,
            init_beta=config.init_beta,
        ),
        min_time=refiner_min_time,
        guidance_scale=1.0,
    )
    return (
        SDXLEnsembleAgent(base, refiner, denoising_end=denoising_end),
        xcfg,
        rcfg,
    )


def _rows(xcfg, rcfg, n=4, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "prompt": f"p{i}",
            "prompt_embeds": rng.normal(
                size=(N_TXT, xcfg.cross_attention_dim)
            ).astype(np.float32),
            "pooled_prompt_embeds": rng.normal(
                size=(xcfg.addition_pooled_dim,)
            ).astype(np.float32),
            "refiner_prompt_embeds": rng.normal(
                size=(N_TXT, rcfg.cross_attention_dim)
            ).astype(np.float32),
            "refiner_pooled_prompt_embeds": rng.normal(
                size=(rcfg.addition_pooled_dim,)
            ).astype(np.float32),
        }
        for i in range(n)
    ]


def _collate(rows):
    out = {"prompt": [r["prompt"] for r in rows]}
    for k in rows[0]:
        if k != "prompt":
            out[k] = np.stack([r[k] for r in rows])
    return out


@pytest.fixture(scope="module")
def ens_world():
    config = RLOOConfig(
        per_device_train_batch_size=4,
        rloo_k=4,
        max_inference_steps=4,
        total_episodes=8,
        learning_rate=1e-3,
        kl_coef=0.0,
        guidance_scale=None,
        gamma=0.7,
        logging_steps=1,
    )
    agent, xcfg, rcfg = _build_ensemble(config, denoising_end=0.5)
    return dict(agent=agent, config=config, xcfg=xcfg, rcfg=rcfg)


class TestEnsembleRollout:
    def test_sample_replay_parity_and_handoff(self, ens_world):
        agent = ens_world["agent"]
        tpm = agent.init_tpm_params(jax.random.PRNGKey(0))
        data = _collate(_rows(ens_world["xcfg"], ens_world["rcfg"]))
        out = agent.sample(tpm, data, jax.random.PRNGKey(1))

        # handoff is strictly below the cutoff, and the stitched realized
        # trajectory crosses it exactly once per sample
        assert np.all(np.asarray(out.handoff_t) < agent.t_cut)
        tb = agent.base_steps
        times = np.asarray(out.times)
        masks = np.asarray(out.prob_masks)
        lvi = np.asarray(out.last_valid_index)
        for i in range(times.shape[0]):
            base_nfe = int((~masks[i, :tb]).sum())
            ref_nfe = int((~masks[i, tb:]).sum())
            assert base_nfe >= 1
            assert lvi[i] == base_nfe + ref_nfe - 1
            realized = (
                list(times[i, 1 : base_nfe + 1])
                + list(times[i, tb + 2 : tb + 2 + ref_nfe])
            )
            below = [t < agent.t_cut for t in realized]
            assert below == sorted(below), realized

        # replay under the rollout params reproduces the recorded logprobs
        lp = agent.logprobs(tpm, out)
        valid = ~masks
        np.testing.assert_allclose(
            np.asarray(lp)[valid],
            np.asarray(out.logprobs)[valid],
            rtol=1e-5,
        )
        # caches stay per-expert (time-major, each stage's own T); the
        # real experts differ in channel width (320 vs 384) so they can
        # never concatenate — toy widths happen to match
        assert out.h_cache.shape[0] == tb
        assert out.refiner_h_cache.shape[0] == (
            agent.refiner.sampler_cfg.num_inference_steps
        )

    def test_step_caps_bound_total_nfe_and_feed_refiner(self, ens_world):
        agent = ens_world["agent"]
        tpm = agent.init_tpm_params(jax.random.PRNGKey(0))
        data = _collate(_rows(ens_world["xcfg"], ens_world["rcfg"]))
        caps = np.array([2, 3, 8, 8], np.int32)
        out = agent.sample(
            tpm, data, jax.random.PRNGKey(1), step_caps=caps
        )
        masks = np.asarray(out.prob_masks)
        tb = agent.base_steps
        total = (~masks).sum(axis=1)
        assert np.all(total <= caps)
        # cap >= 2 guarantees at least one step on EACH expert: the base's
        # cap step lands exactly on the cutoff (cap_floor_time), never x0
        base_nfe = (~masks[:, :tb]).sum(axis=1)
        ref_nfe = (~masks[:, tb:]).sum(axis=1)
        assert np.all(base_nfe >= 1)
        assert np.all(ref_nfe >= 1)

    def test_stage_config_override_rejected(self, ens_world):
        agent = ens_world["agent"]
        tpm = agent.init_tpm_params(jax.random.PRNGKey(0))
        data = _collate(_rows(ens_world["xcfg"], ens_world["rcfg"]))
        with pytest.raises(ValueError, match="sampler configs"):
            agent.sample(
                tpm, data, jax.random.PRNGKey(1),
                sampler_cfg=dataclasses.replace(agent.sampler_cfg),
            )


class TestEnsembleTraining:
    def test_two_updates_move_both_heads(self, ens_world):
        agent, config = ens_world["agent"], ens_world["config"]
        rows = _rows(ens_world["xcfg"], ens_world["rcfg"])
        trainer = RLOOTrainer(config, agent, _const_reward, rows)
        tpm0 = agent.init_tpm_params(jax.random.PRNGKey(5))
        tpm, _ = trainer.train(tpm_params=jax.tree.map(jnp.copy, tpm0))
        for m in trainer.metrics_history:
            for k, v in m.items():
                if isinstance(v, float):
                    assert np.isfinite(v), (k, v)
            assert m["objective/kl"] == 0.0  # zero-KL on both experts
        moved = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), tpm0, tpm
        )
        assert max(jax.tree.leaves(moved["base"])) > 0, "base TPM frozen"
        assert max(jax.tree.leaves(moved["refiner"])) > 0, (
            "refiner TPM got no gradient through the stitched replay"
        )


def test_ensemble_learns_fewer_total_steps():
    """Constant reward + gamma<1 must drive the TOTAL (base+refiner) NFE
    down — the joint objective the single-expert families can't express
    (same construction as test_learning_families)."""
    num_updates = 16
    rloo_k = 4
    config = RLOOConfig(
        seed=0,
        per_device_train_batch_size=rloo_k,
        rloo_k=rloo_k,
        num_ppo_epochs=2,
        max_inference_steps=4,
        total_episodes=rloo_k * num_updates,
        learning_rate=3e-3,
        gamma=0.7,
        kl_coef=0.0,
        guidance_scale=None,
        logging_steps=1,
        init_alpha=2.0,
        init_beta=1.0,
    )
    agent, xcfg, rcfg = _build_ensemble(
        config, denoising_end=0.5, refiner_min_time=150
    )
    trainer = RLOOTrainer(config, agent, _const_reward, _rows(xcfg, rcfg))
    trainer.train()
    hist = trainer.metrics_history
    assert len(hist) == num_updates

    def window(key, lo, hi):
        return float(np.mean([m[key] for m in hist[lo:hi]]))

    steps_first = window("policy/steps_avg", 0, 4)
    steps_last = window("policy/steps_avg", -4, None)
    reward_first = window("objective/rlhf_reward", 0, 4)
    reward_last = window("objective/rlhf_reward", -4, None)
    assert steps_last < steps_first - 0.75, (steps_first, steps_last)
    assert reward_last > reward_first + 0.02, (reward_first, reward_last)
    assert all(m["val/num_skipped"] == 0.0 for m in hist)
