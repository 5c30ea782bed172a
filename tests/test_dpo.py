"""Diffusion-DPO preference-pair LoRA fine-tuning (train/dpo.py).

Beyond-reference capability: the reference's only training mode is RLOO
on the TPM (src/train/rloo_trainer.py); preference-pair fine-tuning of
the backbone is new here. The frozen-base LoRA parameterization doubles
as the DPO reference model (base = ref, base+LoRA = policy).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")
from test_rloo import _toy_world  # noqa: E402

from tpdm_tpu.models.lora import apply_lora, init_lora  # noqa: E402
from tpdm_tpu.train.dpo import DPOConfig, DPOTrainer  # noqa: E402


def _pair_dataset(agent, n=4, seed=0, nan_w=False):
    """Toy preference rows: preferred latents are smooth low-magnitude,
    rejected are strong noise — any consistent ordering is learnable."""
    rng = np.random.default_rng(seed)
    mcfg = agent.mmdit.config
    shape = (mcfg.in_channels, mcfg.sample_size, mcfg.sample_size)
    rows = []
    for i in range(n):
        w = rng.normal(size=shape).astype(np.float32) * 0.1
        if nan_w:
            w[0, 0, 0] = np.nan
        rows.append(
            {
                "prompt": f"p{i}",
                "prompt_embeds": rng.normal(
                    size=(5, mcfg.joint_attention_dim)
                ).astype(np.float32),
                "pooled_prompt_embeds": rng.normal(
                    size=(mcfg.pooled_projection_dim,)
                ).astype(np.float32),
                "negative_prompt_embeds": np.zeros(
                    (5, mcfg.joint_attention_dim), np.float32
                ),
                "negative_pooled_prompt_embeds": np.zeros(
                    (mcfg.pooled_projection_dim,), np.float32
                ),
                "latents_w": w,
                "latents_l": rng.normal(size=shape).astype(np.float32) * 1.5,
            }
        )
    return rows


def _dpo_world(n_rows=4, dataset=None, **cfg_kw):
    _, agent, _, _ = _toy_world()
    kw = dict(
        total_updates=6,
        batch_size=2,
        learning_rate=5e-3,
        lora_rank=2,
        beta=100.0,
        logging_steps=1,
    )
    kw.update(cfg_kw)
    cfg = DPOConfig(**kw)
    if dataset is None:
        dataset = _pair_dataset(agent, n=n_rows)
    trainer = DPOTrainer(cfg, agent, dataset)
    return cfg, agent, trainer


class TestDPOTrainer:
    def test_margin_ascends_and_base_stays_frozen(self):
        """-log sigmoid(margin) descends <=> the implicit-reward margin of
        preferred over rejected rises; margin is exactly 0 at LoRA init
        (merged == base => policy errs == ref errs)."""
        cfg, agent, trainer = _dpo_world()
        base_before = jax.tree.map(jnp.copy, agent.mmdit_params)
        lora, _ = trainer.train()
        hist = trainer.metrics_history
        first, last = hist[0], hist[-1]
        # update 1 runs AT init: margin == 0, loss == log 2
        assert abs(first["dpo/margin"]) < 1e-3, first
        np.testing.assert_allclose(
            first["dpo/loss"], np.log(2.0), rtol=1e-3
        )
        assert last["dpo/margin"] > 0.05, [m["dpo/margin"] for m in hist]
        assert last["dpo/implicit_acc"] > 0.5
        assert last["dpo/loss"] < first["dpo/loss"]
        assert all(m["dpo/num_skipped"] == 0.0 for m in hist)
        for a, b in zip(
            jax.tree_util.tree_leaves(base_before),
            jax.tree_util.tree_leaves(agent.mmdit_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert any(
            float(jnp.abs(fac["b"]).max()) > 0 for fac in lora.values()
        )

    def test_images_path_needs_encode_fn_and_runs_with_one(self):
        _, agent, _, _ = _toy_world()
        mcfg = agent.mmdit.config
        rng = np.random.default_rng(1)
        f = 2  # toy "VAE": average-pool uint8 -> latents
        H = mcfg.sample_size * f
        rows = []
        for i in range(2):
            rows.append(
                {
                    "prompt": f"p{i}",
                    "prompt_embeds": rng.normal(
                        size=(5, mcfg.joint_attention_dim)
                    ).astype(np.float32),
                    "pooled_prompt_embeds": rng.normal(
                        size=(mcfg.pooled_projection_dim,)
                    ).astype(np.float32),
                    "negative_prompt_embeds": np.zeros(
                        (5, mcfg.joint_attention_dim), np.float32
                    ),
                    "negative_pooled_prompt_embeds": np.zeros(
                        (mcfg.pooled_projection_dim,), np.float32
                    ),
                    "images_w": rng.integers(
                        0, 255, (H, H, 3), dtype=np.uint8
                    ),
                    "images_l": rng.integers(
                        0, 255, (H, H, 3), dtype=np.uint8
                    ),
                }
            )
        cfg = DPOConfig(total_updates=1, batch_size=2, lora_rank=2)
        trainer = DPOTrainer(cfg, agent, rows)
        with pytest.raises(ValueError, match="encode_fn"):
            trainer.train()

        def encode(imgs):
            x = jnp.asarray(imgs, jnp.float32) / 127.5 - 1.0
            x = x.reshape(
                x.shape[0], mcfg.sample_size, f, mcfg.sample_size, f, 3
            ).mean(axis=(2, 4))
            x = jnp.transpose(x, (0, 3, 1, 2))  # -> (b, 3, h, w)
            reps = -(-mcfg.in_channels // 3)
            return jnp.tile(x, (1, reps, 1, 1))[:, : mcfg.in_channels]

        trainer = DPOTrainer(cfg, agent, rows, encode_fn=encode)
        trainer.train()
        m = trainer.metrics_history[-1]
        assert np.isfinite(list(m.values())).all()

    def test_missing_pair_keys_rejected(self):
        _, agent, trainer = _dpo_world(total_updates=1)
        rows = [
            {k: v for k, v in r.items() if not k.startswith("latents_")}
            for r in trainer.dataset
        ]
        trainer.dataset = rows
        with pytest.raises(ValueError, match="latents_w"):
            trainer.train()

    def test_agent_without_draft_hooks_rejected(self):
        class NotAFlowAgent:
            pass

        with pytest.raises(TypeError, match="draft hooks"):
            DPOTrainer(DPOConfig(), NotAFlowAgent(), [])

    def test_bad_timestep_sampling_rejected(self):
        _, agent, _, _ = _toy_world()
        with pytest.raises(ValueError, match="timestep_sampling"):
            DPOTrainer(
                DPOConfig(timestep_sampling="cosine"), agent,
                _pair_dataset(agent),
            )

    def test_nan_pair_skips_update(self):
        _, agent, _, _ = _toy_world()
        dataset = _pair_dataset(agent, nan_w=True)
        cfg = DPOConfig(total_updates=1, batch_size=2, lora_rank=2)
        trainer = DPOTrainer(cfg, agent, dataset)
        lora0 = init_lora(
            agent.mmdit_params, cfg.lora_rank, jax.random.PRNGKey(0)
        )
        lora, _ = trainer.train(lora=jax.tree.map(jnp.copy, lora0))
        assert trainer.metrics_history[-1]["dpo/num_skipped"] == 1.0
        for a, b in zip(
            jax.tree_util.tree_leaves(lora0),
            jax.tree_util.tree_leaves(lora),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_save_steps_and_rotation(self, tmp_path):
        cfg, agent, trainer = _dpo_world(
            total_updates=3, save_steps=1, save_total_limit=2,
            output_dir=str(tmp_path),
        )
        trainer.train()
        import os

        files = sorted(
            f for f in os.listdir(tmp_path) if f.endswith(".safetensors")
        )
        assert files == ["lora-2.safetensors", "lora-3.safetensors"]

    def test_uniform_timesteps_run(self):
        _, agent, trainer = _dpo_world(
            total_updates=1, timestep_sampling="uniform"
        )
        trainer.train()
        assert np.isfinite(
            list(trainer.metrics_history[-1].values())
        ).all()


class TestDPOFlux:
    def test_flux_agent_trains(self):
        """Family-agnostic via the same draft hooks: packed tokens,
        embedded guidance, no CFG doubling."""
        from tpdm_tpu.models import TimePredictor
        from tpdm_tpu.models.flux import Flux, FluxConfig, pack_latents
        from tpdm_tpu.train import RLOOConfig
        from tpdm_tpu.train.flux_agent import FluxAgent

        fcfg = FluxConfig.toy()
        model = Flux(fcfg)
        n_txt = 5
        lat = jnp.zeros((2, 4, 8, 8))
        tokens, img_ids = pack_latents(lat)
        params = model.init(
            jax.random.PRNGKey(0), tokens, img_ids,
            jnp.zeros((2, n_txt, fcfg.txt_dim)), jnp.zeros((2, n_txt, 3)),
            jnp.ones((2,)), jnp.zeros((2, fcfg.vec_dim)),
            jnp.full((2,), 3.5),
        )
        agent = FluxAgent(
            model, params, RLOOConfig(max_inference_steps=3),
            tpm=TimePredictor(
                conv_out_channels=4, in_channels=2 * fcfg.hidden_size,
                temb_dim=fcfg.hidden_size,
            ),
            latent_size=8, latent_channels=4,
        )
        rng = np.random.default_rng(0)
        dataset = [
            {
                "prompt": f"p{i}",
                "prompt_embeds": rng.normal(
                    size=(n_txt, fcfg.txt_dim)
                ).astype(np.float32),
                "pooled_prompt_embeds": rng.normal(
                    size=(fcfg.vec_dim,)
                ).astype(np.float32),
                "latents_w": (
                    rng.normal(size=(4, 8, 8)).astype(np.float32) * 0.1
                ),
                "latents_l": (
                    rng.normal(size=(4, 8, 8)).astype(np.float32) * 1.5
                ),
            }
            for i in range(4)
        ]
        cfg = DPOConfig(
            total_updates=4, batch_size=2, learning_rate=5e-3,
            lora_rank=2, beta=100.0,
        )
        trainer = DPOTrainer(cfg, agent, dataset)
        trainer.train()
        hist = trainer.metrics_history
        assert all(m["dpo/num_skipped"] == 0.0 for m in hist)
        assert hist[-1]["dpo/margin"] > 0.0, [m["dpo/margin"] for m in hist]


class TestDPOMesh:
    def test_sharded_matches_single_device_at_per_shard_batch_2(self):
        """GSPMD DPO (pairs sharded over (data, fsdp), backbone over
        (fsdp, tensor), factors replicated) reproduces the single-device
        run. Per-shard batch 2 on a (2,2,2) mesh — the regime where SPMD
        partitioner bugs actually show (CLAUDE.md landmine)."""
        from tpdm_tpu.parallel.mesh import make_mesh

        def build(mesh):
            _, agent, _, _ = _toy_world()
            dataset = _pair_dataset(agent, n=8)
            cfg = DPOConfig(
                total_updates=2, batch_size=8, learning_rate=5e-3,
                lora_rank=2, beta=100.0,
            )
            if mesh is not None:
                agent.shard(mesh)
            trainer = DPOTrainer(cfg, agent, dataset, mesh=mesh)
            return trainer.train()[0]

        ref = build(None)
        mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, tensor=2)
        with mesh:
            sharded = build(mesh)
        for r, s in zip(
            jax.tree_util.tree_leaves(ref),
            jax.tree_util.tree_leaves(sharded),
        ):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(s), rtol=1e-4, atol=1e-6
            )


class TestDPOEpsFamilies:
    """Diffusion-DPO on the eps-prediction families — the paper's own
    flagship setting is SDXL. The agent supplies forward_noising (DDPM
    x_t = alpha x0 + sigma*alpha eps, target eps); the trainer's loss is
    otherwise unchanged."""

    def _world(self, family, **cfg_kw):
        from test_draft import _eps_agent

        agent, rows = _eps_agent(family)
        ucfg = agent.unet.config
        rng = np.random.default_rng(7)
        shape = (4, ucfg.sample_size, ucfg.sample_size)
        for r in rows:
            r["latents_w"] = (
                rng.normal(size=shape).astype(np.float32) * 0.1
            )
            r["latents_l"] = (
                rng.normal(size=shape).astype(np.float32) * 1.5
            )
        kw = dict(
            total_updates=6, batch_size=2, learning_rate=5e-3,
            lora_rank=2, beta=100.0,
        )
        kw.update(cfg_kw)
        cfg = DPOConfig(**kw)
        return cfg, agent, DPOTrainer(cfg, agent, rows)

    @pytest.mark.parametrize("family", ["sdxl", "sd15"])
    def test_margin_ascends_and_base_stays_frozen(self, family):
        cfg, agent, trainer = self._world(family)
        base_before = jax.tree.map(jnp.copy, agent.unet_params)
        lora, _ = trainer.train()
        hist = trainer.metrics_history
        first, last = hist[0], hist[-1]
        # update 1 runs AT init: merged == base => margin 0, loss log 2
        assert abs(first["dpo/margin"]) < 1e-3, first
        np.testing.assert_allclose(first["dpo/loss"], np.log(2.0), rtol=1e-3)
        assert last["dpo/margin"] > 0.05, [m["dpo/margin"] for m in hist]
        assert last["dpo/implicit_acc"] > 0.5
        assert last["dpo/loss"] < first["dpo/loss"]
        assert all(m["dpo/num_skipped"] == 0.0 for m in hist)
        for a, b in zip(
            jax.tree_util.tree_leaves(base_before),
            jax.tree_util.tree_leaves(agent.unet_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_forward_noising_is_ddpm(self):
        """x_t from the agent hook must be the VP forward at t = s*999,
        matching the sigma table the DPM sampler integrates."""
        from test_draft import _eps_agent

        from tpdm_tpu.ops.dpm_solver import (
            ddpm_sigmas_from_betas,
            sigma_of_timestep,
            sigma_to_alpha_sigma_t,
        )

        agent, _ = _eps_agent("sd15")
        x0 = jnp.ones((2, 4, 16, 16)) * 0.5
        eps = jnp.ones_like(x0) * 2.0
        s = jnp.array([0.25, 0.75])
        x_t, t_arg, target = agent.forward_noising(x0, eps, s)
        np.testing.assert_allclose(np.asarray(t_arg), [249.75, 749.25])
        np.testing.assert_array_equal(np.asarray(target), np.asarray(eps))
        sig = sigma_of_timestep(ddpm_sigmas_from_betas(), s * 999.0)
        a, sa = sigma_to_alpha_sigma_t(sig)
        want = a[:, None, None, None] * x0 + sa[:, None, None, None] * eps
        np.testing.assert_allclose(
            np.asarray(x_t), np.asarray(want), rtol=1e-6, atol=1e-6
        )
