"""LoRA adapters (models/lora.py) + reward-gradient fine-tuning
(train/draft.py).

Beyond-reference capability the reference's own differentiable reward
path anticipates (`score_gard`, ImageReward.py:87-103, vendored from the
ImageReward paper's ReFL trainer but never wired up): DRaFT-K truncated
backprop through the sampler into LoRA factors over the frozen backbone.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")
from test_rloo import _toy_world  # noqa: E402

from tpdm_tpu.models.lora import (  # noqa: E402
    apply_lora,
    init_lora,
    lora_param_count,
)
from tpdm_tpu.train.draft import (  # noqa: E402
    DraftConfig,
    DraftTrainer,
    build_image_reward_grad_apply,
    load_lora,
    save_lora,
)


class TestLoRA:
    def _params(self):
        _, agent, _, _ = _toy_world()
        return agent, agent.mmdit_params

    def test_identity_at_init_and_targets_2d_kernels(self):
        agent, params = self._params()
        lora = init_lora(params, rank=2, key=jax.random.PRNGKey(1))
        assert len(lora) > 0 and lora_param_count(lora) > 0
        for name, fac in lora.items():
            assert name.endswith("kernel")
            assert fac["a"].ndim == 2 and fac["a"].shape[1] == 2
            assert not fac["b"].any()  # zero-init: exact identity
        merged = apply_lora(params, lora)
        for base, m in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(merged),
        ):
            np.testing.assert_array_equal(np.asarray(base), np.asarray(m))

    def test_gradients_flow_into_factors(self):
        agent, params = self._params()
        lora = init_lora(params, rank=2, key=jax.random.PRNGKey(1))
        cfg = agent.mmdit.config
        args = (
            jnp.ones((1, cfg.in_channels, cfg.sample_size, cfg.sample_size)),
            jnp.ones((1,)),
            jnp.ones((1, 5, cfg.joint_attention_dim)),
            jnp.ones((1, cfg.pooled_projection_dim)),
        )

        def loss(l):
            return jnp.sum(agent.mmdit.apply(apply_lora(params, l), *args)[0] ** 2)

        g = jax.grad(loss)(lora)
        gb = max(float(jnp.abs(v["b"]).max()) for v in g.values())
        assert gb > 0  # d/db = a^T dW != 0 at b=0
        assert np.isfinite(gb)

    def test_scale_and_nonzero_b_change_outputs(self):
        agent, params = self._params()
        lora = init_lora(params, rank=2, key=jax.random.PRNGKey(1))
        lora = jax.tree.map(lambda x: x + 0.01, lora)
        m1 = apply_lora(params, lora, scale=1.0)
        m0 = apply_lora(params, lora, scale=0.0)
        diffs = [
            float(jnp.abs(a - b).max())
            for a, b in zip(
                jax.tree_util.tree_leaves(m1), jax.tree_util.tree_leaves(m0)
            )
        ]
        assert max(diffs) > 0
        for base, z in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(m0)
        ):
            np.testing.assert_array_equal(np.asarray(base), np.asarray(z))

    def test_bad_rank_and_no_match_rejected(self):
        agent, params = self._params()
        with pytest.raises(ValueError, match="rank"):
            init_lora(params, rank=0, key=jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="matched"):
            init_lora(
                params, rank=2, key=jax.random.PRNGKey(0),
                match=lambda p, l: False,
            )

    def test_load_rejects_non_lora_safetensors(self, tmp_path):
        # pointing --lora at a TPM/model checkpoint must fail loudly, not
        # silently merge nothing
        from safetensors.numpy import save_file

        path = str(tmp_path / "not_lora.safetensors")
        save_file({"agent_model.time_predictor.fc2.weight":
                   np.zeros((2, 2), np.float32)}, path)
        with pytest.raises(ValueError, match="not a train/draft.py LoRA"):
            load_lora(path)

        path2 = str(tmp_path / "mismatched.safetensors")
        save_file({"k|a": np.zeros((4, 2), np.float32),
                   "k|b": np.zeros((3, 4), np.float32)}, path2)
        with pytest.raises(ValueError, match="mismatched"):
            load_lora(path2)

    def test_save_load_roundtrip(self, tmp_path):
        agent, params = self._params()
        lora = init_lora(params, rank=2, key=jax.random.PRNGKey(1))
        lora = jax.tree.map(lambda x: x + 0.5, lora)
        path = str(tmp_path / "lora.safetensors")
        save_lora(path, lora)
        back = load_lora(path)
        assert set(back) == set(lora)
        for name in lora:
            np.testing.assert_array_equal(
                np.asarray(lora[name]["a"]), np.asarray(back[name]["a"])
            )
            np.testing.assert_array_equal(
                np.asarray(lora[name]["b"]), np.asarray(back[name]["b"])
            )


def _draft_world(**cfg_kw):
    _, agent, _, dataset = _toy_world()
    kw = dict(
        total_updates=5,
        batch_size=2,
        learning_rate=5e-3,
        lora_rank=2,
        num_steps=3,
        k_backprop=1,
        logging_steps=1,
    )
    kw.update(cfg_kw)
    cfg = DraftConfig(**kw)
    # toy reward: mean latent value (differentiable; trainable upward)
    reward_apply = lambda imgs, batch: jnp.mean(imgs, axis=(1, 2, 3))
    trainer = DraftTrainer(cfg, agent, reward_apply, dataset)
    return cfg, agent, trainer


class TestDraftTrainer:
    def test_reward_ascends_and_base_stays_frozen(self):
        cfg, agent, trainer = _draft_world()
        base_before = jax.tree.map(jnp.copy, agent.mmdit_params)

        # deterministic eval: same latents + prompts before vs after
        row = trainer.collate_fn([trainer.dataset[0], trainer.dataset[1]])
        arrays = {
            k: v
            for k, v in row.items()
            if isinstance(v, (jax.Array, np.ndarray))
        }
        lat0 = agent.prepare_latents(jax.random.PRNGKey(99), 2)
        final_fn = jax.jit(trainer._final_latents)

        lora0 = init_lora(
            agent.mmdit_params, cfg.lora_rank, jax.random.PRNGKey(0)
        )
        r_before = float(jnp.mean(final_fn(lora0, lat0, arrays)))

        lora, _ = trainer.train()
        r_after = float(jnp.mean(final_fn(lora, lat0, arrays)))
        assert r_after > r_before, (r_before, r_after)

        m = trainer.metrics_history[-1]
        assert np.isfinite(list(m.values())).all()
        assert m["draft/num_skipped"] == 0.0
        # the base tree is untouched: only the LoRA factors learned
        for a, b in zip(
            jax.tree_util.tree_leaves(base_before),
            jax.tree_util.tree_leaves(agent.mmdit_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert any(
            float(jnp.abs(fac["b"]).max()) > 0 for fac in lora.values()
        )

    def test_full_chain_backprop_k_equals_t(self):
        cfg, agent, trainer = _draft_world(
            k_backprop=3, num_steps=3, total_updates=2
        )
        lora, _ = trainer.train()
        assert np.isfinite(
            list(trainer.metrics_history[-1].values())
        ).all()

    def test_bad_k_rejected(self):
        with pytest.raises(ValueError, match="k_backprop"):
            _draft_world(k_backprop=0)
        with pytest.raises(ValueError, match="k_backprop"):
            _draft_world(k_backprop=9, num_steps=3)

    def test_save_steps_writes_lora_safetensors(self, tmp_path):
        cfg, agent, trainer = _draft_world(
            total_updates=2, save_steps=2, output_dir=str(tmp_path)
        )
        lora, _ = trainer.train()
        back = load_lora(str(tmp_path / "lora-2.safetensors"))
        for name in lora:
            np.testing.assert_array_equal(
                np.asarray(lora[name]["b"]), np.asarray(back[name]["b"])
            )

    def test_save_total_limit_prunes_oldest(self, tmp_path):
        cfg, agent, trainer = _draft_world(
            total_updates=3, save_steps=1, save_total_limit=2,
            output_dir=str(tmp_path),
        )
        trainer.train()
        names = sorted(p.name for p in tmp_path.glob("lora-*.safetensors"))
        assert names == ["lora-2.safetensors", "lora-3.safetensors"]


class TestDraftFlux:
    def test_flux_agent_reward_ascends(self):
        """The draft hooks are family-agnostic: the FLUX agent (packed
        tokens, embedded guidance, no CFG doubling) trains under the SAME
        DraftTrainer."""
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
            }
            for i in range(4)
        ]
        cfg = DraftConfig(
            total_updates=4, batch_size=2, learning_rate=5e-3,
            lora_rank=2, num_steps=3, k_backprop=1,
        )
        trainer = DraftTrainer(
            cfg, agent,
            lambda imgs, batch: jnp.mean(imgs, axis=(1, 2, 3)),
            dataset,
        )
        # deterministic eval (fixed latents + prompts): per-update rewards
        # are noisy at toy scale because every update draws fresh batches
        arrays = {
            k: v
            for k, v in trainer.collate_fn(dataset[:2]).items()
            if isinstance(v, (jax.Array, np.ndarray))
        }
        lat0 = agent.prepare_latents(jax.random.PRNGKey(99), 2)
        final_fn = jax.jit(trainer._final_latents)
        lora0 = init_lora(
            agent.backbone_params, cfg.lora_rank, jax.random.PRNGKey(0)
        )
        r_before = float(jnp.mean(final_fn(lora0, lat0, arrays)))
        lora, _ = trainer.train()
        r_after = float(jnp.mean(final_fn(lora, lat0, arrays)))
        assert r_after > r_before, (r_before, r_after)
        assert all(
            m["draft/num_skipped"] == 0.0 for m in trainer.metrics_history
        )

    def test_hookless_agent_rejected(self):
        """An agent without the draft hooks (backbone_params /
        denoise_builder) must be refused with an actionable message.
        (SD1.5/SDXL now HAVE the hooks — see TestDraftEpsFamilies.)"""
        class NotAFlowAgent:
            pass

        with pytest.raises(TypeError, match="draft hooks"):
            DraftTrainer(
                DraftConfig(num_steps=2),
                NotAFlowAgent(),
                lambda imgs, batch: imgs,
                [{}],
            )


class TestDraftMesh:
    def test_one_update_with_sharded_backbone(self):
        """Draft step under GSPMD: backbone sharded over (fsdp, tensor),
        replicated LoRA factors merge into the sharded kernels in-graph."""
        from tpdm_tpu.parallel.mesh import make_mesh

        cfg, agent, trainer = _draft_world(total_updates=2)
        mesh = make_mesh(jax.devices()[:4], data=1, fsdp=2, tensor=2)
        agent.shard(mesh)
        trainer.mesh = mesh
        with mesh:
            lora, _ = trainer.train()
        m = trainer.metrics_history[-1]
        assert np.isfinite(list(m.values())).all()
        assert m["draft/num_skipped"] == 0.0
        assert any(
            float(jnp.abs(fac["b"]).max()) > 0 for fac in lora.values()
        )

    def test_sharded_matches_single_device_at_per_shard_batch_2(self):
        """Full GSPMD draft training (batch sharded over (data, fsdp),
        backbone over (fsdp, tensor), factors replicated) must reproduce
        the single-device run. Per-shard batch 2 on a (2,2,2) mesh — the
        regime where SPMD partitioner bugs actually show (CLAUDE.md
        landmine: never test sharded numerics at per-shard batch 1)."""
        from tpdm_tpu.parallel.mesh import make_mesh

        def build(mesh):
            _, agent, _, _ = _toy_world()
            # 8 rows so the global batch of 8 draws without replacement
            rng = np.random.default_rng(0)
            mcfg = agent.mmdit.config
            dataset = [
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
                }
                for i in range(8)
            ]
            cfg = DraftConfig(
                total_updates=2, batch_size=8, learning_rate=5e-3,
                lora_rank=2, num_steps=2, k_backprop=1,
            )
            if mesh is not None:
                agent.shard(mesh)
            trainer = DraftTrainer(
                cfg, agent,
                lambda imgs, batch: jnp.mean(imgs, axis=(1, 2, 3)),
                dataset, mesh=mesh,
            )
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


class TestServeLora:
    def _toy_args(self, **kw):
        import argparse

        d = dict(toy=True, cpu=True, pretrained=None, tpm=None)
        d.update(kw)
        return argparse.Namespace(**d)

    def test_cli_lora_merges_and_serves(self, tmp_path):
        import serve

        base_pipe, tokenize = serve.build_pipeline(self._toy_args())
        lora = init_lora(
            base_pipe.mmdit_params, rank=2, key=jax.random.PRNGKey(3)
        )
        lora = jax.tree.map(lambda x: x + 0.05, lora)
        path = str(tmp_path / "lora.safetensors")
        save_lora(path, lora)

        pipe, _ = serve.build_pipeline(self._toy_args(lora=path))
        diffs = [
            float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
            for a, b in zip(
                jax.tree_util.tree_leaves(base_pipe.mmdit_params),
                jax.tree_util.tree_leaves(pipe.mmdit_params),
            )
        ]
        assert max(diffs) > 0  # the factors actually merged
        from tpdm_tpu.serving import BatchingEngine

        eng = BatchingEngine(pipe, tokenize, max_batch=1, window_ms=1,
                             max_steps=2)
        out = eng.generate_batch(["a cat"], [1])[0]
        assert out["image"].shape[-1] == 3  # merged model serves

    def test_lora_rejected_on_quantized_backbone(self):
        import serve

        with pytest.raises(SystemExit, match="quantize"):
            serve.build_pipeline(
                self._toy_args(lora="whatever.safetensors", int8=True)
            )

    def test_flux_family_merges_sd15_rejected(self, tmp_path):
        import argparse

        import serve

        def fam_args(family, **kw):
            d = dict(
                family=family, toy=True, cpu=True, pretrained=None,
                tpm=None, max_steps=3,
            )
            d.update(kw)
            return argparse.Namespace(**d)

        base = serve.build_family_world(fam_args("flux"))
        lora = init_lora(
            base["agent"].flux_params, rank=2, key=jax.random.PRNGKey(7)
        )
        lora = jax.tree.map(lambda x: x + 0.05, lora)
        path = str(tmp_path / "flux_lora.safetensors")
        save_lora(path, lora)

        merged = serve.build_family_world(fam_args("flux", lora=path))
        diffs = [
            float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
            for a, b in zip(
                jax.tree_util.tree_leaves(base["agent"].flux_params),
                jax.tree_util.tree_leaves(merged["agent"].flux_params),
            )
        ]
        assert max(diffs) > 0  # factors actually merged
        out = merged["runner"](["a cat"], [3], [3])[0]
        assert out["image"].shape[-1] == 3  # merged FLUX serves

        with pytest.raises(SystemExit, match="quantize"):
            serve.build_family_world(fam_args("flux", lora=path, int8=True))

        # sd15 merges its own family's factors now (round-4 eps trainers);
        # a foreign (FLUX) LoRA still fails loudly on the key mismatch
        sd15_base = serve.build_family_world(fam_args("sd15"))
        sd15_lora = init_lora(
            sd15_base["agent"].unet_params, rank=2, key=jax.random.PRNGKey(8)
        )
        sd15_lora = jax.tree.map(lambda x: x + 0.05, sd15_lora)
        spath = str(tmp_path / "sd15_lora.safetensors")
        save_lora(spath, sd15_lora)
        sd15_merged = serve.build_family_world(fam_args("sd15", lora=spath))
        sdiffs = [
            float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
            for a, b in zip(
                jax.tree_util.tree_leaves(sd15_base["agent"].unet_params),
                jax.tree_util.tree_leaves(sd15_merged["agent"].unet_params),
            )
        ]
        assert max(sdiffs) > 0
        out = sd15_merged["runner"](["a cat"], [3], [3])[0]
        assert out["image"].shape[-1] == 3
        with pytest.raises(ValueError):
            serve.build_family_world(fam_args("sd15", lora=path))


class TestFullDifferentiableChain:
    def test_vae_decode_plus_image_reward_gradients(self):
        """The real-configuration DRaFT chain at toy scale: LoRA'd MMDiT
        sampler -> bf16 fast VAE decode (the bench/reward shared path) ->
        in-graph resize/normalize -> ImageReward score_grad. Two updates
        must run un-skipped (finite loss/grads through the whole stack)
        and move the factors."""
        import dataclasses

        from tpdm_tpu.models.vae import VAE, VAEConfig, make_fast_decode
        from tpdm_tpu.rewards.bert import BertMedConfig
        from tpdm_tpu.rewards.image_reward import ImageRewardModel
        from tpdm_tpu.rewards.vit import ViTConfig
        from tpdm_tpu.train.draft import DraftConfig, DraftTrainer

        _, agent, _, dataset = _toy_world()
        mcfg = agent.mmdit.config
        vae = VAE(VAEConfig.toy(latent_channels=mcfg.in_channels))
        vparams = vae.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, mcfg.in_channels, 8, 8)),
            jnp.zeros((1, 3, 16, 16)),
        )
        decode, bparams = make_fast_decode(vae, vparams, jit=False)
        reward_model = ImageRewardModel.create(
            vit_config=ViTConfig.toy(), bert_config=BertMedConfig.toy()
        )
        reward_apply = build_image_reward_grad_apply(reward_model)

        from tpdm_tpu.train.rloo import _default_collate

        def collate(rows):
            b = _default_collate(rows)
            b["reward_ids"] = np.tile(
                np.array([1, 4, 6], np.int32), (len(rows), 1)
            )
            return b

        cfg = DraftConfig(
            total_updates=2, batch_size=2, learning_rate=1e-3,
            lora_rank=2, num_steps=2, k_backprop=1,
        )
        trainer = DraftTrainer(
            cfg, agent, reward_apply, dataset,
            collate_fn=collate, decode_fn=lambda z: decode(bparams, z),
        )
        lora, _ = trainer.train()
        for m in trainer.metrics_history:
            assert np.isfinite(list(m.values())).all()
            assert m["draft/num_skipped"] == 0.0
            assert m["draft/grad_norm"] > 0
        assert any(
            float(jnp.abs(fac["b"]).max()) > 0 for fac in lora.values()
        )


class TestComposeWithRLOO:
    def test_draft_then_rloo_on_merged_backbone(self):
        """The two training modes compose: DRaFT-trained LoRA merges into
        the backbone, and the RLOO schedule-policy trainer runs on the
        merged model unchanged (the frozen-tree agent design makes the
        merge a drop-in)."""
        from tpdm_tpu.train.rloo import RLOOTrainer

        cfg, agent, trainer = _draft_world(total_updates=2)
        lora, _ = trainer.train()
        merged = apply_lora(agent.mmdit_params, lora)

        rcfg, ragent, reward_fn, dataset = _toy_world()
        ragent.mmdit_params = merged
        rtrainer = RLOOTrainer(rcfg, ragent, reward_fn, dataset)
        p0 = ragent.init_tpm_params(jax.random.PRNGKey(5))
        p1, _ = rtrainer.train(tpm_params=jax.tree.map(jnp.copy, p0))
        m = rtrainer.metrics_history[-1]
        assert np.isfinite(list(m.values())).all()
        moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, p1)
        assert max(jax.tree_util.tree_leaves(moved)) > 0


class TestImageRewardGradApply:
    def test_differentiable_scores(self):
        from tpdm_tpu.rewards.bert import BertMedConfig
        from tpdm_tpu.rewards.image_reward import ImageRewardModel
        from tpdm_tpu.rewards.vit import ViTConfig

        model = ImageRewardModel.create(
            vit_config=ViTConfig.toy(), bert_config=BertMedConfig.toy()
        )
        reward_apply = build_image_reward_grad_apply(model)
        images = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (2, 3, 20, 24)),
            jnp.float32,
        )
        batch = {"reward_ids": jnp.array([[1, 4, 6], [2, 5, 0]], jnp.int32)}
        r = reward_apply(images, batch)
        assert r.shape == (2,) and np.isfinite(np.asarray(r)).all()

        g = jax.grad(lambda im: jnp.sum(reward_apply(im, batch)))(images)
        ga = np.asarray(g)
        assert np.isfinite(ga).all() and np.abs(ga).max() > 0


def _eps_agent(family="sdxl", guidance_scale=None, max_steps=3):
    """Toy eps-prediction agent (SD1.5 or SDXL) + prompt rows for the
    reward-gradient / preference trainers."""
    from tpdm_tpu.models import TimePredictor
    from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
    from tpdm_tpu.train import RLOOConfig

    rng = np.random.default_rng(0)
    n_txt = 5
    if family == "sdxl":
        from tpdm_tpu.train.sdxl_agent import SDXLAgent

        ucfg = UNetConfig.toy_xl()
        unet = UNetSD15(ucfg)
        params = unet.init(
            jax.random.PRNGKey(2),
            jnp.zeros((2, 4, ucfg.sample_size, ucfg.sample_size)),
            jnp.ones((2,)),
            jnp.zeros((2, n_txt, ucfg.cross_attention_dim)),
            {
                "text_embeds": jnp.zeros((2, ucfg.addition_pooled_dim)),
                "time_ids": jnp.zeros((2, 6)),
            },
        )
        agent = SDXLAgent(
            unet, params, RLOOConfig(max_inference_steps=max_steps),
            tpm=TimePredictor(
                conv_out_channels=4,
                in_channels=2 * ucfg.block_out_channels[0],
                temb_dim=ucfg.block_out_channels[0],
            ),
            guidance_scale=guidance_scale or 5.0,
        )
    else:
        from tpdm_tpu.train.sd15_agent import SD15Agent

        ucfg = UNetConfig.toy()
        unet = UNetSD15(ucfg)
        params = unet.init(
            jax.random.PRNGKey(2),
            jnp.zeros((2, 4, ucfg.sample_size, ucfg.sample_size)),
            jnp.ones((2,)),
            jnp.zeros((2, n_txt, ucfg.cross_attention_dim)),
        )
        agent = SD15Agent(
            unet, params, RLOOConfig(max_inference_steps=max_steps),
            tpm=TimePredictor(
                conv_out_channels=4,
                in_channels=2 * ucfg.block_out_channels[0],
                temb_dim=ucfg.time_embed_dim,
            ),
            guidance_scale=guidance_scale or 1.0,
        )
    rows = []
    for i in range(4):
        row = {
            "prompt": f"p{i}",
            "prompt_embeds": rng.normal(
                size=(n_txt, ucfg.cross_attention_dim)
            ).astype(np.float32),
            "negative_prompt_embeds": np.zeros(
                (n_txt, ucfg.cross_attention_dim), np.float32
            ),
        }
        if family == "sdxl":
            row["pooled_prompt_embeds"] = rng.normal(
                size=(ucfg.addition_pooled_dim,)
            ).astype(np.float32)
            row["negative_pooled_prompt_embeds"] = np.zeros(
                (ucfg.addition_pooled_dim,), np.float32
            )
        rows.append(row)
    return agent, rows


class TestDraftEpsFamilies:
    """DRaFT on the eps-prediction integer-t families: ReFL's own setting
    is SD1.5 and Diffusion-DPO's is SDXL — the families round 3 rejected.
    The agents supply draft_step_builder (differentiable DDIM over the
    DDPM table); the trainer is unchanged."""

    @pytest.mark.parametrize("family", ["sdxl", "sd15"])
    def test_reward_ascends_and_base_stays_frozen(self, family):
        agent, rows = _eps_agent(family)
        cfg = DraftConfig(
            total_updates=4, batch_size=2, learning_rate=5e-3,
            lora_rank=2, num_steps=3, k_backprop=1,
        )
        trainer = DraftTrainer(
            cfg, agent,
            lambda imgs, batch: jnp.mean(imgs, axis=(1, 2, 3)),
            rows,
        )
        arrays = {
            k: v
            for k, v in trainer.collate_fn(rows[:2]).items()
            if isinstance(v, (jax.Array, np.ndarray))
        }
        lat0 = agent.prepare_latents(jax.random.PRNGKey(99), 2)
        final_fn = jax.jit(trainer._final_latents)
        lora0 = init_lora(
            agent.backbone_params, cfg.lora_rank, jax.random.PRNGKey(0)
        )
        base_before = jax.tree.map(jnp.copy, agent.unet_params)
        r_before = float(jnp.mean(final_fn(lora0, lat0, arrays)))
        lora, _ = trainer.train()
        r_after = float(jnp.mean(final_fn(lora, lat0, arrays)))
        assert r_after > r_before, (family, r_before, r_after)
        assert all(
            m["draft/num_skipped"] == 0.0 for m in trainer.metrics_history
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(base_before),
            jax.tree_util.tree_leaves(agent.unet_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ladder_terminal_step_integrates_to_x0(self):
        """The last DDIM step must take the sigma_t=0 limit (exactly the
        adaptive sampler's cap-step convention), not land at the table's
        smallest nonzero sigma."""
        agent, rows = _eps_agent("sd15")
        step = agent.draft_step_builder(2)
        arrays = {
            k: jnp.asarray(np.stack([r[k] for r in rows[:2]]))
            for k in ("prompt_embeds", "negative_prompt_embeds")
        }
        denoise = agent.denoise_builder(agent.unet_params, arrays)
        lat = agent.prepare_latents(jax.random.PRNGKey(1), 2)
        from tpdm_tpu.ops.dpm_solver import (
            ddpm_sigmas_from_betas,
            epsilon_to_x0,
        )

        mid = step(denoise, lat, 0)
        got = step(denoise, mid, 1, terminal=True)
        t1 = jnp.full((2,), 499.5)
        eps = denoise(mid, t1)[0].astype(jnp.float32)
        table = ddpm_sigmas_from_betas()
        sig = 0.5 * (table[499] + table[500])
        want = epsilon_to_x0(
            eps, mid.astype(jnp.float32), jnp.full((2,), sig)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )
