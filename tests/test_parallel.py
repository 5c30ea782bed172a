"""Sharding correctness on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdm_tpu.models import MMDiT, MMDiTConfig
from tpdm_tpu.parallel import (
    auto_mesh_shape,
    make_mesh,
    mmdit_param_specs,
    shard_batch,
    shard_params,
)
from jax.sharding import PartitionSpec as P


class TestMesh:
    def test_auto_shapes(self):
        assert auto_mesh_shape(1) == (1, 1, 1)
        assert auto_mesh_shape(2) == (1, 2, 1)
        assert auto_mesh_shape(4) == (2, 2, 1)
        d, f, t = auto_mesh_shape(8)
        assert d * f * t == 8 and t == 2 and f == 2

    def test_make_mesh_8(self):
        mesh = make_mesh(jax.devices()[:8])
        assert mesh.shape["data"] * mesh.shape["fsdp"] * mesh.shape["tensor"] == 8


class TestParamSpecs:
    def test_qkv_column_out_row(self):
        cfg = MMDiTConfig.toy()
        model = MMDiT(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, cfg.in_channels, cfg.sample_size, cfg.sample_size)),
            jnp.ones((1,)),
            jnp.ones((1, 4, cfg.joint_attention_dim)),
            jnp.ones((1, cfg.pooled_projection_dim)),
        )
        # no mesh given -> row kernels take the SAFE (tensor, data) spec
        # (the (tensor, fsdp) variant miscompiles when tensor>1; see the
        # _ROW note in parallel/sharding.py)
        specs = mmdit_param_specs(params)
        blk = specs["params"]["transformer_blocks_0"]
        assert blk["attn"]["to_q"]["kernel"] == P("fsdp", "tensor")
        assert blk["attn"]["to_out"]["kernel"] == P("tensor", "data")
        assert blk["ff"]["proj_in"]["kernel"] == P("fsdp", "tensor")
        assert blk["ff"]["proj_out"]["kernel"] == P("tensor", "data")
        assert blk["norm1"]["linear"]["kernel"] == P("fsdp", None)
        # biases replicated
        assert blk["attn"]["to_q"]["bias"] == P()

        # tensor-trivial mesh -> rows regain full ZeRO sharding over fsdp
        mesh = make_mesh(jax.devices()[:4], data=2, fsdp=2, tensor=1)
        specs = mmdit_param_specs(params, mesh)
        blk = specs["params"]["transformer_blocks_0"]
        assert blk["attn"]["to_out"]["kernel"] == P("tensor", "fsdp")

    def test_sharded_forward_matches_unsharded(self):
        # b=8 (2 rows per (data,fsdp) shard) is the regression trigger for
        # the XLA SPMD row-spec miscompile (see parallel/sharding.py _ROW
        # note): per-shard batch >= 2 produced row-mixed outputs with the
        # old col=(fsdp,tensor)+row=(tensor,fsdp) spec pair.
        cfg = MMDiTConfig.toy(use_pallas=False)
        model = MMDiT(cfg)
        b, n_txt = 8, 6
        lat = jax.random.normal(
            jax.random.PRNGKey(0), (b, cfg.in_channels, cfg.sample_size, cfg.sample_size)
        )
        t = jnp.full((b,), 700.0)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (b, n_txt, cfg.joint_attention_dim))
        pooled = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.pooled_projection_dim))
        params = model.init(jax.random.PRNGKey(3), lat, t, ctx, pooled)

        ref, *_ = jax.jit(model.apply)(params, lat, t, ctx, pooled)

        mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, tensor=2)
        with mesh:
            sp = shard_params(params, mesh)
            sb = shard_batch({"lat": lat, "t": t, "ctx": ctx, "pooled": pooled}, mesh)
            out, *_ = jax.jit(model.apply)(sp, sb["lat"], sb["t"], sb["ctx"], sb["pooled"])
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), rtol=2e-4, atol=2e-4
        )


class TestFamilyShardedForwardParity:
    """SD1.5 and FLUX forwards under the shared specs on a FULL (2,2,2)
    mesh, per-shard batch 2 — the regime where the XLA SPMD row-spec
    miscompile hides at batch 1 (see parallel/sharding.py _ROW note). The
    SD3 equivalent lives in TestParamSpecs."""

    def test_sd15_unet_sharded_matches_unsharded(self):
        from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
        from tpdm_tpu.parallel.sharding import shard_batch, shard_params

        cfg = UNetConfig.toy()
        unet = UNetSD15(cfg)
        b, n_txt = 8, 7
        lat = jax.random.normal(jax.random.PRNGKey(0), (b, 4, cfg.sample_size, cfg.sample_size))
        t = jnp.full((b,), 321.0)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (b, n_txt, cfg.cross_attention_dim))
        params = unet.init(jax.random.PRNGKey(2), lat, t, ctx)
        ref = jax.jit(unet.apply)(params, lat, t, ctx)

        mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, tensor=2)
        sp = shard_params(params, mesh)
        sb = shard_batch({"lat": lat, "t": t, "ctx": ctx}, mesh)
        with mesh:
            out = jax.jit(unet.apply)(sp, sb["lat"], sb["t"], sb["ctx"])
        for r, o in zip(ref, out):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(o), rtol=2e-4, atol=2e-4
            )

    @pytest.mark.parametrize("toy", ["toy", "toy_xl"])
    def test_unet_act_mesh_kills_involuntary_remat(self, toy, capfd):
        """With UNetConfig.act_mesh set (as SD15Agent/SDXLAgent.shard do),
        the transformer token stream is pinned to batch-only sharding: the
        per-block GSPMD "Involuntary full rematerialization" reshard
        disappears on a tensor>1 mesh and numerics still match the
        unsharded forward at per-shard batch 2 (the miscompile regime —
        same fix class as FluxConfig.act_mesh, tests/test_flux.py)."""
        import dataclasses as _dc

        from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
        from tpdm_tpu.parallel.sharding import shard_batch, shard_params

        cfg = getattr(UNetConfig, toy)()
        unet = UNetSD15(cfg)
        b, n_txt = 8, 7
        lat = jax.random.normal(
            jax.random.PRNGKey(0), (b, 4, cfg.sample_size, cfg.sample_size)
        )
        t = jnp.full((b,), 321.0)
        ctx = jax.random.normal(
            jax.random.PRNGKey(1), (b, n_txt, cfg.cross_attention_dim)
        )
        added = (
            {
                "text_embeds": jax.random.normal(
                    jax.random.PRNGKey(4), (b, cfg.addition_pooled_dim)
                ),
                "time_ids": jnp.tile(
                    jnp.arange(cfg.num_time_ids, dtype=jnp.float32), (b, 1)
                ),
            }
            if cfg.addition_embed
            else None
        )
        args = (lat, t, ctx) + ((added,) if added is not None else ())
        params = unet.init(jax.random.PRNGKey(2), *args)
        ref = jax.jit(unet.apply)(params, *args)

        mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, tensor=2)
        anchored = UNetSD15(_dc.replace(cfg, act_mesh=mesh))
        sp = shard_params(params, mesh)
        sb = shard_batch({"lat": lat, "t": t, "ctx": ctx}, mesh)
        sargs = (sb["lat"], sb["t"], sb["ctx"])
        if added is not None:
            sa = shard_batch(added, mesh)
            sargs = sargs + (sa,)
        capfd.readouterr()  # drop anything emitted so far
        with mesh:
            out = jax.jit(anchored.apply)(sp, *sargs)
        jax.block_until_ready(out)
        stderr = capfd.readouterr().err
        assert "Involuntary full rematerialization" not in stderr, stderr[:2000]
        for r, o in zip(ref, out):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(o), rtol=2e-4, atol=2e-4
            )

    def test_flux_sharded_matches_unsharded(self):
        from tpdm_tpu.models.flux import Flux, FluxConfig, pack_latents
        from tpdm_tpu.parallel.sharding import shard_batch, shard_params

        cfg = FluxConfig.toy()
        model = Flux(cfg)
        b, n_txt = 8, 5
        lat = jax.random.normal(jax.random.PRNGKey(0), (b, 4, 8, 8))
        tokens, img_ids = pack_latents(lat)
        txt = jax.random.normal(jax.random.PRNGKey(1), (b, n_txt, cfg.txt_dim))
        txt_ids = jnp.zeros((b, n_txt, 3))
        sig = jnp.full((b,), 0.7)
        pooled = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.vec_dim))
        g = jnp.full((b,), 3.5)
        params = model.init(
            jax.random.PRNGKey(3), tokens, img_ids, txt, txt_ids, sig, pooled, g
        )
        ref = jax.jit(model.apply)(params, tokens, img_ids, txt, txt_ids, sig, pooled, g)

        mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, tensor=2)
        sp = shard_params(params, mesh)
        sb = shard_batch(
            {"tok": tokens, "ids": img_ids, "txt": txt, "tids": txt_ids,
             "sig": sig, "pooled": pooled, "g": g},
            mesh,
        )
        with mesh:
            out = jax.jit(model.apply)(
                sp, sb["tok"], sb["ids"], sb["txt"], sb["tids"], sb["sig"],
                sb["pooled"], sb["g"],
            )
        for r, o in zip(ref, out):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(o), rtol=3e-4, atol=3e-4
            )


class TestConvKernelSharding:
    def test_spec_shards_large_conv_out_dim(self):
        from tpdm_tpu.parallel.sharding import mmdit_param_specs

        tree = {
            "conv_big": jnp.zeros((3, 3, 320, 640)),
            "conv_small": jnp.zeros((3, 3, 8, 16)),
        }
        specs = mmdit_param_specs(tree)
        assert specs["conv_big"] == P(None, None, None, "fsdp")
        assert specs["conv_small"] == P()

    def test_sharded_conv_matches_unsharded(self):
        """NHWC conv with the kernel fsdp-sharded on the output-feature dim
        and the batch over (data, fsdp): per-shard batch >= 2 (the regression
        regime of the row-spec miscompile)."""
        from jax.sharding import NamedSharding

        mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, tensor=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 6, 256))
        k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 256, 512)) * 0.02

        conv = lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        ref = jax.jit(conv)(x, k)
        xs = jax.device_put(
            x, NamedSharding(mesh, P(("data", "fsdp"), None, None, None))
        )
        ks = jax.device_put(k, NamedSharding(mesh, P(None, None, None, "fsdp")))
        with mesh:
            out = jax.jit(conv)(xs, ks)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), rtol=2e-4, atol=2e-4
        )


class TestDryrun:
    @pytest.mark.parametrize("n", [1, 4, 8])
    def test_dryrun_training_step(self, n):
        from tpdm_tpu.parallel.dryrun import dryrun_training_step

        metrics = dryrun_training_step(n)
        assert np.isfinite(metrics["loss"])
        assert metrics["num_steps"] >= 1


class TestMeshTrainer:
    """The REAL RLOOTrainer running mesh-native (round-2 VERDICT item 1)."""

    def _run(self, mesh, per_device, world_note, offload="none"):
        import dataclasses

        from tpdm_tpu.train.builders import (
            build_toy_agent,
            build_toy_reward,
            make_prompt_encoder,
        )
        from tpdm_tpu.train.config import RLOOConfig
        from tpdm_tpu.train.rloo import RLOOTrainer

        cfg = RLOOConfig(
            per_device_train_batch_size=per_device,
            rloo_k=2,
            num_ppo_epochs=1,
            max_inference_steps=2,
            guidance_scale=7.0,
            learning_rate=1e-4,
            total_episodes=8,
            save_steps=0,
            offload_cache=offload,
        )
        agent = build_toy_agent(cfg)
        if mesh is not None:
            agent.shard(mesh)
        dataset = [{"prompt": f"prompt {i}"} for i in range(8)]
        trainer = RLOOTrainer(
            cfg,
            agent,
            build_toy_reward(),
            dataset,
            collate_fn=make_prompt_encoder(agent),
            mesh=mesh,
        )
        params, _ = trainer.train()
        return params, trainer.metrics_history[-1]

    def test_sharded_update_matches_single_device(self):
        """One full trainer update computes the same numbers sharded over a
        (2,2,2) mesh (global micro = 2x4 dp shards) as unsharded (micro=8):
        same global batch, same rollout, same PPO update."""
        ref_params, ref_m = self._run(None, per_device=8, world_note=1)
        mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, tensor=2)
        sh_params, sh_m = self._run(mesh, per_device=2, world_note=4)

        for k in ("objective/rlhf_reward", "policy/steps_avg", "loss/policy_avg"):
            np.testing.assert_allclose(ref_m[k], sh_m[k], rtol=2e-3, atol=2e-5)
        flat_r = jax.tree_util.tree_leaves(ref_params)
        flat_s = jax.tree_util.tree_leaves(sh_params)
        for r, s in zip(flat_r, flat_s):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(s), rtol=1e-3, atol=1e-5
            )

    def test_host_offload_matches_resident_on_mesh(self):
        """offload_cache='host' under GSPMD: the global cache round-trips
        host RAM between rollout and PPO replay; per-shard batch 2 (the
        regime where sharding bugs actually show) must reproduce the
        resident-mesh numbers exactly."""
        mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, tensor=2)
        res_params, res_m = self._run(mesh, per_device=2, world_note=4)
        off_params, off_m = self._run(
            mesh, per_device=2, world_note=4, offload="host"
        )
        for k in ("objective/rlhf_reward", "loss/policy_avg"):
            np.testing.assert_allclose(res_m[k], off_m[k], rtol=1e-6)
        for r, s in zip(
            jax.tree_util.tree_leaves(res_params),
            jax.tree_util.tree_leaves(off_params),
        ):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(s), rtol=1e-6, atol=1e-7
            )

    def test_elastic_resume_across_mesh_shapes(self, tmp_path):
        """Checkpoints are mesh-agnostic host state: one checkpoint written
        under a (2,2,2) mesh resumes under a different factorization
        ((1,4,2)) AND on a single device, and every resumed run computes
        the identical next update (same restored np_rng data order, same
        folded rollout key). This is the rescale half of
        detection-and-restart: a preempted 8-chip job can come back on
        whatever slice is available."""
        import dataclasses

        from tpdm_tpu.train.builders import (
            build_toy_agent,
            build_toy_reward,
            make_prompt_encoder,
        )
        from tpdm_tpu.train.config import RLOOConfig
        from tpdm_tpu.train.rloo import RLOOTrainer

        base_cfg = RLOOConfig(
            per_device_train_batch_size=2,
            rloo_k=2,
            num_ppo_epochs=1,
            max_inference_steps=2,
            guidance_scale=7.0,
            learning_rate=1e-4,
            total_episodes=16,  # 2 updates of global batch 8
            save_steps=2,
            output_dir=str(tmp_path),
        )
        dataset = [{"prompt": f"prompt {i}"} for i in range(8)]

        def make_trainer(cfg, mesh):
            agent = build_toy_agent(cfg)
            if mesh is not None:
                agent.shard(mesh)
            return RLOOTrainer(
                cfg, agent, build_toy_reward(), dataset,
                collate_fn=make_prompt_encoder(agent), mesh=mesh,
            )

        mesh_a = make_mesh(jax.devices()[:8], data=2, fsdp=2, tensor=2)
        make_trainer(base_cfg, mesh_a).train()
        ckpt = str(tmp_path / "checkpoint-2")
        assert (tmp_path / "checkpoint-2").is_dir()

        # one more update (3) from the same checkpoint, three topologies
        more = dataclasses.replace(
            base_cfg, total_episodes=24, save_steps=0,
            output_dir=str(tmp_path / "resume"),
        )
        mesh_b = make_mesh(jax.devices()[:8], data=1, fsdp=4, tensor=2)
        single = dataclasses.replace(more, per_device_train_batch_size=8)
        finals = [
            make_trainer(more, mesh_a).train(resume_from_checkpoint=ckpt),
            make_trainer(more, mesh_b).train(resume_from_checkpoint=ckpt),
            make_trainer(single, None).train(resume_from_checkpoint=ckpt),
        ]
        ref = jax.tree_util.tree_leaves(finals[0][0])
        for params, _ in finals[1:]:
            for r, s in zip(ref, jax.tree_util.tree_leaves(params)):
                np.testing.assert_allclose(
                    np.asarray(r), np.asarray(s), rtol=1e-3, atol=1e-5
                )

    def test_dryrun_trainer_with_resume(self):
        from tpdm_tpu.parallel.dryrun import dryrun_trainer

        m = dryrun_trainer(4, mesh_shape=(2, 2, 1), num_updates=1)
        assert np.isfinite(m["loss/policy_avg"])
        assert np.isfinite(m["resumed_loss"])

    def test_recompute_replay_mode_sharded(self):
        """recompute replay re-runs the SHARDED frozen backbone inside the
        jitted train step (backbone params as sharded jit arguments) — the
        memory mode production SD3 training would use at scale."""
        import dataclasses

        from tpdm_tpu.models import TimePredictor
        from tpdm_tpu.train.builders import (
            build_toy_agent,
            build_toy_reward,
            make_prompt_encoder,
        )
        from tpdm_tpu.train.config import RLOOConfig
        from tpdm_tpu.train.rloo import RLOOTrainer, TPDMAgent

        cfg = RLOOConfig(
            per_device_train_batch_size=2,
            rloo_k=2,
            num_ppo_epochs=1,
            max_inference_steps=2,
            guidance_scale=7.0,
            learning_rate=1e-4,
            total_episodes=8,
        )
        base = build_toy_agent(cfg)
        mcfg = base.mmdit.config
        agent = TPDMAgent(
            base.mmdit,
            base.mmdit_params,
            cfg,
            tpm=TimePredictor(
                conv_out_channels=4,
                in_channels=2 * mcfg.inner_dim,
                temb_dim=mcfg.inner_dim,
            ),
            replay_mode="recompute",
        )
        mesh = make_mesh(jax.devices()[:4], data=2, fsdp=2, tensor=1)
        agent.shard(mesh)
        trainer = RLOOTrainer(
            cfg,
            agent,
            build_toy_reward(),
            [{"prompt": f"p{i}"} for i in range(8)],
            collate_fn=make_prompt_encoder(agent),
            mesh=mesh,
        )
        params, _ = trainer.train()
        m = trainer.metrics_history[-1]
        assert np.isfinite(m["loss/policy_avg"])
        assert np.isfinite(m["policy/grad_norm_avg"])

    def test_dryrun_agent_families(self):
        """SD1.5, SDXL, and FLUX agents each run a sharded RLOO update
        through the real trainer (SURVEY §2.5)."""
        from tpdm_tpu.parallel.dryrun import dryrun_agent_families

        r = dryrun_agent_families(4, (2, 2, 1))
        assert np.isfinite(r["sd15"]["loss/policy_avg"])
        assert np.isfinite(r["sdxl"]["loss/policy_avg"])
        assert np.isfinite(r["sdxl_ensemble"]["loss/policy_avg"])
        assert np.isfinite(r["flux"]["loss/policy_avg"])
        assert r["sd15"]["objective/kl"] == 0.0  # SD1.5 KL identically zero
        assert r["sdxl"]["objective/kl"] == 0.0  # inherited zero-KL
        assert r["sdxl_ensemble"]["objective/kl"] == 0.0
        # the stitched episode spans both experts: >= 1 step each
        assert r["sdxl_ensemble"]["policy/steps_avg"] >= 2.0

    def test_world_size_mismatch_raises(self):
        import dataclasses

        from tpdm_tpu.train.builders import build_toy_agent, build_toy_reward
        from tpdm_tpu.train.config import RLOOConfig
        from tpdm_tpu.train.rloo import RLOOTrainer

        cfg = RLOOConfig(world_size=3, total_episodes=8)
        agent = build_toy_agent(cfg)
        mesh = make_mesh(jax.devices()[:4], data=2, fsdp=2, tensor=1)
        with pytest.raises(ValueError, match="world_size"):
            RLOOTrainer(
                cfg, agent, build_toy_reward(),
                [{"prompt": "x"}] * 8, mesh=mesh,
            )


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestMultihostHelpers:
    def test_single_process_behavior(self):
        from tpdm_tpu.parallel.multihost import (
            allgather_arrays,
            broadcast_from_host0,
            split_between_processes,
        )

        items = list(range(7))
        assert split_between_processes(items) == items  # 1 process
        arr = np.arange(6.0).reshape(2, 3)
        out = allgather_arrays(arr)
        assert out.shape == (1, 2, 3)
        np.testing.assert_allclose(out[0], arr)
        np.testing.assert_allclose(broadcast_from_host0(arr), arr)


class TestTPAttention:
    def test_sharded_heads_match_unsharded(self):
        from tpdm_tpu.ops.attention import attention_reference
        from tpdm_tpu.parallel.tp_attention import make_tp_attention
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(jax.devices()[:8], data=2, fsdp=2, tensor=2)
        b, h, n, d = 4, 4, 96, 16
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d))
        ref = attention_reference(q, k, v)

        fn = make_tp_attention(mesh, use_pallas=False)
        spec = P(("data", "fsdp"), "tensor", None, None)
        put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
        with mesh:
            out = jax.jit(fn)(put(q), put(k), put(v))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_pallas_interpret_under_shard_map(self):
        """The Pallas kernel itself runs per-shard under shard_map (CPU
        interpreter mode)."""
        import functools

        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpdm_tpu.ops.attention import attention_reference, flash_attention
        from tpdm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices()[:2], data=1, fsdp=1, tensor=2)
        b, h, n, d = 1, 4, 128, 16
        q = jax.random.normal(jax.random.PRNGKey(3), (b, h, n, d))
        ref = attention_reference(q, q, q)
        spec = P(None, "tensor", None, None)

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False,
        )
        def fn(q):
            return flash_attention(q, q, q, None, 128, True)  # interpret

        with mesh:
            out = jax.jit(fn)(jax.device_put(q, NamedSharding(mesh, spec)))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
