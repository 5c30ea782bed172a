"""MMDiT structural and behavioral tests on a toy config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdm_tpu.models.mmdit import MMDiT, MMDiTConfig


@pytest.fixture(scope="module")
def toy():
    cfg = MMDiTConfig.toy()
    model = MMDiT(cfg)
    b, n_txt = 2, 11
    latents = jax.random.normal(
        jax.random.PRNGKey(0), (b, cfg.in_channels, cfg.sample_size, cfg.sample_size)
    )
    timestep = jnp.array([1000.0, 400.0])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, n_txt, cfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.pooled_projection_dim))
    params = model.init(jax.random.PRNGKey(3), latents, timestep, ctx, pooled)
    return cfg, model, params, (latents, timestep, ctx, pooled)


class TestForward:
    def test_output_shapes(self, toy):
        cfg, model, params, args = toy
        latents, timestep, ctx, pooled = args
        vel, temb, h1, h2 = model.apply(params, *args)
        b = latents.shape[0]
        n_img = (cfg.sample_size // cfg.patch_size) ** 2
        assert vel.shape == latents.shape
        assert temb.shape == (b, cfg.inner_dim)
        assert h1.shape == (b, n_img, cfg.inner_dim)
        assert h2.shape == (b, n_img, cfg.inner_dim)

    def test_finite_and_deterministic(self, toy):
        _, model, params, args = toy
        out1 = model.apply(params, *args)
        out2 = jax.jit(model.apply)(params, *args)
        for a, b in zip(out1, out2):
            assert np.isfinite(np.asarray(a)).all()
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_timestep_changes_output(self, toy):
        _, model, params, (latents, _, ctx, pooled) = toy
        v1, *_ = model.apply(params, latents, jnp.array([1000.0, 1000.0]), ctx, pooled)
        v2, *_ = model.apply(params, latents, jnp.array([10.0, 10.0]), ctx, pooled)
        assert float(jnp.abs(v1 - v2).mean()) > 1e-4

    def test_batch_independence(self, toy):
        """Sample 0's output must not depend on sample 1's inputs."""
        _, model, params, (latents, timestep, ctx, pooled) = toy
        v_full, *_ = model.apply(params, latents, timestep, ctx, pooled)
        perturbed = latents.at[1].set(latents[1] * 2.0 + 1.0)
        v_pert, *_ = model.apply(params, perturbed, timestep, ctx, pooled)
        np.testing.assert_allclose(
            np.asarray(v_full[0]), np.asarray(v_pert[0]), rtol=1e-5, atol=1e-6
        )
        assert float(jnp.abs(v_full[1] - v_pert[1]).mean()) > 1e-4

    def test_h1_is_pre_block_activation(self, toy):
        """h1 must not depend on the text context (it's post-PatchEmbed)."""
        _, model, params, (latents, timestep, ctx, pooled) = toy
        _, _, h1a, _ = model.apply(params, latents, timestep, ctx, pooled)
        _, _, h1b, _ = model.apply(params, latents, timestep, ctx * 3.0, pooled)
        np.testing.assert_allclose(np.asarray(h1a), np.asarray(h1b), rtol=1e-6)

    def test_remat_matches(self, toy):
        cfg, _, params, args = toy
        base = MMDiT(cfg).apply(params, *args)
        remat = MMDiT(cfg, remat=True).apply(params, *args)
        for a, b in zip(base, remat):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


class TestVariants:
    def test_sd35_style_dual_attention_and_qk_norm(self):
        cfg = MMDiTConfig.toy(dual_attention_layers=(0,), qk_norm="rms_norm")
        model = MMDiT(cfg)
        b = 1
        latents = jnp.ones((b, cfg.in_channels, cfg.sample_size, cfg.sample_size))
        ctx = jnp.ones((b, 7, cfg.joint_attention_dim))
        pooled = jnp.ones((b, cfg.pooled_projection_dim))
        params = model.init(
            jax.random.PRNGKey(0), latents, jnp.array([500.0]), ctx, pooled
        )
        # dual-attention layer 0 must own an attn2 and a 9-chunk norm1
        p0 = params["params"]["transformer_blocks_0"]
        assert "attn2" in p0
        assert p0["norm1"]["linear"]["kernel"].shape[-1] == 9 * cfg.inner_dim
        assert "norm_q" in p0["attn"]
        vel, *_ = model.apply(params, latents, jnp.array([500.0]), ctx, pooled)
        assert np.isfinite(np.asarray(vel)).all()

    def test_last_block_has_no_context_outputs(self, toy):
        cfg, _, params, _ = toy
        last = params["params"][f"transformer_blocks_{cfg.num_layers - 1}"]
        assert "to_add_out" not in last["attn"]
        assert "ff_context" not in last
        # but it still projects context q/k/v
        assert "add_q_proj" in last["attn"]

    def test_param_count_sd3_medium_scale(self):
        """SD3-medium MMDiT is ~2.03B params; sanity-check our construction
        by counting analytically (no giant init on CPU)."""
        cfg = MMDiTConfig.sd3_medium()
        d = cfg.inner_dim
        per_block = (
            6 * d * (d + 1)  # AdaLN hidden
            + 6 * d * (d + 1)  # AdaLN ctx
            + 8 * d * (d + 1)  # qkv+out both streams (8 dense of dxd)
            + 2 * (d * 4 * d + 4 * d + 4 * d * d + d)  # 2 FFs
        )
        last_block = (
            6 * d * (d + 1)
            + 2 * d * (d + 1)  # ctx AdaLN-continuous
            + 7 * d * (d + 1)  # qkv both + out_img only
            + (d * 4 * d + 4 * d + 4 * d * d + d)  # 1 FF
        )
        total = 23 * per_block + last_block
        # embeddings & head
        total += (2 * 2 * 16 + 1) * d  # patch proj (p*p*c+1)*d
        total += (256 + 1) * d + (d + 1) * d  # timestep mlp
        total += (2048 + 1) * d + (d + 1) * d  # pooled mlp
        total += (4096 + 1) * d  # context embedder
        total += (d + 1) * 2 * d  # norm_out
        total += (d + 1) * 64  # proj_out
        assert 1.9e9 < total < 2.2e9, total


class TestQuantizedMatmuls:
    def test_int8_close_to_bf16(self):
        """W8A8-dynamic output stays close to the fp path on a toy model."""
        import dataclasses

        cfg = MMDiTConfig.toy()
        qcfg = dataclasses.replace(cfg, quant_matmuls=True)
        model = MMDiT(cfg)
        qmodel = MMDiT(qcfg)
        b = 1
        lat = jax.random.normal(jax.random.PRNGKey(0), (b, 16, 8, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 5, cfg.joint_attention_dim))
        pooled = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.pooled_projection_dim))
        t = jnp.array([500.0])
        params = qmodel.init(jax.random.PRNGKey(3), lat, t, ctx, pooled)
        # same weights drive both (fp model ignores the extra kernel_scale;
        # the quant model derives int8 in-graph from the fp kernels)
        v_fp, *_ = model.apply(params, lat, t, ctx, pooled)
        v_q, *_ = qmodel.apply(params, lat, t, ctx, pooled)
        err = float(jnp.abs(v_fp - v_q).mean()) / (float(jnp.abs(v_fp).mean()) + 1e-9)
        assert err < 0.15, f"relative int8 deviation too large: {err}"
        assert err > 0.0  # it genuinely took the quantized path

    def test_quant_dense_unit(self):
        from tpdm_tpu.ops.quant import DenseMaybeQuant, int8_dynamic_matmul, quantize_weight

        x = jax.random.normal(jax.random.PRNGKey(0), (7, 33))
        k = jax.random.normal(jax.random.PRNGKey(1), (33, 17)) * 0.2
        b = jax.random.normal(jax.random.PRNGKey(2), (17,))
        ref = x @ k + b
        out = int8_dynamic_matmul(x, quantize_weight(k, b))
        rel = float(jnp.abs(out - ref).mean() / jnp.abs(ref).mean())
        assert rel < 0.03, rel


class TestPrequantizedParams:
    def test_prequantized_matches_ingraph_quant(self):
        import dataclasses

        from tpdm_tpu.ops.quant import prequantize_params

        qcfg = dataclasses.replace(MMDiTConfig.toy(), quant_matmuls=True)
        qmodel = MMDiT(qcfg)
        b = 1
        lat = jax.random.normal(jax.random.PRNGKey(0), (b, 16, 8, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 5, qcfg.joint_attention_dim))
        pooled = jax.random.normal(jax.random.PRNGKey(2), (b, qcfg.pooled_projection_dim))
        t = jnp.array([500.0])
        params = qmodel.init(jax.random.PRNGKey(3), lat, t, ctx, pooled)
        # quantizable modules carry a kernel_scale
        assert "kernel_scale" in params["params"]["transformer_blocks_0"]["attn"]["to_q"]

        v_ingraph, *_ = qmodel.apply(params, lat, t, ctx, pooled)
        qparams = prequantize_params(params)
        assert (
            qparams["params"]["transformer_blocks_0"]["attn"]["to_q"]["kernel"].dtype
            == jnp.int8
        )
        v_pre, *_ = qmodel.apply(qparams, lat, t, ctx, pooled)
        np.testing.assert_allclose(
            np.asarray(v_pre), np.asarray(v_ingraph), rtol=2e-3, atol=2e-3
        )


class TestFitQuantParams:
    """Fitting CONVERTED (scale-less float) checkpoints into a
    quant_matmuls=True model: the serve.py --int8 pretrained path."""

    def test_converted_tree_fits_and_matches_ingraph(self):
        import dataclasses

        from tpdm_tpu.ops.quant import fit_quant_params, prequantize_params

        cfg = MMDiTConfig.toy()
        qcfg = dataclasses.replace(cfg, quant_matmuls=True)
        model, qmodel = MMDiT(cfg), MMDiT(qcfg)
        b = 1
        lat = jax.random.normal(jax.random.PRNGKey(0), (b, 16, 8, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 5, cfg.joint_attention_dim))
        pooled = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.pooled_projection_dim))
        t = jnp.array([500.0])
        # a float-model init has NO kernel_scale leaves — exactly the
        # structure the checkpoint converters produce
        converted = model.init(jax.random.PRNGKey(3), lat, t, ctx, pooled)
        expected = jax.eval_shape(
            qmodel.init, jax.random.PRNGKey(3), lat, t, ctx, pooled
        )
        fitted = prequantize_params(fit_quant_params(converted, expected))
        assert (
            fitted["params"]["transformer_blocks_0"]["attn"]["to_q"]["kernel"].dtype
            == jnp.int8
        )
        v_fp, *_ = model.apply(converted, lat, t, ctx, pooled)
        v_q, *_ = qmodel.apply(fitted, lat, t, ctx, pooled)
        err = float(jnp.abs(v_fp - v_q).mean()) / (float(jnp.abs(v_fp).mean()) + 1e-9)
        assert 0.0 < err < 0.15, err

    def test_missing_param_fails_loudly(self):
        import dataclasses

        import pytest

        from tpdm_tpu.ops.quant import fit_quant_params

        qcfg = dataclasses.replace(MMDiTConfig.toy(), quant_matmuls=True)
        qmodel = MMDiT(qcfg)
        lat = jnp.zeros((1, 16, 8, 8))
        ctx = jnp.zeros((1, 5, qcfg.joint_attention_dim))
        pooled = jnp.zeros((1, qcfg.pooled_projection_dim))
        expected = jax.eval_shape(
            qmodel.init, jax.random.PRNGKey(0), lat, jnp.array([1.0]), ctx, pooled
        )
        with pytest.raises(ValueError, match="missing param"):
            fit_quant_params({"params": {}}, expected)
