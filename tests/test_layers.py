"""Building-block parity tests against torch functional oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tpdm_tpu.models.layers import (
    AdaLayerNormContinuous,
    AdaLayerNormZero,
    FeedForward,
    GroupNorm,
    RMSNorm,
    get_2d_sincos_pos_embed,
    sinusoidal_timestep_embedding,
)


class TestSinusoid:
    def test_matches_diffusers_formula(self):
        """Oracle: the get_timestep_embedding math (flip_sin_to_cos, shift 0)."""
        t = torch.tensor([0.0, 1.0, 500.0, 999.0, 123.456])
        half = 128
        exponent = -torch.log(torch.tensor(10000.0)) * torch.arange(half) / half
        emb = t[:, None].float() * torch.exp(exponent)[None, :]
        ref = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        ref = torch.cat([ref[:, half:], ref[:, :half]], dim=-1)  # flip

        ours = sinusoidal_timestep_embedding(jnp.array(t.numpy()), 256)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)

    def test_continuous_timesteps(self):
        # sigma*1000 conditioning uses fractional timesteps; must be smooth.
        e1 = sinusoidal_timestep_embedding(jnp.array([500.0]), 256)
        e2 = sinusoidal_timestep_embedding(jnp.array([500.001]), 256)
        assert float(jnp.abs(e1 - e2).max()) < 1e-2


class TestPosEmbed:
    def test_shape_and_range(self):
        table = get_2d_sincos_pos_embed(64, 12, base_size=4)
        assert table.shape == (144, 64)
        assert np.abs(table).max() <= 1.0 + 1e-6

    def test_matches_diffusers_algorithm(self):
        """Oracle: inline numpy replication of diffusers' exact recipe."""
        embed_dim, grid_size, base_size = 32, 6, 4
        grid_h = np.arange(grid_size, dtype=np.float64) / (grid_size / base_size)
        grid = np.meshgrid(grid_h, grid_h)
        grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])

        def _1d(dim, pos):
            omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
            omega = 1.0 / 10000.0**omega
            out = np.einsum("m,d->md", pos.reshape(-1), omega)
            return np.concatenate([np.sin(out), np.cos(out)], axis=1)

        ref = np.concatenate(
            [_1d(embed_dim // 2, grid[0]), _1d(embed_dim // 2, grid[1])], axis=1
        )
        ours = get_2d_sincos_pos_embed(embed_dim, grid_size, base_size)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


class TestNorms:
    def test_groupnorm_matches_torch(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 8, 8, 12)).astype(np.float32)
        gn = GroupNorm(num_groups=1, num_channels=12)
        params = gn.init(jax.random.PRNGKey(0), jnp.array(x))
        scale = rng.normal(size=(12,)).astype(np.float32)
        bias = rng.normal(size=(12,)).astype(np.float32)
        params = {"params": {"scale": jnp.array(scale), "bias": jnp.array(bias)}}
        ours = gn.apply(params, jnp.array(x))

        xt = torch.tensor(x).permute(0, 3, 1, 2)  # NHWC -> NCHW
        ref = F.group_norm(
            xt, 1, torch.tensor(scale), torch.tensor(bias), eps=1e-6
        ).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_groupnorm_multi_group(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
        gn = GroupNorm(num_groups=4, num_channels=8)
        params = gn.init(jax.random.PRNGKey(0), jnp.array(x))
        ours = gn.apply(params, jnp.array(x))
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        ref = F.group_norm(xt, 4, torch.ones(8), torch.zeros(8), eps=1e-6)
        np.testing.assert_allclose(
            np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
        )

    def test_rmsnorm_matches_torch(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 3, 16)).astype(np.float32)
        m = RMSNorm(16)
        params = m.init(jax.random.PRNGKey(0), jnp.array(x))
        ours = m.apply(params, jnp.array(x))
        xt = torch.tensor(x)
        ref = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)


class TestAdaNorms:
    def test_adaln_zero_identity_at_zero_modulation(self):
        """With zero linear params, AdaLN-Zero reduces to plain LayerNorm."""
        dim = 16
        m = AdaLayerNormZero(dim)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, dim))
        emb = jax.random.normal(jax.random.PRNGKey(1), (2, dim))
        params = m.init(jax.random.PRNGKey(2), x, emb)
        zeroed = jax.tree.map(jnp.zeros_like, params)
        normed, g_msa, s_mlp, sc_mlp, g_mlp = m.apply(zeroed, x, emb)
        ref = F.layer_norm(torch.tensor(np.asarray(x)), (dim,), eps=1e-6)
        np.testing.assert_allclose(np.asarray(normed), ref.numpy(), rtol=1e-4, atol=1e-5)
        assert float(jnp.abs(g_msa).max()) == 0.0

    def test_adaln_zero_chunk_order(self):
        """shift is chunk 0, scale chunk 1, gate chunk 2 (diffusers order)."""
        dim = 4
        m = AdaLayerNormZero(dim)
        x = jnp.zeros((1, 2, dim))
        emb = jnp.ones((1, dim))
        params = m.init(jax.random.PRNGKey(0), x, emb)
        # Bias-only linear: bias = concat of 6 chunks with distinct values.
        bias = jnp.concatenate([jnp.full((dim,), float(i)) for i in range(6)])
        params = {
            "params": {
                "linear": {
                    "kernel": jnp.zeros((dim, 6 * dim)),
                    "bias": bias,
                }
            }
        }
        normed, g_msa, s_mlp, sc_mlp, g_mlp = m.apply(params, x, emb)
        # x==0 -> LN(x)==0 -> normed = 0*(1+scale)+shift = shift = 0.0
        np.testing.assert_allclose(np.asarray(normed), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_msa), 2.0)
        np.testing.assert_allclose(np.asarray(s_mlp), 3.0)
        np.testing.assert_allclose(np.asarray(sc_mlp), 4.0)
        np.testing.assert_allclose(np.asarray(g_mlp), 5.0)

    def test_adaln_continuous_chunk_order(self):
        """AdaLN-Continuous chunks (scale, shift) — opposite of AdaLN-Zero."""
        dim = 4
        m = AdaLayerNormContinuous(dim)
        x = jnp.zeros((1, 2, dim))
        cond = jnp.ones((1, dim))
        bias = jnp.concatenate([jnp.full((dim,), 9.0), jnp.full((dim,), 7.0)])
        params = {
            "params": {
                "linear": {"kernel": jnp.zeros((dim, 2 * dim)), "bias": bias}
            }
        }
        out = m.apply(params, x, cond)
        # x==0 -> LN==0 -> out = 0*(1+scale) + shift; shift must be 7 (2nd chunk)
        np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-6)


class TestFeedForward:
    def test_gelu_tanh_matches_torch(self):
        dim = 8
        m = FeedForward(dim)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, dim))
        params = m.init(jax.random.PRNGKey(1), x)
        ours = m.apply(params, x)

        w1 = np.asarray(params["params"]["proj_in"]["kernel"])
        b1 = np.asarray(params["params"]["proj_in"]["bias"])
        w2 = np.asarray(params["params"]["proj_out"]["kernel"])
        b2 = np.asarray(params["params"]["proj_out"]["bias"])
        xt = torch.tensor(np.asarray(x))
        h = F.gelu(xt @ torch.tensor(w1) + torch.tensor(b1), approximate="tanh")
        ref = h @ torch.tensor(w2) + torch.tensor(b2)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


class TestPosEmbedBeyondMax:
    """Grids past pos_embed_max_size (reference hard-caps at 96,
    transformer_sd3.py:93-95): the sincos table regenerates in-graph."""

    def test_jnp_generator_matches_numpy_table(self):
        from tpdm_tpu.models.layers import (
            get_2d_sincos_pos_embed,
            get_2d_sincos_pos_embed_jnp,
        )

        a = get_2d_sincos_pos_embed(32, 12, 8)
        b = np.asarray(get_2d_sincos_pos_embed_jnp(32, 12, 8))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_patch_embed_oversize_grid(self):
        from tpdm_tpu.models.layers import PatchEmbed

        pe = PatchEmbed(
            patch_size=2, embed_dim=32, pos_embed_max_size=6, base_size=4
        )
        small = jnp.ones((1, 4, 8, 8))  # grid 4 <= max 6
        params = pe.init(jax.random.PRNGKey(0), small)
        big = jnp.ones((1, 4, 16, 16))  # grid 8 > max 6
        out = pe.apply(params, big)
        assert out.shape == (1, 64, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_mmdit_forward_at_2x_geometry(self):
        """Toy MMDiT runs at double its configured sample size (the 2048px
        path for SD3-medium)."""
        from tpdm_tpu.models import MMDiT, MMDiTConfig

        cfg = MMDiTConfig.toy()
        model = MMDiT(cfg)
        n_txt = 5
        small = jnp.ones((1, cfg.in_channels, cfg.sample_size, cfg.sample_size))
        params = model.init(
            jax.random.PRNGKey(0),
            small,
            jnp.ones((1,)),
            jnp.ones((1, n_txt, cfg.joint_attention_dim)),
            jnp.ones((1, cfg.pooled_projection_dim)),
        )
        big = jnp.ones(
            (1, cfg.in_channels, 2 * cfg.sample_size, 2 * cfg.sample_size)
        )
        vel, temb, h1, h2 = model.apply(
            params,
            big,
            jnp.ones((1,)),
            jnp.ones((1, n_txt, cfg.joint_attention_dim)),
            jnp.ones((1, cfg.pooled_projection_dim)),
        )
        assert vel.shape == big.shape
        assert np.isfinite(np.asarray(vel)).all()
