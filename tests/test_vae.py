"""VAE tests: torch functional oracles for the blocks, shape/roundtrip checks."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tpdm_tpu.models.vae import (
    Decoder,
    Encoder,
    ResnetBlock,
    VAE,
    VAEAttention,
    VAEConfig,
)


class TestResnetBlock:
    def test_matches_torch_oracle(self):
        """diffusers ResnetBlock2D semantics via torch.nn.functional."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
        block = ResnetBlock(out_channels=12, groups=4)
        params = block.init(jax.random.PRNGKey(0), jnp.array(x))
        ours = block.apply(params, jnp.array(x))

        p = params["params"]
        xt = torch.tensor(x).permute(0, 3, 1, 2)

        def conv(h, name, k=3):
            w = torch.tensor(np.asarray(p[name]["kernel"])).permute(3, 2, 0, 1)
            b = torch.tensor(np.asarray(p[name]["bias"]))
            return F.conv2d(h, w, b, padding=(k - 1) // 2)

        def gn(h, name):
            return F.group_norm(
                h,
                4,
                torch.tensor(np.asarray(p[name]["scale"])),
                torch.tensor(np.asarray(p[name]["bias"])),
                eps=1e-6,
            )

        h = F.silu(gn(xt, "norm1"))
        h = conv(h, "conv1")
        h = F.silu(gn(h, "norm2"))
        h = conv(h, "conv2")
        short = conv(xt, "conv_shortcut", k=1)
        ref = (short + h).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-3, atol=1e-4)


class TestVAEAttention:
    def test_matches_torch_oracle(self):
        rng = np.random.default_rng(1)
        c = 8
        x = rng.normal(size=(1, 4, 4, c)).astype(np.float32)
        attn = VAEAttention(channels=c, groups=4)
        params = attn.init(jax.random.PRNGKey(0), jnp.array(x))
        ours = attn.apply(params, jnp.array(x))

        p = params["params"]
        xt = torch.tensor(x)
        h = F.group_norm(
            xt.permute(0, 3, 1, 2),
            4,
            torch.tensor(np.asarray(p["group_norm"]["scale"])),
            torch.tensor(np.asarray(p["group_norm"]["bias"])),
            eps=1e-6,
        ).permute(0, 2, 3, 1).reshape(1, 16, c)

        def lin(h, name):
            return h @ torch.tensor(np.asarray(p[name]["kernel"])) + torch.tensor(
                np.asarray(p[name]["bias"])
            )

        q, k, v = lin(h, "to_q"), lin(h, "to_k"), lin(h, "to_v")
        o = F.scaled_dot_product_attention(
            q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)
        ).squeeze(1)
        ref = xt + lin(o, "to_out").reshape(1, 4, 4, c)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-3, atol=1e-4)


class TestVAEEndToEnd:
    def test_decode_shapes_and_upsampling(self):
        cfg = VAEConfig.toy()
        vae = VAE(cfg)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.latent_channels, 4, 4))
        params = vae.init(jax.random.PRNGKey(1), z)
        img = vae.apply(params, z)
        # 2 blocks -> one upsample -> 2x spatial
        assert img.shape == (2, 3, 8, 8)
        assert np.isfinite(np.asarray(img)).all()

    def test_encode_shapes(self):
        cfg = VAEConfig.toy()
        vae = VAE(cfg)
        z = jnp.zeros((1, cfg.latent_channels, 4, 4))
        img = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 8, 8))
        params = vae.init(jax.random.PRNGKey(1), z, img)
        mean, logvar = vae.apply(params, img, method=VAE.encode)
        assert mean.shape == (1, cfg.latent_channels, 4, 4)
        assert logvar.shape == mean.shape

    def test_sd3_config_dims(self):
        cfg = VAEConfig.sd3()
        assert cfg.latent_channels == 16
        assert abs(cfg.scaling_factor - 1.5305) < 1e-6
        assert abs(cfg.shift_factor - 0.0609) < 1e-6


class TestVAEConverter:
    def test_fake_diffusers_state_dict_roundtrip(self):
        """Build a diffusers-layout state dict sized for the toy config,
        convert, and check the tree drives the model (shape-compatibility
        is the converter's contract; numerics are covered by block oracles)."""
        from tpdm_tpu.utils.convert import convert_vae

        cfg = VAEConfig.toy()
        vae = VAE(cfg)
        z = jnp.zeros((1, cfg.latent_channels, 4, 4))
        ref_params = vae.init(
            jax.random.PRNGKey(0), z, jnp.zeros((1, 3, 8, 8))
        )

        # synthesize torch-layout tensors from the flax shapes
        rng = np.random.default_rng(0)

        def fake_from(tree, path=""):
            sd = {}

            def walk(node, prefix):
                for k, v in node.items():
                    name = f"{prefix}.{k}" if prefix else k
                    if isinstance(v, dict):
                        walk(v, name)
                    else:
                        sd[name] = np.asarray(v)

            walk(tree, path)
            return sd

        flax_flat = fake_from(ref_params["params"])
        sd = {}
        for k, v in flax_flat.items():
            vals = rng.normal(size=v.shape).astype(np.float32)
            # map flax naming back to diffusers naming
            name = (
                k.replace("up_blocks_", "up_blocks.")
                .replace("down_blocks_", "down_blocks.")
                .replace("_resnets_", ".resnets.")
                .replace("_upsamplers_0", ".upsamplers.0.conv")
                .replace("_downsamplers_0", ".downsamplers.0.conv")
                .replace("resnets_0", "resnets.0")
                .replace("resnets_1", "resnets.1")
                .replace("attentions_0", "attentions.0")
                .replace("to_out", "to_out.0")
            )
            if name.endswith(".kernel"):
                base = name[: -len(".kernel")]
                if vals.ndim == 4:
                    sd[base + ".weight"] = vals.transpose(3, 2, 0, 1)
                else:
                    sd[base + ".weight"] = vals.T
            elif name.endswith(".scale"):
                sd[name[: -len(".scale")] + ".weight"] = vals
            else:
                sd[name.replace(".bias", "") + ".bias"] = vals
        converted = convert_vae(
            sd,
            block_out_channels=cfg.block_out_channels,
            layers_per_block=cfg.layers_per_block,
        )
        # same treedef and shapes as a fresh init
        ref_shapes = jax.tree.map(lambda a: a.shape, ref_params)
        conv_shapes = jax.tree.map(lambda a: a.shape, converted)
        assert ref_shapes == conv_shapes
        out = vae.apply(converted, z)
        assert np.isfinite(np.asarray(out)).all()


class TestFastDecode:
    """The bf16+fp32-GN decode fast path (models/vae.py make_fast_decode) —
    ONE code path for bench.py and the training reward decode (round-2
    VERDICT item 3)."""

    def _toy(self):
        from tpdm_tpu.models.vae import VAE, VAEConfig

        cfg = VAEConfig.toy()
        vae = VAE(cfg)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.latent_channels, 8, 8))
        params = vae.init(
            jax.random.PRNGKey(1), z, jnp.zeros((1, 3, 16, 16))
        )
        return vae, cfg, params, z

    def test_matches_fp32_decode(self):
        from tpdm_tpu.models.vae import make_fast_decode

        vae, cfg, params, z = self._toy()
        ref = vae.apply(
            params, z / cfg.scaling_factor + cfg.shift_factor, method="decode"
        )
        fast, bparams = make_fast_decode(vae, params)
        out = fast(bparams, z)
        assert out.dtype == jnp.float32
        assert jax.tree.leaves(bparams)[0].dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), atol=0.08, rtol=0.1
        )

    def test_reward_builder_routes_through_fast_decode(self, tmp_path, monkeypatch):
        """build_image_reward_fn must use models.vae.make_fast_decode — the
        exact decode configuration bench.py measures."""
        from types import SimpleNamespace

        import tpdm_tpu.models.vae as vae_mod
        from tpdm_tpu.rewards.bert import BertMedConfig
        from tpdm_tpu.rewards.image_reward import ImageRewardModel
        from tpdm_tpu.rewards.vit import ViTConfig
        from tpdm_tpu.train.builders import build_image_reward_fn

        calls = []
        orig = vae_mod.make_fast_decode

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(vae_mod, "make_fast_decode", spy)

        vae, cfg, params, z = self._toy()
        vocab = tmp_path / "vocab.txt"
        toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "photo",
                "of", "cat"]
        toks += [chr(c) for c in range(ord("a"), ord("z") + 1)]
        vocab.write_text("\n".join(toks) + "\n", encoding="utf-8")

        reward_fn = build_image_reward_fn(
            tokenizer_path=str(vocab),
            vae_config="toy",
            vae_params=params,
            reward_model=ImageRewardModel.create(
                vit_config=ViTConfig.toy(),
                bert_config=BertMedConfig.toy(
                    vocab_size=64, max_position_embeddings=40
                ),
            ),
        )
        assert calls, "reward decode did not route through make_fast_decode"

        outputs = SimpleNamespace(final_latents=z)
        scores, last = reward_fn(["a photo of cat", "a cat"], outputs)
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()

    def test_bench_source_uses_shared_decode(self):
        """bench.py must not hand-roll its own decode configuration."""
        import os

        src = open(
            os.path.join(os.path.dirname(__file__), "..", "bench.py"),
            encoding="utf-8",
        ).read()
        assert "make_fast_decode" in src
        assert 'method="decode"' not in src
