"""Reward-model components vs torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tpdm_tpu.rewards.bert import BertMedConfig, BertMedModel
from tpdm_tpu.rewards.image_reward import (
    IR_MEAN,
    IR_STD,
    ImageRewardModel,
    ImageRewardNet,
    convert_image_reward,
)
from tpdm_tpu.rewards.vit import ViT, ViTConfig


class TestViTParityWithHF:
    def test_matches_transformers_vit(self):
        """Oracle: transformers ViTModel (same architecture, split qkv)."""
        from transformers import ViTConfig as HFViTConfig, ViTModel

        hf_cfg = HFViTConfig(
            hidden_size=24,
            num_hidden_layers=2,
            num_attention_heads=3,
            intermediate_size=96,
            image_size=16,
            patch_size=8,
            layer_norm_eps=1e-6,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        torch.manual_seed(0)
        hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()
        sd = hf.state_dict()

        cfg = ViTConfig.toy()
        ours = ViT(cfg)

        def t(k):
            return sd[k].numpy()

        params = {
            "cls_token": t("embeddings.cls_token"),
            "pos_embed": t("embeddings.position_embeddings"),
            "patch_embed": {
                "kernel": t("embeddings.patch_embeddings.projection.weight").transpose(2, 3, 1, 0),
                "bias": t("embeddings.patch_embeddings.projection.bias"),
            },
            "norm": {"scale": t("layernorm.weight"), "bias": t("layernorm.bias")},
        }
        for i in range(2):
            b = f"encoder.layer.{i}"
            qkv_w = np.concatenate(
                [
                    t(f"{b}.attention.attention.query.weight"),
                    t(f"{b}.attention.attention.key.weight"),
                    t(f"{b}.attention.attention.value.weight"),
                ],
                axis=0,
            ).T
            qkv_b = np.concatenate(
                [
                    t(f"{b}.attention.attention.query.bias"),
                    t(f"{b}.attention.attention.key.bias"),
                    t(f"{b}.attention.attention.value.bias"),
                ]
            )
            params[f"blocks_{i}"] = {
                "norm1": {
                    "scale": t(f"{b}.layernorm_before.weight"),
                    "bias": t(f"{b}.layernorm_before.bias"),
                },
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "proj": {
                    "kernel": t(f"{b}.attention.output.dense.weight").T,
                    "bias": t(f"{b}.attention.output.dense.bias"),
                },
                "norm2": {
                    "scale": t(f"{b}.layernorm_after.weight"),
                    "bias": t(f"{b}.layernorm_after.bias"),
                },
                "fc1": {
                    "kernel": t(f"{b}.intermediate.dense.weight").T,
                    "bias": t(f"{b}.intermediate.dense.bias"),
                },
                "fc2": {
                    "kernel": t(f"{b}.output.dense.weight").T,
                    "bias": t(f"{b}.output.dense.bias"),
                },
            }

        pixels = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)
        out = ours.apply({"params": params}, jnp.array(pixels))
        with torch.no_grad():
            ref = hf(torch.tensor(pixels)).last_hidden_state
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-3, atol=1e-4)


class TestBertMedLayer:
    def test_matches_torch_functional_oracle(self):
        """One med layer: self-attn + cross-attn + MLP with post-norm."""
        cfg = BertMedConfig.toy()
        model = BertMedModel(cfg)
        rng = np.random.default_rng(1)
        ids = np.array([[4, 7, 9, 1], [3, 2, 1, 0]], np.int32)
        img = rng.normal(size=(2, 5, cfg.encoder_width)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.array(ids), None, jnp.array(img))
        ours = model.apply(params, jnp.array(ids), None, jnp.array(img))

        p = params["params"]

        def lin(x, tree):
            return x @ torch.tensor(np.asarray(tree["kernel"])) + torch.tensor(
                np.asarray(tree["bias"])
            )

        def ln(x, tree):
            return F.layer_norm(
                x,
                (x.shape[-1],),
                torch.tensor(np.asarray(tree["scale"])),
                torch.tensor(np.asarray(tree["bias"])),
                eps=1e-12,
            )

        def mha(q_in, kv_in, tree, heads):
            q, k, v = (
                lin(q_in, tree["query"]),
                lin(kv_in, tree["key"]),
                lin(kv_in, tree["value"]),
            )
            b, n, d = q.shape
            m = k.shape[1]
            hd = d // heads
            q = q.view(b, n, heads, hd).transpose(1, 2)
            k = k.view(b, m, heads, hd).transpose(1, 2)
            v = v.view(b, m, heads, hd).transpose(1, 2)
            o = F.scaled_dot_product_attention(q, k, v)
            return o.transpose(1, 2).reshape(b, n, d)

        emb = torch.tensor(np.asarray(p["word_embeddings"]["embedding"]))[
            torch.tensor(ids, dtype=torch.long)
        ]
        emb = emb + torch.tensor(np.asarray(p["position_embeddings"]))[: ids.shape[1]]
        x = ln(emb, p["embeddings_ln"])
        imgt = torch.tensor(img)
        for i in range(cfg.num_hidden_layers):
            lp = p[f"layer_{i}"]
            att = mha(x, x, lp["attention_self"], cfg.num_attention_heads)
            x = ln(x + lin(att, lp["attention_output"]), lp["attention_ln"])
            cross = mha(x, imgt, lp["cross_self"], cfg.num_attention_heads)
            x = ln(x + lin(cross, lp["cross_output"]), lp["cross_ln"])
            y = lin(x, lp["intermediate"])
            y = F.gelu(y)
            x = ln(x + lin(y, lp["output"]), lp["output_ln"])

        np.testing.assert_allclose(np.asarray(ours), x.numpy(), rtol=1e-3, atol=1e-4)


class TestImageReward:
    def test_end_to_end_toy(self):
        model = ImageRewardModel.create(
            vit_config=ViTConfig.toy(),
            bert_config=BertMedConfig.toy(),
        )
        images = np.random.default_rng(0).integers(
            0, 255, size=(2, 20, 24, 3), dtype=np.uint8
        )
        ids = np.array([[1, 4, 6], [2, 5, 0]], np.int32)
        scores = model.score(ids, images)
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()

    def test_normalization_constants(self):
        assert abs(IR_MEAN - 0.16717362830052426) < 1e-12
        assert abs(IR_STD - 1.0333394966054072) < 1e-12

    def test_inference_rank(self):
        """List-ranking parity (ImageReward.inference_rank, :144-183):
        1-based ranks in original candidate order, rewards normalized
        WITHOUT the +3 sigma shift the scalar score applies."""
        model = ImageRewardModel.create(
            vit_config=ViTConfig.toy(),
            bert_config=BertMedConfig.toy(),
        )
        k = 4
        images = np.random.default_rng(1).integers(
            0, 255, size=(k, 20, 24, 3), dtype=np.uint8
        )
        prompt_ids = np.array([1, 4, 6], np.int32)
        ranking, rewards = model.inference_rank(prompt_ids, images)
        assert sorted(ranking) == [1, 2, 3, 4]
        # rank 1 = highest reward, consistent through the whole order
        order = np.argsort(-np.asarray(rewards))
        assert [ranking[i] for i in order] == [1, 2, 3, 4]
        # same forward as score(), minus the +3 sigma reporting shift
        scores = model.score(
            np.repeat(prompt_ids[None], k, axis=0), images
        )
        np.testing.assert_allclose(
            np.asarray(rewards), scores - 3 * IR_STD, rtol=1e-5, atol=1e-5
        )

    def test_converter_on_synthetic_blip_state_dict(self):
        vit_cfg = ViTConfig.toy()
        bert_cfg = BertMedConfig.toy()
        net = ImageRewardNet(vit_cfg, bert_cfg)
        ref = net.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 3, vit_cfg.image_size, vit_cfg.image_size)),
            jnp.zeros((1, 4), jnp.int32),
        )
        rng = np.random.default_rng(2)

        # synthesize the torch-layout checkpoint from ref shapes
        sd = {}
        v = ref["params"]["visual_encoder"]
        sd["blip.visual_encoder.cls_token"] = rng.normal(size=np.asarray(v["cls_token"]).shape)
        sd["blip.visual_encoder.pos_embed"] = rng.normal(size=np.asarray(v["pos_embed"]).shape)
        k = np.asarray(v["patch_embed"]["kernel"])
        sd["blip.visual_encoder.patch_embed.proj.weight"] = rng.normal(size=k.shape).transpose(3, 2, 0, 1)
        sd["blip.visual_encoder.patch_embed.proj.bias"] = rng.normal(size=k.shape[-1])
        sd["blip.visual_encoder.norm.weight"] = rng.normal(size=vit_cfg.embed_dim)
        sd["blip.visual_encoder.norm.bias"] = rng.normal(size=vit_cfg.embed_dim)
        for i in range(vit_cfg.depth):
            b = f"blip.visual_encoder.blocks.{i}"
            d = vit_cfg.embed_dim
            for nm, shp in (
                ("norm1", d), ("norm2", d),
            ):
                sd[f"{b}.{nm}.weight"] = rng.normal(size=shp)
                sd[f"{b}.{nm}.bias"] = rng.normal(size=shp)
            sd[f"{b}.attn.qkv.weight"] = rng.normal(size=(3 * d, d))
            sd[f"{b}.attn.qkv.bias"] = rng.normal(size=3 * d)
            sd[f"{b}.attn.proj.weight"] = rng.normal(size=(d, d))
            sd[f"{b}.attn.proj.bias"] = rng.normal(size=d)
            inner = int(d * vit_cfg.mlp_ratio)
            sd[f"{b}.mlp.fc1.weight"] = rng.normal(size=(inner, d))
            sd[f"{b}.mlp.fc1.bias"] = rng.normal(size=inner)
            sd[f"{b}.mlp.fc2.weight"] = rng.normal(size=(d, inner))
            sd[f"{b}.mlp.fc2.bias"] = rng.normal(size=d)

        h = bert_cfg.hidden_size
        eb = "blip.text_encoder.embeddings"
        sd[f"{eb}.word_embeddings.weight"] = rng.normal(size=(bert_cfg.vocab_size, h))
        sd[f"{eb}.position_embeddings.weight"] = rng.normal(size=(bert_cfg.max_position_embeddings, h))
        sd[f"{eb}.LayerNorm.weight"] = rng.normal(size=h)
        sd[f"{eb}.LayerNorm.bias"] = rng.normal(size=h)
        for i in range(bert_cfg.num_hidden_layers):
            b = f"blip.text_encoder.encoder.layer.{i}"
            for blkname, kvw in (("attention", h), ("crossattention", bert_cfg.encoder_width)):
                sd[f"{b}.{blkname}.self.query.weight"] = rng.normal(size=(h, h))
                sd[f"{b}.{blkname}.self.query.bias"] = rng.normal(size=h)
                sd[f"{b}.{blkname}.self.key.weight"] = rng.normal(size=(h, kvw))
                sd[f"{b}.{blkname}.self.key.bias"] = rng.normal(size=h)
                sd[f"{b}.{blkname}.self.value.weight"] = rng.normal(size=(h, kvw))
                sd[f"{b}.{blkname}.self.value.bias"] = rng.normal(size=h)
                sd[f"{b}.{blkname}.output.dense.weight"] = rng.normal(size=(h, h))
                sd[f"{b}.{blkname}.output.dense.bias"] = rng.normal(size=h)
                sd[f"{b}.{blkname}.output.LayerNorm.weight"] = rng.normal(size=h)
                sd[f"{b}.{blkname}.output.LayerNorm.bias"] = rng.normal(size=h)
            sd[f"{b}.intermediate.dense.weight"] = rng.normal(size=(bert_cfg.intermediate_size, h))
            sd[f"{b}.intermediate.dense.bias"] = rng.normal(size=bert_cfg.intermediate_size)
            sd[f"{b}.output.dense.weight"] = rng.normal(size=(h, bert_cfg.intermediate_size))
            sd[f"{b}.output.dense.bias"] = rng.normal(size=h)
            sd[f"{b}.output.LayerNorm.weight"] = rng.normal(size=h)
            sd[f"{b}.output.LayerNorm.bias"] = rng.normal(size=h)

        dims = [(1024, 768), (128, 1024), (64, 128), (16, 64), (1, 16)]
        # toy: head input is bert hidden size
        dims = [(1024, h), (128, 1024), (64, 128), (16, 64), (1, 16)]
        for idx, (o, ii) in zip((0, 2, 4, 6, 7), dims):
            sd[f"mlp.layers.{idx}.weight"] = rng.normal(size=(o, ii))
            sd[f"mlp.layers.{idx}.bias"] = rng.normal(size=o)

        sd = {k: v.astype(np.float32) for k, v in sd.items()}
        converted = convert_image_reward(
            sd, vit_depth=vit_cfg.depth, bert_layers=bert_cfg.num_hidden_layers
        )
        ref_shapes = jax.tree.map(lambda a: np.asarray(a).shape, ref)
        conv_shapes = jax.tree.map(lambda a: np.asarray(a).shape, converted)
        assert ref_shapes == conv_shapes
        out = net.apply(
            converted,
            jnp.zeros((1, 3, vit_cfg.image_size, vit_cfg.image_size)),
            jnp.zeros((1, 4), jnp.int32),
        )
        assert np.isfinite(np.asarray(out)).all()


class TestPreprocessing:
    def test_resize_center_crop_geometry(self):
        """torchvision isn't installed; check the Resize(short side)+
        CenterCrop geometry directly: square input == plain PIL resize, and
        non-square input crops the center of the resized long side."""
        from PIL import Image

        from tpdm_tpu.utils.image import bicubic_resize_center_crop

        rng = np.random.default_rng(0)
        sq = rng.integers(0, 255, size=(1, 32, 32, 3), dtype=np.uint8)
        ours = bicubic_resize_center_crop(sq, 16)[0]
        ref = np.asarray(Image.fromarray(sq[0]).resize((16, 16), Image.BICUBIC))
        np.testing.assert_array_equal(ours, ref)

        wide = rng.integers(0, 255, size=(1, 20, 60, 3), dtype=np.uint8)
        out = bicubic_resize_center_crop(wide, 16)[0]
        assert out.shape == (16, 16, 3)
        # center crop of the 48-wide resize: columns [16, 32)
        full = np.asarray(Image.fromarray(wide[0]).resize((48, 16), Image.BICUBIC))
        np.testing.assert_array_equal(out, full[:, 16:32])


class TestCLIPVisionParity:
    def test_matches_transformers(self):
        from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModelWithProjection

        hf_cfg = HFCfg(
            hidden_size=24,
            intermediate_size=48,
            num_hidden_layers=2,
            num_attention_heads=3,
            image_size=16,
            patch_size=8,
            projection_dim=20,
            hidden_act="quick_gelu",
        )
        torch.manual_seed(0)
        hf = CLIPVisionModelWithProjection(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}

        from tpdm_tpu.rewards.clip_vision import CLIPVisionConfig, CLIPVisionModel

        cfg = CLIPVisionConfig.toy()
        ours = CLIPVisionModel(cfg)

        pre = "vision_model."
        params = {
            "class_embedding": sd[pre + "embeddings.class_embedding"],
            "position_embedding": sd[pre + "embeddings.position_embedding.weight"],
            "patch_embedding": {
                "kernel": sd[pre + "embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
            },
            "pre_layrnorm": {
                "scale": sd[pre + "pre_layrnorm.weight"],
                "bias": sd[pre + "pre_layrnorm.bias"],
            },
            "post_layernorm": {
                "scale": sd[pre + "post_layernorm.weight"],
                "bias": sd[pre + "post_layernorm.bias"],
            },
            "visual_projection": {"kernel": sd["visual_projection.weight"].T},
        }
        for i in range(2):
            b = pre + f"encoder.layers.{i}."
            params[f"layers_{i}"] = {
                **{
                    nm: {"kernel": sd[b + f"self_attn.{nm}.weight"].T, "bias": sd[b + f"self_attn.{nm}.bias"]}
                    for nm in ("q_proj", "k_proj", "v_proj", "out_proj")
                },
                "layer_norm1": {"scale": sd[b + "layer_norm1.weight"], "bias": sd[b + "layer_norm1.bias"]},
                "layer_norm2": {"scale": sd[b + "layer_norm2.weight"], "bias": sd[b + "layer_norm2.bias"]},
                "fc1": {"kernel": sd[b + "mlp.fc1.weight"].T, "bias": sd[b + "mlp.fc1.bias"]},
                "fc2": {"kernel": sd[b + "mlp.fc2.weight"].T, "bias": sd[b + "mlp.fc2.bias"]},
            }

        pixels = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)
        _, _, proj = ours.apply({"params": params}, jnp.array(pixels))
        with torch.no_grad():
            ref = hf(torch.tensor(pixels)).image_embeds
        np.testing.assert_allclose(np.asarray(proj), ref.numpy(), rtol=1e-3, atol=1e-4)


class TestScorers:
    def test_clip_score_protocol(self):
        from tpdm_tpu.rewards.clip_vision import CLIPVisionConfig
        from tpdm_tpu.rewards.scorers import CLIPScoreModel
        from tpdm_tpu.models.clip_text import CLIPTextConfig

        m = CLIPScoreModel.create(
            vision_cfg=CLIPVisionConfig.toy(), text_cfg=CLIPTextConfig.toy(projection_dim=20)
        )
        imgs = np.random.default_rng(0).integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
        ids = np.array([[97, 1, 98, 0, 0], [97, 2, 98, 0, 0]], np.int32)
        s = m.score(ids, imgs)
        assert s.shape == (2,) and np.isfinite(s).all()

    def test_aesthetic_score_text_free(self):
        from tpdm_tpu.rewards.clip_vision import CLIPVisionConfig
        from tpdm_tpu.rewards.scorers import AestheticScoreModel

        m = AestheticScoreModel.create(vision_cfg=CLIPVisionConfig.toy())
        imgs = np.random.default_rng(1).integers(0, 255, (3, 18, 18, 3), dtype=np.uint8)
        s = m.score(None, imgs)
        assert s.shape == (3,) and np.isfinite(s).all()

    def test_load_score_dispatch(self):
        from tpdm_tpu.rewards.scorers import load_score
        from tpdm_tpu.rewards.clip_vision import CLIPVisionConfig

        m = load_score("aesthetic", vision_cfg=CLIPVisionConfig.toy())
        assert m.__class__.__name__ == "AestheticScoreModel"
        import pytest as _pytest

        with _pytest.raises(ValueError):
            load_score("nope")


class TestSiglipParity:
    def test_matches_transformers_siglip(self):
        from transformers import SiglipVisionConfig as HFCfg, SiglipVisionModel as HFModel

        hf_cfg = HFCfg(
            hidden_size=24,
            intermediate_size=48,
            num_hidden_layers=2,
            num_attention_heads=3,
            image_size=28,
            patch_size=14,
            attention_dropout=0.0,
        )
        torch.manual_seed(0)
        hf = HFModel(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}

        from tpdm_tpu.rewards.siglip import SiglipVisionConfig, SiglipVisionModel

        cfg = SiglipVisionConfig.toy()
        ours = SiglipVisionModel(cfg)

        pre = "vision_model."
        def d(k):
            return {"kernel": sd[k + ".weight"].T, "bias": sd[k + ".bias"]}
        def l(k):
            return {"scale": sd[k + ".weight"], "bias": sd[k + ".bias"]}

        params = {
            "patch_embedding": {
                "kernel": sd[pre + "embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0),
                "bias": sd[pre + "embeddings.patch_embedding.bias"],
            },
            "position_embedding": sd[pre + "embeddings.position_embedding.weight"],
            "post_layernorm": l(pre + "post_layernorm"),
            "probe": sd[pre + "head.probe"],
            "map_q": {
                "kernel": sd[pre + "head.attention.in_proj_weight"][:24].T,
                "bias": sd[pre + "head.attention.in_proj_bias"][:24],
            },
            "map_k": {
                "kernel": sd[pre + "head.attention.in_proj_weight"][24:48].T,
                "bias": sd[pre + "head.attention.in_proj_bias"][24:48],
            },
            "map_v": {
                "kernel": sd[pre + "head.attention.in_proj_weight"][48:].T,
                "bias": sd[pre + "head.attention.in_proj_bias"][48:],
            },
            "map_out": d(pre + "head.attention.out_proj"),
            "map_ln": l(pre + "head.layernorm"),
            "map_fc1": d(pre + "head.mlp.fc1"),
            "map_fc2": d(pre + "head.mlp.fc2"),
        }
        for i in range(2):
            b = pre + f"encoder.layers.{i}."
            params[f"layers_{i}"] = {
                "q_proj": d(b + "self_attn.q_proj"),
                "k_proj": d(b + "self_attn.k_proj"),
                "v_proj": d(b + "self_attn.v_proj"),
                "out_proj": d(b + "self_attn.out_proj"),
                "layer_norm1": l(b + "layer_norm1"),
                "layer_norm2": l(b + "layer_norm2"),
                "fc1": d(b + "mlp.fc1"),
                "fc2": d(b + "mlp.fc2"),
            }

        pixels = np.random.default_rng(0).normal(size=(2, 3, 28, 28)).astype(np.float32)
        last, pooled = ours.apply({"params": params}, jnp.array(pixels))
        with torch.no_grad():
            ref = hf(torch.tensor(pixels))
        np.testing.assert_allclose(
            np.asarray(last), ref.last_hidden_state.numpy(), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(pooled), ref.pooler_output.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_aesthetic_v25_scores(self):
        from tpdm_tpu.rewards.siglip import AestheticV25Model, SiglipVisionConfig

        m = AestheticV25Model.create(vision_cfg=SiglipVisionConfig.toy())
        imgs = np.random.default_rng(0).integers(0, 255, (2, 30, 40, 3), dtype=np.uint8)
        s = m.score(None, imgs)
        assert s.shape == (2,) and np.isfinite(s).all()


class TestBLIPScore:
    def test_protocol_and_symmetry(self):
        from tpdm_tpu.rewards.bert import BertMedConfig
        from tpdm_tpu.rewards.scorers import BLIPScoreModel
        from tpdm_tpu.rewards.vit import ViTConfig

        m = BLIPScoreModel.create(
            vit_cfg=ViTConfig.toy(), bert_cfg=BertMedConfig.toy(), embed_dim=8
        )
        imgs = np.random.default_rng(0).integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
        ids = np.array([[4, 1, 2], [7, 3, 1]], np.int32)
        s = m.score(ids, imgs)
        assert s.shape == (2,) and np.isfinite(s).all()
        assert (np.abs(s) <= 1.0 + 1e-5).all()  # cosine without logit scale


class TestBLIPScoreOracle:
    """Numerical oracle for the BLIP ITC score (reference
    models/BLIPScore.py:39-69): text-mode BERT with padding mask re-derived
    functionally in torch, then the projection/l2/cosine head composed with
    the (separately transformers-oracled) jax ViT tower."""

    def _torch_bert_text(self, p, cfg, ids, mask):
        def lin(x, tree):
            return x @ torch.tensor(np.asarray(tree["kernel"])) + torch.tensor(
                np.asarray(tree["bias"])
            )

        def ln(x, tree):
            return F.layer_norm(
                x, (x.shape[-1],),
                torch.tensor(np.asarray(tree["scale"])),
                torch.tensor(np.asarray(tree["bias"])), eps=1e-12,
            )

        def mha(q_in, kv_in, tree, heads, attn_mask=None):
            q, k, v = (
                lin(q_in, tree["query"]),
                lin(kv_in, tree["key"]),
                lin(kv_in, tree["value"]),
            )
            b, n, d = q.shape
            m = k.shape[1]
            hd = d // heads
            q = q.view(b, n, heads, hd).transpose(1, 2)
            k = k.view(b, m, heads, hd).transpose(1, 2)
            v = v.view(b, m, heads, hd).transpose(1, 2)
            am = None
            if attn_mask is not None:
                am = torch.where(
                    torch.tensor(attn_mask)[:, None, None, :],
                    torch.zeros(()),
                    torch.full((), -1e9),
                )
            o = F.scaled_dot_product_attention(q, k, v, attn_mask=am)
            return o.transpose(1, 2).reshape(b, n, d)

        emb = torch.tensor(np.asarray(p["word_embeddings"]["embedding"]))[
            torch.tensor(ids, dtype=torch.long)
        ]
        emb = emb + torch.tensor(np.asarray(p["position_embeddings"]))[: ids.shape[1]]
        x = ln(emb, p["embeddings_ln"])
        for i in range(cfg.num_hidden_layers):
            lp = p[f"layer_{i}"]
            att = mha(x, x, lp["attention_self"], cfg.num_attention_heads, mask)
            x = ln(x + lin(att, lp["attention_output"]), lp["attention_ln"])
            # text mode: cross-attention blocks are SKIPPED (med.py mode='text')
            y = F.gelu(lin(x, lp["intermediate"]))
            x = ln(x + lin(y, lp["output"]), lp["output_ln"])
        return x

    def test_text_mode_masked_bert_matches_torch(self):
        from tpdm_tpu.rewards.bert import BertMedConfig, BertMedModel

        cfg = BertMedConfig.toy()
        model = BertMedModel(cfg)
        ids = np.array([[4, 7, 9, 1, 0, 0], [3, 2, 1, 0, 0, 0]], np.int32)
        mask = ids != 0
        params = model.init(jax.random.PRNGKey(0), jnp.array(ids), None, None)
        ours = model.apply(params, jnp.array(ids), jnp.array(mask), None, None)
        ref = self._torch_bert_text(params["params"], cfg, ids, mask)
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_itc_score_matches_torch_head(self):
        from tpdm_tpu.rewards.bert import BertMedConfig
        from tpdm_tpu.rewards.scorers import BLIPScoreModel
        from tpdm_tpu.rewards.vit import ViTConfig
        from tpdm_tpu.utils.image import bicubic_resize_center_crop, normalize_clip

        m = BLIPScoreModel.create(
            vit_cfg=ViTConfig.toy(), bert_cfg=BertMedConfig.toy(), embed_dim=8
        )
        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 255, (2, 28, 24, 3), dtype=np.uint8)
        ids = np.array([[4, 1, 2, 0], [7, 3, 1, 0]], np.int32)
        mask = ids != 0
        ours = m.score(ids, imgs)

        # torch head: ViT CLS taken from the (transformers-oracled) jax
        # tower; bert/projections/l2/cosine fully re-derived in torch
        pixels = normalize_clip(bicubic_resize_center_crop(imgs, m.image_size))
        img_cls = np.asarray(m.vit.apply(m.vit_params, jnp.asarray(pixels))[:, 0])
        txt = self._torch_bert_text(
            m.bert_params["params"], BertMedConfig.toy(), ids, mask
        )[:, 0]
        imgf = torch.tensor(img_cls) @ torch.tensor(
            np.asarray(m.vision_proj["kernel"])
        ) + torch.tensor(np.asarray(m.vision_proj["bias"]))
        txtf = txt @ torch.tensor(np.asarray(m.text_proj["kernel"])) + torch.tensor(
            np.asarray(m.text_proj["bias"])
        )
        imgf = imgf / imgf.norm(dim=-1, keepdim=True)
        txtf = txtf / txtf.norm(dim=-1, keepdim=True)
        ref = (imgf * txtf).sum(-1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


class TestOutOfVocabGuard:
    def test_oov_prompt_ids_raise_not_nan(self):
        """OOV ids would hit JAX's 'fill' out-of-bounds gather and yield NaN
        rewards silently; score/inference_rank must fail loudly instead."""
        model = ImageRewardModel.create(
            vit_config=ViTConfig.toy(), bert_config=BertMedConfig.toy()
        )
        images = np.random.default_rng(0).integers(
            0, 255, size=(2, 20, 24, 3), dtype=np.uint8
        )
        bad = np.array([[1, 999, 6], [2, 5, 0]], np.int32)
        with pytest.raises(ValueError, match="out of range"):
            model.score(bad, images)
        with pytest.raises(ValueError, match="out of range"):
            model.inference_rank(bad[0], images)
        with pytest.raises(ValueError, match="out of range"):
            model.score(np.array([[-1, 2, 3]], np.int32), images[:1])
