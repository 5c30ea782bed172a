"""BLIP text-decoder mode (rewards/bert.py BertMedDecoder).

The reference vendors the med.py decoder path + blip_pretrain.py's
text_decoder head but never runs it from ImageReward's `score`; this
closes the last listed surface gap. Oracle style mirrors
tests/test_rewards.py's med-layer torch re-derivation, extended with the
causal mask and the cls.predictions LM head.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tpdm_tpu.rewards.bert import (  # noqa: E402
    BertMedConfig,
    BertMedDecoder,
    greedy_caption,
)


def _world(seed=0, b=2, n=5, n_img=4):
    cfg = BertMedConfig.toy()
    dec = BertMedDecoder(cfg)
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, cfg.vocab_size, (b, n)).astype(np.int32)
    img = rng.normal(size=(b, n_img, cfg.encoder_width)).astype(np.float32)
    params = dec.init(
        jax.random.PRNGKey(seed), jnp.asarray(ids), None, jnp.asarray(img)
    )
    return cfg, dec, params, ids, img


class TestDecoderForward:
    def test_matches_torch_functional_oracle(self):
        cfg, dec, params, ids, img = _world()
        ours = dec.apply(params, jnp.asarray(ids), None, jnp.asarray(img))

        p = params["params"]["bert"]
        cls = params["params"]["cls"]

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

        def mha(q_in, kv_in, tree, heads, causal):
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
            o = F.scaled_dot_product_attention(q, k, v, is_causal=causal)
            return o.transpose(1, 2).reshape(b, n, d)

        tids = torch.tensor(ids, dtype=torch.long)
        emb = torch.tensor(np.asarray(p["word_embeddings"]["embedding"]))[tids]
        emb = emb + torch.tensor(np.asarray(p["position_embeddings"]))[
            : ids.shape[1]
        ]
        x = ln(emb, p["embeddings_ln"])
        imgt = torch.tensor(img)
        for i in range(cfg.num_hidden_layers):
            lp = p[f"layer_{i}"]
            att = mha(x, x, lp["attention_self"], cfg.num_attention_heads,
                      causal=True)
            x = ln(x + lin(att, lp["attention_output"]), lp["attention_ln"])
            cross = mha(x, imgt, lp["cross_self"], cfg.num_attention_heads,
                        causal=False)
            x = ln(x + lin(cross, lp["cross_output"]), lp["cross_ln"])
            y = F.gelu(lin(x, lp["intermediate"]))
            x = ln(x + lin(y, lp["output"]), lp["output_ln"])
        # cls.predictions head: transform dense + gelu + LN + vocab proj
        x = F.gelu(lin(x, cls["transform"]))
        x = ln(x, cls["transform_ln"])
        want = lin(x, cls["decoder"])

        np.testing.assert_allclose(
            np.asarray(ours), want.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_causal_mask_blocks_the_future(self):
        """Logits at position i must not move when tokens > i change."""
        cfg, dec, params, ids, img = _world()
        full = dec.apply(params, jnp.asarray(ids), None, jnp.asarray(img))
        mutated = ids.copy()
        mutated[:, -1] = (mutated[:, -1] + 1) % cfg.vocab_size
        got = dec.apply(params, jnp.asarray(mutated), None, jnp.asarray(img))
        np.testing.assert_allclose(
            np.asarray(got[:, :-1]), np.asarray(full[:, :-1]),
            rtol=1e-5, atol=1e-6,
        )
        assert float(jnp.abs(got[:, -1] - full[:, -1]).max()) > 0

    def test_encoder_and_decoder_share_the_trunk_params(self):
        """BLIP flips the mask on ONE set of weights: the decoder's bert/
        subtree must load an encoder BertMedModel checkpoint unchanged."""
        from tpdm_tpu.rewards.bert import BertMedModel

        cfg, dec, params, ids, img = _world()
        enc = BertMedModel(cfg)
        enc_out = enc.apply(
            {"params": params["params"]["bert"]},
            jnp.asarray(ids), None, jnp.asarray(img),
        )
        assert enc_out.shape == (ids.shape[0], ids.shape[1], cfg.hidden_size)


class TestGreedyCaption:
    def test_terminates_deterministic_and_image_conditioned(self):
        cfg, dec, params, ids, img = _world(n=4)
        bos, sep = 1, 2
        out1 = greedy_caption(
            dec, params, jnp.asarray(img), bos, sep, max_len=8
        )
        out2 = greedy_caption(
            dec, params, jnp.asarray(img), bos, sep, max_len=8
        )
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert out1.shape == (2, 8)
        assert (np.asarray(out1)[:, 0] == bos).all()
        # a different image must steer the caption (cross-attn is live)
        out3 = greedy_caption(
            dec, params, jnp.asarray(img) * 3.0 + 1.0, bos, sep, max_len=8
        )
        assert (np.asarray(out3) != np.asarray(out1)).any()

    def test_sep_freezes_the_row(self):
        """After a row emits sep, every later slot is pad."""
        cfg, dec, params, ids, img = _world()
        out = np.asarray(
            greedy_caption(dec, params, jnp.asarray(img), 1, 2, max_len=12)
        )
        for row in out:
            hits = np.where(row == 2)[0]
            if hits.size:
                assert (row[hits[0] + 1 :] == 0).all()


class TestBlipDecoderConverter:
    def _torch_layout(self, params, tied=False):
        """Invert the converter's mapping: our params -> BLIP text_decoder
        checkpoint keys (torch Linear stores kernel transposed)."""
        p = params["params"]["bert"]
        cls = params["params"]["cls"]
        sd = {}

        def dense(tree, key):
            sd[f"{key}.weight"] = np.asarray(tree["kernel"]).T
            sd[f"{key}.bias"] = np.asarray(tree["bias"])

        def ln(tree, key):
            sd[f"{key}.weight"] = np.asarray(tree["scale"])
            sd[f"{key}.bias"] = np.asarray(tree["bias"])

        eb = "text_decoder.bert.embeddings"
        sd[f"{eb}.word_embeddings.weight"] = np.asarray(
            p["word_embeddings"]["embedding"]
        )
        sd[f"{eb}.position_embeddings.weight"] = np.asarray(
            p["position_embeddings"]
        )
        ln(p["embeddings_ln"], f"{eb}.LayerNorm")
        i = 0
        while f"layer_{i}" in p:
            lp = p[f"layer_{i}"]
            base = f"text_decoder.bert.encoder.layer.{i}"
            for nm in ("query", "key", "value"):
                dense(lp["attention_self"][nm], f"{base}.attention.self.{nm}")
                dense(lp["cross_self"][nm], f"{base}.crossattention.self.{nm}")
            dense(lp["attention_output"], f"{base}.attention.output.dense")
            ln(lp["attention_ln"], f"{base}.attention.output.LayerNorm")
            dense(lp["cross_output"], f"{base}.crossattention.output.dense")
            ln(lp["cross_ln"], f"{base}.crossattention.output.LayerNorm")
            dense(lp["intermediate"], f"{base}.intermediate.dense")
            dense(lp["output"], f"{base}.output.dense")
            ln(lp["output_ln"], f"{base}.output.LayerNorm")
            i += 1
        hb = "text_decoder.cls.predictions"
        dense(cls["transform"], f"{hb}.transform.dense")
        ln(cls["transform_ln"], f"{hb}.transform.LayerNorm")
        sd[f"{hb}.bias"] = np.asarray(cls["decoder"]["bias"])
        if not tied:
            sd[f"{hb}.decoder.weight"] = np.asarray(
                cls["decoder"]["kernel"]
            ).T
        return sd

    def test_roundtrip_and_forward(self):
        from tpdm_tpu.rewards.image_reward import convert_blip_decoder

        cfg, dec, params, ids, img = _world()
        sd = self._torch_layout(params)
        got = convert_blip_decoder(sd, bert_layers=cfg.num_hidden_layers)
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(got),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        out = dec.apply(got, jnp.asarray(ids), None, jnp.asarray(img))
        ref = dec.apply(params, jnp.asarray(ids), None, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_tied_head_falls_back_to_word_embeddings(self):
        from tpdm_tpu.rewards.image_reward import convert_blip_decoder

        cfg, dec, params, ids, img = _world()
        sd = self._torch_layout(params, tied=True)
        got = convert_blip_decoder(sd, bert_layers=cfg.num_hidden_layers)
        np.testing.assert_allclose(
            np.asarray(got["params"]["cls"]["decoder"]["kernel"]),
            np.asarray(
                params["params"]["bert"]["word_embeddings"]["embedding"]
            ).T,
        )
        out = dec.apply(got, jnp.asarray(ids), None, jnp.asarray(img))
        assert np.isfinite(np.asarray(out)).all()
