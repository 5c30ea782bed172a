"""Text-encoder parity vs tiny random transformers torch models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpdm_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from tpdm_tpu.models.t5 import T5Config, T5Encoder
from tpdm_tpu.utils.convert import convert_clip_text, convert_t5, convert_tpm, export_tpm


@pytest.fixture(scope="module")
def torch_clip():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFConfig(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        projection_dim=24,
        eos_token_id=98,
        bos_token_id=97,
        pad_token_id=0,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = CLIPTextModelWithProjection(hf_cfg).eval()
    return model


class TestCLIPParity:
    def test_outputs_match(self, torch_clip):
        cfg = CLIPTextConfig.toy()
        ours = CLIPTextModel(cfg)
        params = convert_clip_text(
            torch_clip.state_dict(), num_layers=cfg.num_hidden_layers
        )

        ids = np.array(
            [[97, 5, 6, 7, 98, 0, 0, 0], [97, 9, 98, 0, 0, 0, 0, 0]], np.int32
        )
        pen, final, pooled, proj = ours.apply(params, jnp.array(ids))

        with torch.no_grad():
            out = torch_clip(torch.tensor(ids, dtype=torch.long), output_hidden_states=True)
        np.testing.assert_allclose(
            np.asarray(pen), out.hidden_states[-2].numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(final), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(proj), out.text_embeds.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_unused_keys_empty(self, torch_clip):
        from tpdm_tpu.utils.convert import _SD

        sd = _SD(torch_clip.state_dict())
        convert_clip_text(torch_clip.state_dict(), num_layers=2)
        # conversion consumed every parameter except buffers
        leftover = {
            k
            for k in torch_clip.state_dict()
            if "position_ids" not in k and "embeddings.position_embedding" not in k
        }
        params = convert_clip_text(torch_clip.state_dict(), num_layers=2)
        n_ours = sum(x.size for x in jax.tree.leaves(params))
        n_torch = sum(
            v.numel()
            for k, v in torch_clip.state_dict().items()
            if "position_ids" not in k
        )
        assert n_ours == n_torch


@pytest.fixture(scope="module")
def torch_t5():
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=120,
        d_model=32,
        d_kv=8,
        d_ff=48,
        num_layers=2,
        num_heads=4,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(1)
    return T5EncoderModel(hf_cfg).eval()


class TestT5Parity:
    def test_outputs_match(self, torch_t5):
        cfg = T5Config.toy()
        ours = T5Encoder(cfg)
        params = convert_t5(torch_t5.state_dict(), num_layers=cfg.num_layers)
        ids = np.array([[3, 45, 7, 99, 1, 0, 0], [12, 1, 0, 0, 0, 0, 0]], np.int32)
        out = ours.apply(params, jnp.array(ids))
        with torch.no_grad():
            ref = torch_t5(torch.tensor(ids, dtype=torch.long)).last_hidden_state
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_attention_mask(self, torch_t5):
        cfg = T5Config.toy()
        ours = T5Encoder(cfg)
        params = convert_t5(torch_t5.state_dict(), num_layers=cfg.num_layers)
        ids = np.array([[3, 45, 7, 1, 0, 0]], np.int32)
        mask = (ids != 0)
        out = ours.apply(params, jnp.array(ids), jnp.array(mask))
        with torch.no_grad():
            ref = torch_t5(
                torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            ).last_hidden_state
        np.testing.assert_allclose(
            np.asarray(out)[mask], ref.numpy()[mask], rtol=1e-3, atol=1e-4
        )


class TestTPMConvertRoundtrip:
    def test_export_then_convert_identity(self):
        from tpdm_tpu.models import TimePredictor

        tpm = TimePredictor(conv_out_channels=8, in_channels=16, temb_dim=12)
        params = tpm.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 8, 8)), jnp.zeros((1, 12))
        )
        sd = export_tpm(params)
        assert all(k.startswith("agent_model.time_predictor.") for k in sd)
        back = convert_tpm(sd)
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(back), key=str),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_converted_tpm_matches_forward(self):
        """Converted weights drive the exact same forward as the originals."""
        from tpdm_tpu.models import TimePredictor

        tpm = TimePredictor(conv_out_channels=8, in_channels=16, temb_dim=12)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8, 8))
        t = jax.random.normal(jax.random.PRNGKey(2), (2, 12))
        params = tpm.init(jax.random.PRNGKey(0), x, t)
        back = convert_tpm(export_tpm(params))
        np.testing.assert_allclose(
            np.asarray(tpm.apply(params, x, t)),
            np.asarray(tpm.apply(back, x, t)),
            rtol=1e-5,
        )


class TestT5Quant:
    """Weight-only stored-int T5 (T5Config.quant_matmuls): the 9.5 GB
    tower that streams host->device per cold-prompt encode; int8 halves
    it with fp activations."""

    def test_w8_close_to_fp_and_prequantized_path(self):
        import dataclasses

        import jax
        import jax.numpy as jnp

        from tpdm_tpu.models.t5 import T5Config, T5Encoder
        from tpdm_tpu.ops.quant import fit_quant_params, prequantize_params

        cfg = T5Config.toy()
        qcfg = dataclasses.replace(cfg, quant_matmuls=True)
        model, qmodel = T5Encoder(cfg), T5Encoder(qcfg)
        ids = jnp.array([[5, 9, 17, 3, 0, 0]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        out_fp = model.apply(params, ids)[0]
        expected = jax.eval_shape(qmodel.init, jax.random.PRNGKey(0), ids)
        qparams = prequantize_params(fit_quant_params(params, expected))
        blk = qparams["params"]["block_0"]
        assert blk["attention"]["q"]["kernel"].dtype == jnp.int8
        assert blk["wi_0"]["kernel"].dtype == jnp.int8
        out_q = qmodel.apply(qparams, ids)[0]
        err = float(jnp.abs(out_fp - out_q).mean()) / (
            float(jnp.abs(out_fp).mean()) + 1e-9
        )
        assert 0.0 < err < 0.05, err  # weight-only int8: tight
