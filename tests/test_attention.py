"""Pallas flash-attention kernel vs jnp reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tpdm_tpu.ops.attention import attention_reference, flash_attention


def _rand_qkv(key, b=2, h=3, n_q=300, n_kv=300, d=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n_q, d), dtype)
    k = jax.random.normal(kk, (b, h, n_kv, d), dtype)
    v = jax.random.normal(kv, (b, h, n_kv, d), dtype)
    return q, k, v


class TestReference:
    def test_matches_torch_sdpa(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(0), n_q=64, n_kv=96)
        ours = attention_reference(q, k, v)
        tq, tk, tv = (torch.tensor(np.asarray(t)) for t in (q, k, v))
        ref = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), rtol=2e-5, atol=2e-5
        )

    def test_kv_len_mask_equals_truncation(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(1), n_q=32, n_kv=128)
        masked = attention_reference(q, k, v, kv_len=100)
        truncated = attention_reference(q, k[:, :, :100], v[:, :, :100])
        np.testing.assert_allclose(
            np.asarray(masked), np.asarray(truncated), rtol=1e-5, atol=1e-6
        )


class TestFlashKernel:
    def test_matches_reference_unpadded(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(2), n_q=256, n_kv=256)
        out = flash_attention(q, k, v, None, 128, True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_matches_reference_ragged_lengths(self):
        # 4429-like: n not a multiple of 128 on either axis.
        q, k, v = _rand_qkv(jax.random.PRNGKey(3), b=1, h=2, n_q=333, n_kv=437)
        out = flash_attention(q, k, v, None, 256, True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_kv_len_masking(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(4), b=1, h=1, n_q=128, n_kv=256)
        out = flash_attention(q, k, v, 200, 128, True)
        ref = attention_reference(q, k[:, :, :200], v[:, :, :200])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_bf16_io(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(5), n_q=128, n_kv=128, dtype=jnp.bfloat16)
        out = flash_attention(q, k, v, None, 128, True)
        assert out.dtype == jnp.bfloat16
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
        )

    def test_grads_via_custom_vjp(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(6), b=1, h=1, n_q=64, n_kv=64)

        def f(q, k, v):
            return flash_attention(q, k, v, None, 128, True).sum()

        gq, gk, gv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        def f_ref(q, k, v):
            return attention_reference(q, k, v).sum()

        rq, rk, rv = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=1e-4, atol=1e-5)


class TestStreamingKernel:
    def test_matches_reference(self):
        from tpdm_tpu.ops.attention import _flash_attention_streaming_impl

        q, k, v = _rand_qkv(jax.random.PRNGKey(7), b=1, h=2, n_q=300, n_kv=450)
        out = _flash_attention_streaming_impl(q, k, v, None, 128, 128, True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_kv_len_masking(self):
        from tpdm_tpu.ops.attention import _flash_attention_streaming_impl

        q, k, v = _rand_qkv(jax.random.PRNGKey(8), b=1, h=1, n_q=128, n_kv=512)
        out = _flash_attention_streaming_impl(q, k, v, 300, 128, 128, True)
        ref = attention_reference(q, k[:, :, :300], v[:, :, :300])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_single_kv_block_degenerate(self):
        from tpdm_tpu.ops.attention import _flash_attention_streaming_impl

        q, k, v = _rand_qkv(jax.random.PRNGKey(9), b=1, h=1, n_q=128, n_kv=128)
        out = _flash_attention_streaming_impl(q, k, v, None, 128, 128, True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
