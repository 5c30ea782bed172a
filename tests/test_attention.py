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

    def test_kv_len_mask_with_strongly_negative_scores(self):
        """Regression: masked rows must behave like -inf, not score-0.

        If masking merely zeroed the K rows, the running max would be
        pulled to 0 and exp2(real - 0) underflows when every real score is
        strongly negative -> 0/0 NaN. The augmented bias row/column keeps
        the max at the true valid max."""
        q, k, v = _rand_qkv(jax.random.PRNGKey(20), b=1, h=1, n_q=128, n_kv=256)
        # dominant channel drives every valid score to ~-120 (past the
        # exp2 underflow horizon relative to a spurious max of 0) while
        # keeping O(1) well-conditioned differences between columns
        q = q.at[..., 0].add(12.0)
        k = k.at[..., 0].set(-80.0)
        out = flash_attention(q, k, v, 200, 128, True)
        ref = attention_reference(q, k[:, :, :200], v[:, :, :200])
        assert np.isfinite(np.asarray(out, np.float32)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_padding_only_mask_with_negative_scores(self):
        # n_kv not 128-aligned: padding alone must also keep -inf semantics
        q, k, v = _rand_qkv(jax.random.PRNGKey(21), b=1, h=1, n_q=128, n_kv=200)
        q = q.at[..., 0].add(12.0)
        k = k.at[..., 0].set(-80.0)
        out = flash_attention(q, k, v, None, 128, True)
        ref = attention_reference(q, k, v)
        assert np.isfinite(np.asarray(out, np.float32)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

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


class TestDispatchChoices:
    """Pin the VMEM-model decisions for the production shapes (regression
    guards for the measured optima in docs/PERF.md)."""

    def test_sd3_1024px_uses_one_full_block(self):
        from tpdm_tpu.ops.attention import _pick_n_block, _resident_lane_cap

        cap = _resident_lane_cap(4480, 64, 2)
        assert cap >= 4480  # resident, single block
        assert _pick_n_block(4480, cap) == (4480, 4480)

    def test_flux_d128_uses_midsize_block(self):
        from tpdm_tpu.ops.attention import _pick_n_block, _resident_lane_cap

        cap = _resident_lane_cap(4608, 128, 2)
        assert 128 <= cap < 4608
        nb, padded = _pick_n_block(4608, cap)
        assert nb == 2304 and padded == 4608  # measured ~8% over max-size

    def test_wide_head_streams(self):
        from tpdm_tpu.ops.attention import _resident_lane_cap, _streaming_blocks

        # 512px VAE attention (d=512, kv=4096): resident can't fit
        assert _resident_lane_cap(4096, 512, 2) < 128
        bq, bkv = _streaming_blocks(512, 2)
        assert bq >= 1024 and bkv >= 128

    def test_2048px_prime_length_gets_large_padded_block(self):
        from tpdm_tpu.ops.attention import _pick_n_block

        # 16768 = 128 * 131 (prime): exact-divisor blocking would force
        # 128-lane programs; padding tolerance unlocks 1536 lanes
        nb, padded = _pick_n_block(16768, 1536)
        assert nb == 1536 and padded == 16896
        assert (padded - 16768) / 16768 < 0.04

    def test_streaming_blocks_shrink_for_fp32(self):
        from tpdm_tpu.ops.attention import _streaming_blocks

        assert _streaming_blocks(64, 2) == (1536, 512)  # swept bf16 optimum
        # the dtype axis, isolated at a width where operands dominate VMEM:
        # same head_dim, different itemsize must shrink the blocks
        bq_bf16, _ = _streaming_blocks(512, 2)
        bq_fp32, _ = _streaming_blocks(512, 4)
        assert bq_fp32 < bq_bf16
        # the head-dim axis, isolated at fixed itemsize
        assert _streaming_blocks(512, 2)[1] < _streaming_blocks(64, 2)[1]


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


class TestChunkedBackward:
    """Streaming-path gradients (kv > threshold): chunked recompute vs the
    dense reference VJP — the reference gets this from torch SDPA
    (transformer_sd3.py:28,279); here it is a two-pass O(n_q*chunk) scan."""

    def test_backward_fn_matches_dense_vjp(self):
        from tpdm_tpu.ops.attention import attention_backward_chunked

        q, k, v = _rand_qkv(jax.random.PRNGKey(10), b=1, h=2, n_q=200, n_kv=333)
        o, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v), q, k, v)
        do = jax.random.normal(jax.random.PRNGKey(11), o.shape, o.dtype)
        rq, rk, rv = vjp(do)
        gq, gk, gv = attention_backward_chunked(q, k, v, o, do, None, chunk=128)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=2e-4, atol=2e-5)

    def test_backward_fn_kv_len_mask(self):
        from tpdm_tpu.ops.attention import attention_backward_chunked

        q, k, v = _rand_qkv(jax.random.PRNGKey(12), b=1, h=1, n_q=64, n_kv=256)
        kv_len = 150
        ref = lambda q, k, v: attention_reference(q, k, v, kv_len)
        o, vjp = jax.vjp(ref, q, k, v)
        do = jnp.ones_like(o)
        rq, rk, rv = vjp(do)
        gq, gk, gv = attention_backward_chunked(q, k, v, o, do, kv_len, chunk=128)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=2e-4, atol=2e-5)
        # masked kv positions receive exactly zero gradient
        assert float(jnp.abs(gk[:, :, kv_len:]).max()) == 0.0
        assert float(jnp.abs(gv[:, :, kv_len:]).max()) == 0.0

    def test_streaming_custom_vjp_end_to_end(self):
        """grad through the streaming kernel itself (interpret mode)."""
        from tpdm_tpu.ops.attention import _streaming_flash_attention

        q, k, v = _rand_qkv(jax.random.PRNGKey(13), b=1, h=1, n_q=128, n_kv=384)

        def f(q, k, v):
            return (_streaming_flash_attention(q, k, v, None, 128, 128, True) ** 2).sum()

        def f_ref(q, k, v):
            return (attention_reference(q, k, v) ** 2).sum()

        gq, gk, gv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        rq, rk, rv = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=2e-4, atol=2e-5)

    def test_long_sequence_dispatch_is_differentiable(self, monkeypatch):
        """flash_attention's kv>threshold route must be trainable now."""
        import tpdm_tpu.ops.attention as A

        monkeypatch.setattr(A, "_STREAMING_KV_THRESHOLD", 256)
        q, k, v = _rand_qkv(jax.random.PRNGKey(14), b=1, h=1, n_q=128, n_kv=384)
        g = jax.grad(
            lambda q: A.flash_attention(q, k, v, interpret=True).sum()
        )(q)
        assert bool(jnp.isfinite(g).all())
