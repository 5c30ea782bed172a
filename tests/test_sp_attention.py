"""Ring (sequence-parallel) attention vs the dense reference, 8-dev mesh.

The reference has no context parallelism at all (SURVEY §5); this is the
TPU-native long-context path: token axis sharded, kv rotating via
ppermute, exact (m, l) softmax merging.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tpdm_tpu.ops.attention import (
    attention_reference,
    attention_reference_stats,
    flash_attention_with_stats,
    merge_attention_shards,
)
from tpdm_tpu.parallel.sp_attention import make_ring_attention


def _qkv(key, b=2, h=2, n=1024, d=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (b, h, n, d), dtype),
        jax.random.normal(kk, (b, h, n, d), dtype),
        jax.random.normal(kv, (b, h, n, d), dtype),
    )


class TestStatsContract:
    def test_pallas_stats_match_reference_stats(self):
        q, k, v = _qkv(jax.random.PRNGKey(0), n=256)
        o1, m1, l1 = flash_attention_with_stats(q, k, v, interpret=True)
        o2, m2, l2 = attention_reference_stats(q, k, v)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)
        # l is frame-dependent only through m: compare in a shared frame
        np.testing.assert_allclose(
            np.asarray(jnp.log2(l1) + m1),
            np.asarray(jnp.log2(l2) + m2),
            rtol=1e-5, atol=1e-4,
        )

    def test_merge_of_manual_shards_equals_dense(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), n=512)
        parts = []
        for i in range(4):
            sl = slice(i * 128, (i + 1) * 128)
            parts.append(
                attention_reference_stats(q, k[:, :, sl], v[:, :, sl])
            )
        o = merge_attention_shards(
            jnp.stack([p[0] for p in parts]),
            jnp.stack([p[1] for p in parts]),
            jnp.stack([p[2] for p in parts]),
        )
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), rtol=2e-5, atol=2e-5)


class TestRingAttention:
    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_matches_dense_reference(self, use_pallas):
        mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
        q, k, v = _qkv(jax.random.PRNGKey(2), n=1024)
        ring = make_ring_attention(
            mesh, axis="seq", use_pallas=use_pallas, interpret=use_pallas
        )
        out = jax.jit(ring)(q, k, v)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5
        )

    def test_batch_and_seq_sharded_together(self):
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
        q, k, v = _qkv(jax.random.PRNGKey(3), b=2, n=512)
        ring = make_ring_attention(mesh, axis="seq", use_pallas=False)
        out = jax.jit(ring)(q, k, v)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5
        )

    def test_merge_is_stable_under_skewed_shard_magnitudes(self):
        # one ring stop sees scores ~100x larger: the running (m, l) merge
        # must stay exact, no overflow/underflow
        mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
        q, k, v = _qkv(jax.random.PRNGKey(4), b=1, h=1, n=512)
        k = k.at[:, :, 128:256].multiply(25.0)
        ring = make_ring_attention(mesh, axis="seq", use_pallas=False)
        out = jax.jit(ring)(q, k, v)
        ref = attention_reference(q, k, v)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5
        )

    def test_backward_ring_matches_dense_gradients(self):
        mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
        q, k, v = _qkv(jax.random.PRNGKey(6), b=1, h=2, n=512)
        ring = make_ring_attention(
            mesh, axis="seq", use_pallas=False, differentiable=True
        )

        def loss(f):
            return lambda q, k, v: jnp.sum(f(q, k, v) ** 2)

        gq, gk, gv = jax.grad(loss(jax.jit(ring)), argnums=(0, 1, 2))(q, k, v)
        rq, rk, rv = jax.grad(loss(attention_reference), argnums=(0, 1, 2))(
            q, k, v
        )
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=2e-4, atol=2e-5)

    def test_backward_ring_with_pallas_forward(self):
        mesh = Mesh(np.array(jax.devices()[:2]), ("seq",))
        q, k, v = _qkv(jax.random.PRNGKey(7), b=1, h=1, n=256)
        ring = make_ring_attention(
            mesh, axis="seq", use_pallas=True, interpret=True,
            differentiable=True,
        )
        gq = jax.grad(lambda q: jnp.sum(ring(q, k, v) ** 2))(q)
        rq = jax.grad(lambda q: jnp.sum(attention_reference(q, k, v) ** 2))(q)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), rtol=2e-4, atol=2e-5)

    def test_single_device_degenerates_to_dense(self):
        mesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
        q, k, v = _qkv(jax.random.PRNGKey(5), b=1, h=1, n=256)
        ring = make_ring_attention(mesh, axis="seq", use_pallas=False)
        out = jax.jit(ring)(q, k, v)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


class TestRingKvLen:
    """kv_len masking via the exact (m, l) pad correction: pad kv columns
    are exact zeros appended at the global tail (the joint-sequence
    alignment pad in models/mmdit.py JointAttention)."""

    @pytest.mark.parametrize("kv_len", [450, 384, 257])
    def test_matches_masked_dense(self, kv_len):
        # 512 tokens over 8 devices = 64/shard; kv_len=450 pads within the
        # last shard, 384 kills shards 6-7 ENTIRELY (dead-shard guard),
        # 257 leaves one valid column in shard 4
        mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
        q, k, v = _qkv(jax.random.PRNGKey(8), b=1, h=2, n=512)
        zero = jnp.zeros_like(k[:, :, kv_len:])
        k = k.at[:, :, kv_len:].set(zero)
        v = v.at[:, :, kv_len:].set(zero)
        ring = make_ring_attention(
            mesh, axis="seq", use_pallas=False, kv_len=kv_len
        )
        out = jax.jit(ring)(q, k, v)
        ref = attention_reference(q, k, v, kv_len=kv_len)
        np.testing.assert_allclose(
            np.asarray(out)[:, :, :kv_len],
            np.asarray(ref)[:, :, :kv_len],
            rtol=3e-5, atol=3e-5,
        )

    def test_pallas_interpret_path(self):
        mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
        q, k, v = _qkv(jax.random.PRNGKey(9), b=1, h=1, n=512)
        kv_len = 390
        zero = jnp.zeros_like(k[:, :, kv_len:])
        k = k.at[:, :, kv_len:].set(zero)
        v = v.at[:, :, kv_len:].set(zero)
        ring = make_ring_attention(
            mesh, axis="seq", use_pallas=True, interpret=True, kv_len=kv_len
        )
        out = jax.jit(ring)(q, k, v)
        ref = attention_reference(q, k, v, kv_len=kv_len)
        np.testing.assert_allclose(
            np.asarray(out)[:, :, :kv_len],
            np.asarray(ref)[:, :, :kv_len],
            rtol=3e-5, atol=3e-5,
        )

    def test_backward_with_kv_len(self):
        """Grads w.r.t. the VALID region match the masked dense reference
        (pad-row cotangents are dropped by the caller's pad transpose —
        here emulated by slicing before the loss)."""
        mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
        qf, kf, vf = _qkv(jax.random.PRNGKey(10), b=1, h=1, n=256)
        kv_len = 200
        pad = 256 - kv_len

        def pad_t(t):
            return jnp.pad(t[:, :, :kv_len], ((0, 0), (0, 0), (0, pad), (0, 0)))

        ring = make_ring_attention(
            mesh, axis="seq", use_pallas=False, differentiable=True,
            kv_len=kv_len,
        )

        def loss_ring(q, k, v):
            o = ring(pad_t(q), pad_t(k), pad_t(v))[:, :, :kv_len]
            return jnp.sum(o**2)

        def loss_ref(q, k, v):
            o = attention_reference(
                q[:, :, :kv_len], k[:, :, :kv_len], v[:, :, :kv_len]
            )
            return jnp.sum(o**2)

        g = jax.grad(loss_ring, argnums=(0, 1, 2))(qf, kf, vf)
        r = jax.grad(loss_ref, argnums=(0, 1, 2))(qf, kf, vf)
        for gi, ri in zip(g, r):
            np.testing.assert_allclose(
                np.asarray(gi)[:, :, :kv_len],
                np.asarray(ri)[:, :, :kv_len],
                rtol=2e-4, atol=2e-5,
            )
