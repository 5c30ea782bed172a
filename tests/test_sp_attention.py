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
