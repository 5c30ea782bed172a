"""Sequence-parallel (ring) attention: shard the token axis over the mesh.

The reference has NO long-context story (SURVEY §5: sequences are fixed at
~4429 tokens; no ring/blockwise/context parallelism anywhere in its tree).
On TPU, 2048px+ generation (16.7k joint tokens) wants the latent-token
axis sharded; this module implements classic ring attention over a mesh
axis: queries stay local, K/V shards rotate around the ring via
`lax.ppermute`, and per-shard partial softmaxes merge exactly via the
(m, l) statistics the flash kernel already tracks
(ops/attention.py flash_attention_with_stats).

Per step each device computes local-q x visiting-kv with the Pallas
kernel, so compute stays on the MXU while the next shard is in flight on
the ICI. Forward-only (the TPDM backbone is frozen; a backward ring is
tracked in docs/ROADMAP.md).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpdm_tpu.ops.attention import (
    attention_reference_stats,
    flash_attention_with_stats,
)

_NEG = -1e30


def _ring_body(q, k, v, axis: str, n_dev: int, local_stats):
    """The unrolled ring: rotate kv n_dev times, merging online."""
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    b, h, n_q, d = q.shape
    num = jnp.zeros((b, h, n_q, d), jnp.float32)
    l_tot = jnp.zeros((b, h, n_q), jnp.float32)
    m = jnp.full((b, h, n_q), _NEG, jnp.float32)
    k_cur, v_cur = k, v
    for step in range(n_dev):
        o_i, m_i, l_i = local_stats(q, k_cur, v_cur)
        m_new = jnp.maximum(m, m_i)
        alpha = jnp.exp2(m - m_new)
        beta = jnp.exp2(m_i - m_new) * l_i
        num = num * alpha[..., None] + o_i.astype(jnp.float32) * beta[..., None]
        l_tot = l_tot * alpha + beta
        m = m_new
        if step + 1 < n_dev:
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
    return (num / l_tot[..., None]).astype(q.dtype)


def make_ring_attention(
    mesh: Mesh,
    axis: str = "seq",
    batch_axes: tuple = ("data", "fsdp"),
    use_pallas: bool = True,
    interpret: bool = False,
):
    """Build attention with the TOKEN axis sharded over `axis`.

    q, k, v: (b, h, n, d) with n divisible by mesh.shape[axis] (and each
    local shard 128-aligned for the Pallas path on real hardware). The
    batch dim may additionally be sharded over `batch_axes`. Returns the
    fully-assembled (still token-sharded) attention output.
    """
    n_dev = mesh.shape[axis]
    present = tuple(a for a in batch_axes if a in mesh.axis_names)
    spec = P(present if present else None, None, axis, None)

    def local_stats(q, k, v):
        if use_pallas:
            return flash_attention_with_stats(q, k, v, interpret=interpret)
        return attention_reference_stats(q, k, v)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,  # pallas out_shapes carry no vma metadata
    )
    def ring_attention(q, k, v):
        return _ring_body(q, k, v, axis, n_dev, local_stats)

    return ring_attention
