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
the ICI.

Backward (differentiable=True) runs a second ring: dq accumulates locally
against each visiting (k, v) shard, while dk/dv accumulators RIDE ALONG
with their kv shard — after a full rotation every shard arrives home
carrying gradient contributions from every query shard. The softmax
gradient in the kernel's exp2 domain is ds2 = ln(2)·p·(dp - D); chained
with s2 = log2(e)/sqrt(d)·(q·k^T), the ln(2)·log2(e) product cancels back
to the natural 1/sqrt(d).
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
_LOG2E = 1.4426950408889634


def _ring_forward(q, k, v, axis: str, n_dev: int, local_stats, pad_cnt=None):
    """Rotate kv n_dev times, merging online. Returns (o, m, l) with the
    global exp2-domain softmax stats (residuals for the backward ring).

    pad_cnt: optional per-shard () float32 count of PAD kv columns at the
    tail of this shard (pad k/v rows are exact zeros, appended by jnp.pad
    in the caller). Each pad column scores s2=0, so it contributes exactly
    exp2(0 - m_i) to the local l and nothing to the numerator (v=0) —
    subtracting cnt*exp2(-m_i) recovers the valid-only statistics without
    any in-kernel masking, keeping the Pallas fast path mask-free. The
    count rotates around the ring with its kv shard.
    """
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    b, h, n_q, d = q.shape
    num = jnp.zeros((b, h, n_q, d), jnp.float32)
    l_tot = jnp.zeros((b, h, n_q), jnp.float32)
    m = jnp.full((b, h, n_q), _NEG, jnp.float32)
    k_cur, v_cur, cnt_cur = k, v, pad_cnt
    for step in range(n_dev):
        o_i, m_i, l_i = local_stats(q, k_cur, v_cur)
        if cnt_cur is not None:
            l_raw = l_i
            l_i = l_raw - cnt_cur * jnp.exp2(-m_i)
            dead = l_i <= 0.0  # visiting shard entirely pad
            safe = jnp.where(dead, 1.0, l_i)
            o_i = jnp.where(
                dead[..., None],
                0.0,
                o_i.astype(jnp.float32) * (l_raw / safe)[..., None],
            )
            m_i = jnp.where(dead, _NEG, m_i)
            l_i = jnp.where(dead, 0.0, l_i)
        m_new = jnp.maximum(m, m_i)
        alpha = jnp.exp2(m - m_new)
        beta = jnp.exp2(m_i - m_new) * l_i
        num = num * alpha[..., None] + o_i.astype(jnp.float32) * beta[..., None]
        l_tot = l_tot * alpha + beta
        m = m_new
        if step + 1 < n_dev:
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            if cnt_cur is not None:
                cnt_cur = jax.lax.ppermute(cnt_cur, axis, perm)
    o = (num / l_tot[..., None]).astype(q.dtype)
    return o, m, l_tot


def _ring_backward(q, k, v, o, m, l, do, axis: str, n_dev: int):
    """The backward ring. All math fp32; one full rotation of
    (k, v, dk, dv) so gradient accumulators arrive back at their owners."""
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    d = q.shape[-1]
    scale = _LOG2E / d**0.5
    qf = q.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    D = jnp.sum(dof * o.astype(jnp.float32), axis=-1)  # (b, h, n_q)

    dq = jnp.zeros(q.shape[:3] + (d,), jnp.float32)
    k_cur, v_cur = k, v
    dk_cur = jnp.zeros_like(k, dtype=jnp.float32)
    dv_cur = jnp.zeros_like(v, dtype=jnp.float32)
    for step in range(n_dev):
        kf = k_cur.astype(jnp.float32)
        vf = v_cur.astype(jnp.float32)
        s2 = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
        p = jnp.exp2(s2 - m[..., None]) / l[..., None]
        dv_cur = dv_cur + jnp.einsum("bhqk,bhqd->bhkd", p, dof)
        dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vf)
        ds = p * (dp - D[..., None]) * (1.0 / d**0.5)  # ln2 * log2e cancels
        dq = dq + jnp.einsum("bhqk,bhkd->bhqd", ds, kf)
        dk_cur = dk_cur + jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
        # rotate kv AND its accumulated grads; after n_dev steps the
        # accumulators complete the cycle and land on their home shard
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        dk_cur = jax.lax.ppermute(dk_cur, axis, perm)
        dv_cur = jax.lax.ppermute(dv_cur, axis, perm)
    return dq.astype(q.dtype), dk_cur.astype(k.dtype), dv_cur.astype(v.dtype)


def make_ring_attention(
    mesh: Mesh,
    axis: str = "seq",
    batch_axes: tuple = ("data", "fsdp"),
    use_pallas: bool = True,
    interpret: bool = False,
    differentiable: bool = False,
    kv_len: Optional[int] = None,
):
    """Build attention with the TOKEN axis sharded over `axis`.

    q, k, v: (b, h, n, d) with n divisible by mesh.shape[axis] (and each
    local shard 128-aligned for the Pallas path on real hardware). The
    batch dim may additionally be sharded over `batch_axes`. Returns the
    fully-assembled (still token-sharded) attention output.

    differentiable=True attaches the backward ring (long-context
    fine-tuning); leave it off for frozen-backbone inference to skip
    residual bookkeeping.

    kv_len: static number of VALID kv positions; positions >= kv_len are
    zero-padding appended by the caller (exact-zero k/v rows, e.g. the
    joint-sequence 128-alignment pad in models/mmdit.py JointAttention).
    Handled by the exact post-hoc (m, l) correction in `_ring_forward` —
    no in-kernel masking needed, so the Pallas fast path is untouched.
    The backward ring is exact without changes: pad columns recompute a
    harmless nonzero p, but it only ever multiplies the zero pad k/v rows
    into dq, and the garbage dk/dv pad rows are sliced away by jnp.pad's
    transpose in the caller.
    """
    n_dev = mesh.shape[axis]
    present = tuple(a for a in batch_axes if a in mesh.axis_names)
    spec = P(present if present else None, None, axis, None)

    def local_stats(q, k, v):
        if use_pallas:
            return flash_attention_with_stats(q, k, v, interpret=interpret)
        return attention_reference_stats(q, k, v)

    def _pad_cnt(n_local):
        """Per-shard () float32 count of pad kv columns on this shard."""
        if kv_len is None or kv_len >= n_local * n_dev:
            return None
        idx = jax.lax.axis_index(axis)
        start = idx * n_local
        return jnp.clip(start + n_local - kv_len, 0, n_local).astype(
            jnp.float32
        )

    @jax.custom_vjp
    def ring_inner(q, k, v):
        o, _, _ = _ring_forward(
            q, k, v, axis, n_dev, local_stats, _pad_cnt(q.shape[2])
        )
        return o

    def ring_fwd(q, k, v):
        o, m, l = _ring_forward(
            q, k, v, axis, n_dev, local_stats, _pad_cnt(q.shape[2])
        )
        return o, (q, k, v, o, m, l)

    def ring_bwd(res, g):
        q, k, v, o, m, l = res
        return _ring_backward(q, k, v, o, m, l, g, axis, n_dev)

    ring_inner.defvjp(ring_fwd, ring_bwd)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,  # pallas out_shapes carry no vma metadata
    )
    def ring_attention(q, k, v):
        if differentiable:
            return ring_inner(q, k, v)
        o, _, _ = _ring_forward(
            q, k, v, axis, n_dev, local_stats, _pad_cnt(q.shape[2])
        )
        return o

    return ring_attention
