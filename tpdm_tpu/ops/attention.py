"""Attention for the joint image+text sequence: Pallas TPU kernel + reference.

The MMDiT hot path is full (non-causal) attention over ~4429 tokens
(4096 image + 333 text) at head_dim 64. The reference leans on torch SDPA /
FusedJointAttnProcessor2_0 (reference:
src/models/stable_diffusion_3/transformer_sd3.py:28,279); here the forward
runs as a Pallas kernel that never materializes the (n, n) score matrix in
HBM: one q-block row of fp32 scores lives in VMEM, K/V stay resident, and
softmax+PV run fused.

Because the backbone is frozen in TPDM training (only the TPM gets
gradients), the backward pass is off the hot path: a custom_vjp recomputes
attention with the jnp reference for grads.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[int] = None,
) -> jax.Array:
    """Plain jnp attention (fp32 softmax). q,k,v: (b, h, n, d)."""
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if kv_len is not None and kv_len < k.shape[2]:
        mask = jnp.arange(k.shape[2]) < kv_len
        s = jnp.where(mask[None, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, kv_padded: int):
    """One (batch·head, q-block) program: row softmax over resident K/V.

    V arrives with a ones column appended (masked rows zeroed), so the
    softmax denominator falls out of the PV matmul for free — the lane is
    part of the 128-lane padding anyway, and dropping the separate VPU sum
    pass is worth ~10% on the 4429-token SD3 shape.
    """
    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (kv_padded, d)
    v = v_ref[0]  # (kv_padded, d+1) — last lane is the ones column
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    if kv_len < kv_padded:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l = o[:, -1:]
    o_ref[0] = (o[:, :d] / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_attention_fwd_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[int],
    block_q: int,
    interpret: bool,
) -> jax.Array:
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    if kv_len is None:
        kv_len = n_kv

    block_q = min(block_q, _round_up(n_q, 128))
    n_q_pad = _round_up(n_q, block_q)
    n_kv_pad = _round_up(n_kv, 128)

    if n_q_pad != n_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, n_q_pad - n_q), (0, 0)))
    if n_kv_pad != n_kv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, n_kv_pad - n_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, n_kv_pad - n_kv), (0, 0)))

    # ones column for the in-matmul softmax denominator (zeroed on masked rows)
    ones = jnp.ones(v.shape[:-1] + (1,), v.dtype)
    if kv_len < n_kv_pad:
        rowmask = (jnp.arange(n_kv_pad) < kv_len).astype(v.dtype)
        ones = ones * rowmask[None, None, :, None]
    v_ext = jnp.concatenate([v, ones], axis=-1)

    bh = b * h
    q3 = q.reshape(bh, n_q_pad, d)
    k3 = k.reshape(bh, n_kv_pad, d)
    v3 = v_ext.reshape(bh, n_kv_pad, d + 1)

    grid = (bh, n_q_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=kv_len, kv_padded=n_kv_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_kv_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_kv_pad, d + 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_q_pad * n_kv_pad * d,
            bytes_accessed=(2 * bh * n_q_pad * d + 2 * bh * n_kv_pad * d)
            * q.dtype.itemsize,
            transcendentals=bh * n_q_pad * n_kv_pad,
        ),
    )(q3, k3, v3)

    out = out.reshape(b, h, n_q_pad, d)
    return out[:, :, :n_q, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[int] = None,
    block_q: int = 640,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention. q,k,v: (b, h, n, d); returns (b, h, n_q, d).

    Args:
        kv_len: number of valid kv positions (static); positions >= kv_len
            are masked. None = all valid.
        block_q: q-tile rows per program (>=128 multiple).
        interpret: run the kernel in the Pallas interpreter (CPU testing).
    """
    return _flash_attention_fwd_impl(q, k, v, kv_len, block_q, interpret)


def _fwd(q, k, v, kv_len, block_q, interpret):
    return _flash_attention_fwd_impl(q, k, v, kv_len, block_q, interpret), (q, k, v)


def _bwd(kv_len, block_q, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v, kv_len), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


def joint_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_len: Optional[int] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Dispatch to the Pallas kernel on TPU, jnp reference elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu", "gpu")
    if use_pallas:
        return flash_attention(q, k, v, kv_len)
    return attention_reference(q, k, v, kv_len)
