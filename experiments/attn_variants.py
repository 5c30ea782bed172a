"""Attention kernel variant shootout on the real chip (SD3 1024px shape).

Variants (all produce identical softmax(QK^T/sqrt(d))V up to fp tolerance):
  v0  current resident kernel (row softmax, ones-column denominator)
  v1  prescaled q (scale*log2e folded outside) + exp2 instead of exp
  v2  v1 + kv-chunked unrolled online softmax (MXU/VPU overlap)
  v3  v1 + kv-chunked, max-free: per-row upper bound rb >= rowmax passed in,
      p = exp2(s - rb), pure accumulation (no running max / alpha rescale)

Run detached: nohup python experiments/attn_variants.py > /tmp/attn_var.log 2>&1 &
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpdm_tpu.ops.attention import attention_reference, flash_attention

_NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------- v1: resident, prescaled q + exp2 ----------------
def _kernel_v1(q_ref, k_ref, v_ref, o_ref, *, kv_len, kv_padded):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    d = q.shape[-1]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len < kv_padded:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o[:, :d] / o[:, -1:]).astype(o_ref.dtype)


# ---------------- v2: chunked online softmax, exp2 ----------------
def _kernel_v2(q_ref, k_ref, v_ref, o_ref, *, kv_len, kv_padded, chunk):
    q = q_ref[0]
    d = q.shape[-1]
    n_chunks = kv_padded // chunk
    m = None
    acc = None
    for t in range(n_chunks):
        k = k_ref[0, t * chunk:(t + 1) * chunk, :]
        v = v_ref[0, t * chunk:(t + 1) * chunk, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if (t + 1) * chunk > kv_len:
            col = t * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        if t == 0:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            acc = jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = m_new
    o_ref[0] = (acc[:, :d] / acc[:, -1:]).astype(o_ref.dtype)


# ---------------- v3: chunked, max-free with row bound ----------------
def _kernel_v3(q_ref, rb_ref, k_ref, v_ref, o_ref, *, kv_len, kv_padded, chunk):
    q = q_ref[0]
    rb = rb_ref[0]  # (block_q, 1) fp32, rb >= rowmax of prescaled scores
    d = q.shape[-1]
    n_chunks = kv_padded // chunk
    acc = None
    for t in range(n_chunks):
        k = k_ref[0, t * chunk:(t + 1) * chunk, :]
        v = v_ref[0, t * chunk:(t + 1) * chunk, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if (t + 1) * chunk > kv_len:
            col = t * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        p = jnp.exp2(s - rb)
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = pv if t == 0 else acc + pv
    o_ref[0] = (acc[:, :d] / acc[:, -1:]).astype(o_ref.dtype)


def _prep(q, k, v, kv_len, block_q):
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    kv_len = n_kv if kv_len is None else kv_len
    n_q_pad = _round_up(n_q, block_q)
    n_kv_pad = _round_up(n_kv, 128)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, n_q_pad - n_q), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, n_kv_pad - n_kv), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, n_kv_pad - n_kv), (0, 0)))
    ones = jnp.ones(v.shape[:-1] + (1,), v.dtype)
    if kv_len < n_kv_pad:
        rowmask = (jnp.arange(n_kv_pad) < kv_len).astype(v.dtype)
        ones = ones * rowmask[None, None, :, None]
    v_ext = jnp.concatenate([v, ones], axis=-1)
    bh = b * h
    return (q.reshape(bh, n_q_pad, d), k.reshape(bh, n_kv_pad, d),
            v_ext.reshape(bh, n_kv_pad, d + 1), kv_len, n_q_pad, n_kv_pad, bh)


def attn_v1(q, k, v, kv_len=None, block_q=640):
    b, h, n_q, d = q.shape
    qs = (q.astype(jnp.float32) * (LOG2E / d**0.5)).astype(q.dtype)
    q3, k3, v3, kv_len, n_q_pad, n_kv_pad, bh = _prep(qs, k, v, kv_len, block_q)
    out = pl.pallas_call(
        functools.partial(_kernel_v1, kv_len=kv_len, kv_padded=n_kv_pad),
        grid=(bh, n_q_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_kv_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_kv_pad, d + 1), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
    )(q3, k3, v3)
    return out.reshape(b, h, n_q_pad, d)[:, :, :n_q, :]


def attn_v2(q, k, v, kv_len=None, block_q=1120, chunk=1120):
    b, h, n_q, d = q.shape
    qs = (q.astype(jnp.float32) * (LOG2E / d**0.5)).astype(q.dtype)
    q3, k3, v3, kv_len, n_q_pad, n_kv_pad, bh = _prep(qs, k, v, kv_len, block_q)
    assert n_kv_pad % chunk == 0, (n_kv_pad, chunk)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, kv_len=kv_len, kv_padded=n_kv_pad,
                          chunk=chunk),
        grid=(bh, n_q_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_kv_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_kv_pad, d + 1), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
    )(q3, k3, v3)
    return out.reshape(b, h, n_q_pad, d)[:, :, :n_q, :]


def attn_v3(q, k, v, kv_len=None, block_q=1120, chunk=1120):
    b, h, n_q, d = q.shape
    qs = (q.astype(jnp.float32) * (LOG2E / d**0.5)).astype(q.dtype)
    # per-row bound: |q_i|_2 * max_j |k_j|_2 (prescaled domain, fp32)
    qn = jnp.linalg.norm(qs.astype(jnp.float32), axis=-1)  # (b,h,nq)
    kn = jnp.max(jnp.linalg.norm(k.astype(jnp.float32), axis=-1), axis=-1)
    rb = qn * kn[..., None]  # (b,h,nq)
    q3, k3, v3, kv_len, n_q_pad, n_kv_pad, bh = _prep(qs, k, v, kv_len, block_q)
    rb = jnp.pad(rb, ((0, 0), (0, 0), (0, n_q_pad - rb.shape[-1])))
    rb3 = rb.reshape(bh, n_q_pad, 1).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel_v3, kv_len=kv_len, kv_padded=n_kv_pad,
                          chunk=chunk),
        grid=(bh, n_q_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_kv_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_kv_pad, d + 1), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
    )(q3, rb3, k3, v3)
    return out.reshape(b, h, n_q_pad, d)[:, :, :n_q, :]


def _kernel_v4(q_ref, k_ref, v_ref, o_ref, *, kv_padded, chunk):
    """Chunked online softmax, NO masking: padded k rows are zeros (s=0) and
    the ones column is zeroed there, so numerator and denominator are exact
    for any running max m (softmax is shift-invariant given a shared m)."""
    q = q_ref[0]
    d = q.shape[-1]
    n_chunks = kv_padded // chunk
    m = None
    acc = None
    for t in range(n_chunks):
        k = k_ref[0, t * chunk:(t + 1) * chunk, :]
        v = v_ref[0, t * chunk:(t + 1) * chunk, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if t == 0:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            acc = jax.lax.dot_general(p.astype(v.dtype), v,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = m_new
    o_ref[0] = (acc[:, :d] / acc[:, -1:]).astype(o_ref.dtype)


def attn_v4(q, k, v, kv_len=None, block_q=2240, chunk=640):
    b, h, n_q, d = q.shape
    qs = (q.astype(jnp.float32) * (LOG2E / d**0.5)).astype(q.dtype)
    q3, k3, v3, kv_len, n_q_pad, n_kv_pad, bh = _prep(qs, k, v, kv_len, block_q)
    assert n_kv_pad % chunk == 0
    out = pl.pallas_call(
        functools.partial(_kernel_v4, kv_padded=n_kv_pad, chunk=chunk),
        grid=(bh, n_q_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_kv_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_kv_pad, d + 1), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
    )(q3, k3, v3)
    return out.reshape(b, h, n_q_pad, d)[:, :, :n_q, :]


def _sync(x):
    # ONE element readback: np.asarray(full array) would drag ~27MB through
    # the tunnel (~1.5s) and poison the timing (CLAUDE.md gotcha).
    return float(x.reshape(-1)[0])


def time_fn(f, q, k, v, reps=30):
    # One jitted dispatch containing `reps` data-chained kernel calls: the
    # tunnel's ~90ms per-dispatch latency would otherwise swamp a ~4ms kernel.
    @jax.jit
    def loop(q, k, v):
        def body(i, x):
            o = f(x, k, v)
            return q + o[0, 0, 0, :1].astype(q.dtype)  # tiny data dependency
        return jax.lax.fori_loop(0, reps, body, q)

    _sync(loop(q, k, v))  # compile + warm
    t0 = time.perf_counter()
    _sync(loop(q, k, v))
    return (time.perf_counter() - t0) / reps * 1000  # ms


def main():
    b, h, n, d = 2, 24, 4429, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(kv_, (b, h, n, d), jnp.bfloat16)
    ref = attention_reference(q, k, v)
    flops = 4 * b * h * n * n * d

    def report(name, f):
        try:
            out = jax.jit(f)(q, k, v)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            ms = time_fn(jax.jit(f), q, k, v)
            print(f"{name:40s} {ms:7.3f} ms  {flops/ms/1e9:6.1f} TF/s  maxerr {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    report("v0 current (bq640)", lambda q, k, v: flash_attention(q, k, v))
    for bq, ch in ((2240, 640), (4480, 640), (2240, 448), (2240, 896),
                   (1120, 448), (2240, 320), (1120, 896)):
        if 4480 % ch == 0:
            report(f"v2 chunked bq{bq} ch{ch}",
                   functools.partial(attn_v2, block_q=bq, chunk=ch))
    # v4: no in-kernel mask — padded K rows are zeros and the ones column is
    # already zeroed there, so o/l is exact for any running max
    for bq, ch in ((2240, 640), (1120, 640), (4480, 640), (2240, 448)):
        report(f"v4 nomask bq{bq} ch{ch}",
               functools.partial(attn_v4, block_q=bq, chunk=ch))


if __name__ == "__main__":
    main()
