"""Attention round 3: squeeze MXU/VPU overlap on the chunked kernel.

Budget probe at the SD3 shape (isolated kernel at 4.10ms, ~59 TF/s):
perfect overlap would bound the kernel by max(MXU ~2.5ms, VPU ~2.3ms).

Variants:
  cur        — production kernel (chunked online softmax, bq2240 ch640)
  prefetch   — next chunk's QK^T issued BEFORE consuming the current one
  ch512/768  — ragged chunk sizes (schedule granularity)
  qk_only    — matmuls only (MXU budget; no exp/max, result = last s col)
  noexp      — full dataflow but exp2 replaced by (s - m) (VPU minus exp)

Run: nohup python experiments/attn_overlap.py > /tmp/attn_overlap.log 2>&1 &
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from tpdm_tpu.ops.attention import (
    _LOG2E,
    _round_up,
    attention_reference,
    flash_attention,
)


def _prep(q, k, v, block_q):
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    q = (q.astype(jnp.float32) * (_LOG2E / d**0.5)).astype(q.dtype)
    n_q_pad = _round_up(n_q, block_q)
    n_kv_pad = _round_up(n_kv, 128)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, n_q_pad - n_q), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, n_kv_pad - n_kv), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, n_kv_pad - n_kv), (0, 0)))
    ones = jnp.ones(v.shape[:-1] + (1,), v.dtype)
    if n_kv < n_kv_pad:
        rowmask = (jnp.arange(n_kv_pad) < n_kv).astype(v.dtype)
        ones = ones * rowmask[None, None, :, None]
    v_ext = jnp.concatenate([v, ones], axis=-1)
    bh = b * h
    return (q.reshape(bh, n_q_pad, d), k.reshape(bh, n_kv_pad, d),
            v_ext.reshape(bh, n_kv_pad, d + 1), n_kv, n_q_pad, n_kv_pad, bh)


def _mm(a, b_mat):
    return jax.lax.dot_general(a, b_mat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _qk(q, k):
    return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel_prefetch(q_ref, k_ref, v_ref, o_ref, *, kv_len, kv_padded, chunk):
    """Next chunk's QK^T issued before the current chunk's exp/PV."""
    q = q_ref[0]
    d = q.shape[-1]
    bounds = [(s, min(s + chunk, kv_padded)) for s in range(0, kv_padded, chunk)]

    def score(t):
        lo, hi = bounds[t]
        s = _qk(q, k_ref[0, lo:hi, :])
        if hi > kv_len:
            col = lo + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, -1e30)
        return s

    s_cur = score(0)
    m = None
    acc = None
    for t in range(len(bounds)):
        s_next = score(t + 1) if t + 1 < len(bounds) else None
        lo, hi = bounds[t]
        v = v_ref[0, lo:hi, :]
        if m is None:
            m = jnp.max(s_cur, axis=-1, keepdims=True)
            acc = _mm(jnp.exp2(s_cur - m).astype(v.dtype), v)
        else:
            m_new = jnp.maximum(m, jnp.max(s_cur, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            acc = acc * alpha + _mm(jnp.exp2(s_cur - m_new).astype(v.dtype), v)
            m = m_new
        s_cur = s_next
    o_ref[0] = (acc[:, :d] / acc[:, -1:]).astype(o_ref.dtype)


def _kernel_qk_only(q_ref, k_ref, v_ref, o_ref, *, kv_len, kv_padded, chunk):
    q = q_ref[0]
    d = q.shape[-1]
    acc = None
    for lo in range(0, kv_padded, chunk):
        hi = min(lo + chunk, kv_padded)
        s = _qk(q, k_ref[0, lo:hi, :])
        pv = _mm(s[:, :d].astype(v_ref.dtype), v_ref[0, lo:lo + d, :])
        acc = pv if acc is None else acc + pv
    o_ref[0] = acc[:, :d].astype(o_ref.dtype)


def _kernel_noexp(q_ref, k_ref, v_ref, o_ref, *, kv_len, kv_padded, chunk):
    q = q_ref[0]
    d = q.shape[-1]
    m = None
    acc = None
    for lo in range(0, kv_padded, chunk):
        hi = min(lo + chunk, kv_padded)
        s = _qk(q, k_ref[0, lo:hi, :])
        v = v_ref[0, lo:hi, :]
        if m is None:
            m = jnp.max(s, axis=-1, keepdims=True)
            acc = _mm((s - m).astype(v.dtype), v)
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            acc = acc * (m - m_new) + _mm((s - m_new).astype(v.dtype), v)
            m = m_new
    o_ref[0] = (acc[:, :d] / (acc[:, -1:] + 1.0)).astype(o_ref.dtype)


def make_runner(kernel, block_q, chunk):
    def run(q, k, v):
        b, h, n_q, d = q.shape
        q3, k3, v3, kv_len, n_q_pad, n_kv_pad, bh = _prep(q, k, v, block_q)
        out = pl.pallas_call(
            functools.partial(kernel, kv_len=kv_len, kv_padded=n_kv_pad,
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

    return run


def _sync(x):
    return float(x.reshape(-1)[0])


def time_fn(f, q, k, v, reps=30):
    @jax.jit
    def loop(q, k, v):
        def body(i, x):
            o = f(x, k, v)
            return q + 0.0 * o.reshape(-1)[0].astype(q.dtype)
        return jax.lax.fori_loop(0, reps, body, q)

    _sync(loop(q, k, v))
    t0 = time.perf_counter()
    _sync(loop(q, k, v))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    b, h, n, d = 2, 24, 4429, 64
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(kv_, (b, h, n, d), jnp.bfloat16)
    ref = attention_reference(q, k, v)
    flops = 4 * b * h * n * n * d

    def report(name, f, check=True):
        try:
            out = jax.jit(f)(q, k, v)
            err = (float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                         - ref.astype(jnp.float32))))
                   if check else float("nan"))
            ms = time_fn(jax.jit(f), q, k, v)
            print(f"{name:34s} {ms:7.3f} ms  {flops/ms/1e9:6.1f} TF/s  maxerr {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

    report("cur (bq2240 ch640)", lambda q, k, v: flash_attention(q, k, v))
    for bq, ch in ((2240, 640), (2240, 512), (2240, 768), (1120, 640)):
        report(f"prefetch bq{bq} ch{ch}",
               make_runner(_kernel_prefetch, bq, ch))
    report("qk_only bq2240 ch640 (MXU budget)",
           make_runner(_kernel_qk_only, 2240, 640), check=False)
    report("noexp bq2240 ch640 (VPU-exp budget)",
           make_runner(_kernel_noexp, 2240, 640), check=False)


if __name__ == "__main__":
    main()
