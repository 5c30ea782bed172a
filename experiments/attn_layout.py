"""Attention round 4: matmul-bound — try MXU-friendlier K layouts.

Budget probe says exp2/max are fully hidden; QK^T alone runs ~60 TF/s vs
the ~98 TF/s half-fill ceiling. Hypothesis: k arrives as (n_kv, d) so the
contraction needs a per-program transpose; feeding K pre-transposed as
(d, n_kv) gives dot_general the natural (M,K)@(K,N) form.

Run: nohup python experiments/attn_layout.py > /tmp/attn_layout.log 2>&1 &
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


def _mm(a, b_mat):
    return jax.lax.dot_general(a, b_mat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel_kt(q_ref, kt_ref, v_ref, o_ref, *, kv_len, kv_padded, chunk):
    """K arrives transposed: kt_ref is (1, d, n_kv_pad)."""
    q = q_ref[0]
    d = q.shape[-1]
    m = None
    acc = None
    for lo in range(0, kv_padded, chunk):
        hi = min(lo + chunk, kv_padded)
        s = _mm(q, kt_ref[0, :, lo:hi])  # (bq, d) @ (d, ch)
        if hi > kv_len:
            col = lo + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, -1e30)
        v = v_ref[0, lo:hi, :]
        if m is None:
            m = jnp.max(s, axis=-1, keepdims=True)
            acc = _mm(jnp.exp2(s - m).astype(v.dtype), v)
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            acc = acc * alpha + _mm(jnp.exp2(s - m_new).astype(v.dtype), v)
            m = m_new
    o_ref[0] = (acc[:, :d] / acc[:, -1:]).astype(o_ref.dtype)


def _kernel_kt_qkonly(q_ref, kt_ref, v_ref, o_ref, *, kv_len, kv_padded, chunk):
    q = q_ref[0]
    d = q.shape[-1]
    acc = None
    for lo in range(0, kv_padded, chunk):
        hi = min(lo + chunk, kv_padded)
        s = _mm(q, kt_ref[0, :, lo:hi])
        pv = _mm(s[:, :d].astype(v_ref.dtype), v_ref[0, lo:lo + d, :])
        acc = pv if acc is None else acc + pv
    o_ref[0] = acc[:, :d].astype(o_ref.dtype)


def attn_kt(q, k, v, block_q=2240, chunk=640, kernel=_kernel_kt):
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
    kt = k.reshape(bh, n_kv_pad, d).transpose(0, 2, 1)  # (bh, d, n_kv)
    out = pl.pallas_call(
        functools.partial(kernel, kv_len=n_kv, kv_padded=n_kv_pad, chunk=chunk),
        grid=(bh, n_q_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, d, n_kv_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_kv_pad, d + 1), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_q_pad, d), q.dtype),
    )(q.reshape(bh, n_q_pad, d), kt, v_ext.reshape(bh, n_kv_pad, d + 1))
    return out.reshape(b, h, n_q_pad, d)[:, :, :n_q, :]


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
            print(f"{name:36s} {ms:7.3f} ms  {flops/ms/1e9:6.1f} TF/s  maxerr {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

    report("cur (bq2240 ch640)", lambda q, k, v: flash_attention(q, k, v))
    for bq, ch in ((2240, 640), (2240, 1120), (2240, 2240), (1120, 640),
                   (2240, 4480)):
        report(f"kt bq{bq} ch{ch}",
               functools.partial(attn_kt, block_q=bq, chunk=ch))
    report("kt qk_only bq2240 ch640",
           functools.partial(attn_kt, block_q=2240, chunk=640,
                             kernel=_kernel_kt_qkonly), check=False)


if __name__ == "__main__":
    main()
