"""Attention round 5: kill the remaining HBM copies around the kernel.

In-model, attention cost = transposes (b,n,h*d)->(b,h,n,d) for q/k/v +
output transpose + ones-column concat + kernel core. Variants:

  pad4429   — old path (kernel pads internally)
  exact4480 — current in-model path (no pads, kv_len mask)
  vsum      — no ones column: denominator via VPU row-sum (saves V concat)
  packed2   — kernel consumes (b, n, h*d) DIRECTLY, two heads per program
              (128-lane blocks), vsum; saves all four transposes

packed2 is timed from the (b, n, h*d) layout; others include the transpose
from that layout, so numbers are apples-to-apples for the in-model cost.

Run: nohup python experiments/attn_nocopy.py > /tmp/attn_nocopy.log 2>&1 &
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from tpdm_tpu.ops.attention import _LOG2E, attention_reference, flash_attention

B, H, D = 2, 24, 64
N_REAL, N_PAD = 4429, 4480


def _mm(a, b_mat):
    return jax.lax.dot_general(a, b_mat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _qk(q, k):
    return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _heads(t):  # (b, n, h*d) -> (b, h, n, d)
    b, n, _ = t.shape
    return t.reshape(b, n, H, D).transpose(0, 2, 1, 3)


def _unheads(t):  # (b, h, n, d) -> (b, n, h*d)
    b, h, n, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, n, h * d)


# ---------------- vsum: no ones column ----------------
def _kernel_vsum(q_ref, k_ref, v_ref, o_ref, *, kv_len, kv_padded, chunk):
    q = q_ref[0]
    d = q.shape[-1]
    m = None
    acc = None
    l = None
    for lo in range(0, kv_padded, chunk):
        hi = min(lo + chunk, kv_padded)
        s = _qk(q, k_ref[0, lo:hi, :])
        if hi > kv_len:
            col = lo + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, -1e30)
        v = v_ref[0, lo:hi, :]
        if m is None:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = _mm(p.astype(v.dtype), v)
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp2(m - m_new)
            p = jnp.exp2(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + _mm(p.astype(v.dtype), v)
            m = m_new
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def attn_vsum(q4, k4, v4, kv_len=N_REAL, block_q=1120, chunk=640):
    b, h, n, d = q4.shape
    q4 = (q4.astype(jnp.float32) * (_LOG2E / d**0.5)).astype(q4.dtype)
    bh = b * h
    out = pl.pallas_call(
        functools.partial(_kernel_vsum, kv_len=kv_len, kv_padded=n, chunk=chunk),
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q4.dtype),
    )(q4.reshape(bh, n, d), k4.reshape(bh, n, d), v4.reshape(bh, n, d))
    return out.reshape(b, h, n, d)


# ---------------- packed2: (b, n, h*d) direct, 2 heads/program ----------------
def _kernel_packed2(q_ref, k_ref, v_ref, o_ref, *, kv_len, kv_padded, chunk):
    d = D
    for head in range(2):
        q = q_ref[0, :, head * d:(head + 1) * d]
        m = None
        acc = None
        l = None
        for lo in range(0, kv_padded, chunk):
            hi = min(lo + chunk, kv_padded)
            s = _qk(q, k_ref[0, lo:hi, head * d:(head + 1) * d])
            if hi > kv_len:
                col = lo + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < kv_len, s, -1e30)
            v = v_ref[0, lo:hi, head * d:(head + 1) * d]
            if m is None:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                acc = _mm(p.astype(v.dtype), v)
            else:
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp2(m - m_new)
                p = jnp.exp2(s - m_new)
                l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                acc = acc * alpha + _mm(p.astype(v.dtype), v)
                m = m_new
        o_ref[0, :, head * d:(head + 1) * d] = (acc / l).astype(o_ref.dtype)


def attn_packed2(q2, k2, v2, kv_len=N_REAL, block_q=1120, chunk=640):
    """q2/k2/v2: (b, n, h*d) — the projection output layout, no transpose."""
    b, n, hd = q2.shape
    q2 = (q2.astype(jnp.float32) * (_LOG2E / D**0.5)).astype(q2.dtype)
    out = pl.pallas_call(
        functools.partial(_kernel_packed2, kv_len=kv_len, kv_padded=n,
                          chunk=chunk),
        grid=(b, H // 2, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * D), lambda bi, hi, j: (bi, j, hi)),
            pl.BlockSpec((1, n, 2 * D), lambda bi, hi, j: (bi, 0, hi)),
            pl.BlockSpec((1, n, 2 * D), lambda bi, hi, j: (bi, 0, hi)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, 2 * D), lambda bi, hi, j: (bi, j, hi)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), q2.dtype),
    )(q2, k2, v2)
    return out


def _sync(x):
    return float(x.reshape(-1)[0])


def time_fn(f, args, reps=30):
    @jax.jit
    def loop(*args):
        def body(i, x):
            o = f(x, *args[1:])
            return args[0] + 0.0 * o.reshape(-1)[0].astype(args[0].dtype)
        return jax.lax.fori_loop(0, reps, body, args[0])

    _sync(loop(*args))
    t0 = time.perf_counter()
    _sync(loop(*args))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(0), 3)
    # (b, n, h*d) packed layout with zero tail rows, as the model produces
    q2 = jax.random.normal(kq, (B, N_PAD, H * D), jnp.bfloat16)
    k2 = jax.random.normal(kk, (B, N_PAD, H * D), jnp.bfloat16)
    v2 = jax.random.normal(kv_, (B, N_PAD, H * D), jnp.bfloat16)
    zero_tail = (jnp.arange(N_PAD) < N_REAL)[None, :, None]
    q2, k2, v2 = (jnp.where(zero_tail, t, 0) for t in (q2, k2, v2))

    ref = _unheads(
        attention_reference(_heads(q2), _heads(k2), _heads(v2), N_REAL)
    )[:, :N_REAL]
    flops = 4 * B * H * N_REAL * N_REAL * D

    def report(name, f, args):
        try:
            out = jax.jit(f)(*args)
            err = float(jnp.max(jnp.abs(
                out[:, :N_REAL].astype(jnp.float32) - ref.astype(jnp.float32)
            )))
            ms = time_fn(jax.jit(f), args)
            print(f"{name:30s} {ms:7.3f} ms  {flops/ms/1e9:6.1f} TF/s  maxerr {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:30s} FAILED: {str(e)[:140]}", flush=True)

    def exact(q2, k2, v2):
        return _unheads(flash_attention(_heads(q2), _heads(k2), _heads(v2), N_REAL))

    def pad_path(q2, k2, v2):
        qh, kh, vh = (_heads(t)[:, :, :N_REAL] for t in (q2, k2, v2))
        return _unheads(flash_attention(qh, kh, vh))

    def vsum(q2, k2, v2):
        return _unheads(attn_vsum(_heads(q2), _heads(k2), _heads(v2), N_REAL))

    report("pad4429 (old)", pad_path, (q2, k2, v2))
    report("exact4480 (current)", exact, (q2, k2, v2))
    report("vsum", vsum, (q2, k2, v2))
    for bq, ch in ((1120, 640), (2240, 640), (640, 640), (1120, 1120)):
        report(f"packed2 bq{bq} ch{ch}",
               functools.partial(attn_packed2, block_q=bq, chunk=ch),
               (q2, k2, v2))


if __name__ == "__main__":
    main()
