"""Round-3 attention kernel shootout (SD3 1024px pad-free shape, v5e).

Hypotheses under test (see docs/PERF.md round-2 analysis: both matmul
phases measured ~60 TF/s; VPU hidden):

  vT   transposed layout: S^T = K_chunk @ Q^T and acc^T = V^T @ P^T.
       The PV phase's output becomes (d+1 sublanes, n lanes) instead of
       (n, d+1) — full 128-lane fill instead of 65/128, so PV should run
       ~2x. QK stays contraction-64-bound either way.
  vTb  vT with bf16 scores straight off the MXU (halves VPU bytes; p needs
       no astype pass before PV).
  vI   int8 QK^T (per-row symmetric quantization of q and k outside the
       kernel; v5e MXU int8 is 2x bf16) + fp32 dequant, normal layout.
  vTI  transposed + int8 QK.
  raw  matmul microbenches mapping MXU rate vs contraction/output shape.

Run detached:
  nohup python experiments/attn_round3.py > /tmp/attn_r3.log 2>&1 &
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

LOG2E = 1.4426950408889634


# ---------------- transposed-layout kernel ----------------
def _kernel_T(qt_ref, k_ref, vt_ref, o_ref, *, chunk, kv_padded, score_dtype):
    """Grid (bh, n_blocks). Block: n_lanes query columns (128-mult).

    qt: (d, n_block)      — queries, transposed, prescaled by log2e/sqrt(d)
    k:  (kv_padded, d)    — keys, natural layout (resident)
    vt: (d+1.., kv_padded) — values transposed, row d is the ones row
    o:  (d, n_block)      — output, transposed

    Online softmax along sublanes: s_chunk is (chunk, n_block); running max
    m is (1, n_block); acc is (d_pad, n_block) fp32.
    """
    qt = qt_ref[0]
    dv = vt_ref.shape[1]  # padded d+1 rows of V^T
    m = None
    acc = None
    for start in range(0, kv_padded, chunk):
        k = k_ref[0, start:start + chunk, :]
        vt = vt_ref[0, :, start:start + chunk]
        s = jax.lax.dot_general(
            k, qt, (((1,), (0,)), ((), ())), preferred_element_type=score_dtype
        )  # (chunk, n_block)
        if m is None:
            m = jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp2(s - m)
            # vt @ p: (dv, chunk) x (chunk, n_block) = (dv, n_block)
            acc = jax.lax.dot_general(
                vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2((m - m_new).astype(jnp.float32))
            acc = acc * alpha + jax.lax.dot_general(
                vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_new
    d = o_ref.shape[1]
    o_ref[0] = (acc[:d, :] / acc[d:d + 1, :]).astype(o_ref.dtype)


def attn_T(q, k, v, n_block=640, chunk=640, score_dtype=jnp.float32,
           time_transposes=True):
    b, h, n, d = q.shape
    assert n % 128 == 0 and n % n_block == 0 and n % chunk == 0, (n, n_block, chunk)
    bh = b * h
    qs = (q.astype(jnp.float32) * (LOG2E / d**0.5)).astype(q.dtype)
    qt = jnp.swapaxes(qs, -1, -2).reshape(bh, d, n)  # (bh, d, n)
    # V^T with ones row at index d; pad sublanes to bf16 tile (16)
    dv = ((d + 1 + 15) // 16) * 16
    vt = jnp.swapaxes(v, -1, -2).reshape(bh, d, n)
    ones = jnp.ones((bh, 1, n), v.dtype)
    zeros = jnp.zeros((bh, dv - d - 1, n), v.dtype)
    vt_ext = jnp.concatenate([vt, ones, zeros], axis=1)
    k3 = k.reshape(bh, n, d)

    out = pl.pallas_call(
        functools.partial(_kernel_T, chunk=chunk, kv_padded=n,
                          score_dtype=score_dtype),
        grid=(bh, n // n_block),
        in_specs=[
            pl.BlockSpec((1, d, n_block), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, n_block), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d, n), q.dtype),
    )(qt, k3, vt_ext)
    o = out.reshape(b, h, d, n)
    return jnp.swapaxes(o, -1, -2)  # back to (b, h, n, d)


# ---------------- int8 QK, normal layout ----------------
def _kernel_I(q_ref, sq_ref, k_ref, sk_ref, v_ref, o_ref, *, chunk, kv_padded):
    """q int8 (block_q, d), sq fp32 (block_q, 1) per-row scales;
    k int8 (kv, d), sk fp32 (kv, 1)... sk folded as lane vector (1, kv).
    s_fp32 = (q_i8 @ k_i8^T) * sq * sk. Downstream identical to v2."""
    q = q_ref[0]
    sq = sq_ref[0]  # (block_q, 1)
    d = q.shape[-1]
    m = None
    acc = None
    for start in range(0, kv_padded, chunk):
        k = k_ref[0, start:start + chunk, :]
        sk = sk_ref[0, :, start:start + chunk]  # (1, chunk)
        v = v_ref[0, start:start + chunk, :]
        s32 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        s = s32.astype(jnp.float32) * sq * sk
        if m is None:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            acc = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_new
    dd = o_ref.shape[-1]
    o_ref[0] = (acc[:, :dd] / acc[:, -1:]).astype(o_ref.dtype)


def _quant_rows(x):
    """(bh, n, d) -> int8 values + (bh, n, 1) fp32 scales (symmetric per row)."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(a, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def attn_I(q, k, v, block_q=2240, chunk=640):
    b, h, n, d = q.shape
    bh = b * h
    qs = q.astype(jnp.float32) * (LOG2E / d**0.5)
    qi, sq = _quant_rows(qs.reshape(bh, n, d))
    ki, sk = _quant_rows(k.reshape(bh, n, d))
    sk_row = jnp.swapaxes(sk, -1, -2)  # (bh, 1, n)
    ones = jnp.ones((bh, n, 1), v.dtype)
    v_ext = jnp.concatenate([v.reshape(bh, n, d), ones], axis=-1)

    out = pl.pallas_call(
        functools.partial(_kernel_I, chunk=chunk, kv_padded=n),
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d + 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
    )(qi, sq, ki, sk_row, v_ext)
    return out.reshape(b, h, n, d)


# ---------------- transposed + int8 QK ----------------
def _kernel_TI(qt_ref, sq_ref, k_ref, sk_ref, vt_ref, o_ref, *, chunk,
               kv_padded):
    qt = qt_ref[0]           # int8 (d, n_block)
    sq = sq_ref[0]           # fp32 (1, n_block)
    m = None
    acc = None
    for start in range(0, kv_padded, chunk):
        k = k_ref[0, start:start + chunk, :]            # int8 (chunk, d)
        sk = sk_ref[0, start:start + chunk, :]          # fp32 (chunk, 1)
        vt = vt_ref[0, :, start:start + chunk]
        s32 = jax.lax.dot_general(
            k, qt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )  # (chunk, n_block)
        s = s32.astype(jnp.float32) * sk * sq
        if m is None:
            m = jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp2(s - m)
            acc = jax.lax.dot_general(
                vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            acc = acc * alpha + jax.lax.dot_general(
                vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_new
    d = o_ref.shape[1]
    o_ref[0] = (acc[:d, :] / acc[d:d + 1, :]).astype(o_ref.dtype)


def attn_TI(q, k, v, n_block=640, chunk=640):
    b, h, n, d = q.shape
    bh = b * h
    qs = q.astype(jnp.float32) * (LOG2E / d**0.5)
    qi, sq = _quant_rows(qs.reshape(bh, n, d))
    qt = jnp.swapaxes(qi, -1, -2)                       # (bh, d, n) int8
    sqt = jnp.swapaxes(sq, -1, -2)                      # (bh, 1, n)
    ki, sk = _quant_rows(k.reshape(bh, n, d))           # (bh, n, d), (bh, n, 1)
    dv = ((d + 1 + 15) // 16) * 16
    vt = jnp.swapaxes(v.reshape(bh, n, d), -1, -2)
    ones = jnp.ones((bh, 1, n), v.dtype)
    zeros = jnp.zeros((bh, dv - d - 1, n), v.dtype)
    vt_ext = jnp.concatenate([vt, ones, zeros], axis=1)

    out = pl.pallas_call(
        functools.partial(_kernel_TI, chunk=chunk, kv_padded=n),
        grid=(bh, n // n_block),
        in_specs=[
            pl.BlockSpec((1, d, n_block), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_block), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, n_block), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d, n), q.dtype),
    )(qt, sqt, ki, sk, vt_ext)
    return jnp.swapaxes(out.reshape(b, h, d, n), -1, -2)


# ---------------- raw matmul microbench ----------------
def _mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def raw_mm(m, kdim, n, dtype=jnp.bfloat16, reps=50):
    a = jnp.ones((m, kdim), dtype)
    b_ = jnp.ones((kdim, n), dtype)

    f = pl.pallas_call(
        _mm_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), dtype),
    )

    @jax.jit
    def loop(a, b_):
        def body(i, x):
            o = f(x, b_)
            return a + o[:1, :1].astype(a.dtype) * 0 + o[0, 0].astype(a.dtype) * 1e-9
        return jax.lax.fori_loop(0, reps, body, a)

    float(loop(a, b_)[0, 0])
    t0 = time.perf_counter()
    float(loop(a, b_)[0, 0])
    ms = (time.perf_counter() - t0) / reps * 1000
    tf = 2 * m * kdim * n / ms / 1e9
    print(f"raw mm ({m},{kdim})x({kdim},{n}) {str(dtype.__name__ if hasattr(dtype,'__name__') else dtype):9s} "
          f"{ms:7.3f} ms {tf:6.1f} TF/s", flush=True)


def _mm_kernel_i8(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def raw_mm_i8(m, kdim, n, reps=50):
    a = jnp.ones((m, kdim), jnp.int8)
    b_ = jnp.ones((kdim, n), jnp.int8)
    f = pl.pallas_call(
        _mm_kernel_i8,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
    )

    @jax.jit
    def loop(a, b_):
        def body(i, x):
            o = f(x, b_)
            return jnp.where(o[:1, :1] > 10**9, x ^ 1, x)
        return jax.lax.fori_loop(0, reps, body, a)

    int(loop(a, b_)[0, 0])
    t0 = time.perf_counter()
    int(loop(a, b_)[0, 0])
    ms = (time.perf_counter() - t0) / reps * 1000
    tf = 2 * m * kdim * n / ms / 1e9
    print(f"raw mm ({m},{kdim})x({kdim},{n}) int8      {ms:7.3f} ms {tf:6.1f} TOP/s",
          flush=True)


def _sync(x):
    return float(x.reshape(-1)[0])


def time_fn(f, q, k, v, reps=30):
    @jax.jit
    def loop(q, k, v):
        def body(i, x):
            o = f(x, k, v)
            return q + o[0, 0, 0, :1].astype(q.dtype)
        return jax.lax.fori_loop(0, reps, body, q)

    _sync(loop(q, k, v))
    t0 = time.perf_counter()
    _sync(loop(q, k, v))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    b, h, n, d = 2, 24, 4480, 64  # pad-free prod shape
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
            of = out.astype(jnp.float32)
            rf = ref.astype(jnp.float32)
            err = float(jnp.max(jnp.abs(of - rf)))
            rel = float(jnp.linalg.norm(of - rf) / jnp.linalg.norm(rf))
            ms = time_fn(jax.jit(f), q, k, v)
            print(f"{name:36s} {ms:7.3f} ms  {flops/ms/1e9:6.1f} TF/s  "
                  f"maxerr {err:.2e} rel {rel:.2e}", flush=True)
        except Exception as e:
            print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    print("== raw matmul rates ==", flush=True)
    raw_mm(2240, 64, 640)        # QK phase shape (per chunk)
    raw_mm(2240, 128, 640)       # same with d=128 (contraction headroom map)
    raw_mm(2240, 640, 128)       # PV-like: output 128 wide
    raw_mm(2240, 640, 64)        # PV phase as-is (output 64+1 -> 128 pad)
    raw_mm(640, 640, 4480)       # transposed PV: (dv, ch) x (ch, n)... approx
    raw_mm(128, 640, 4480)
    raw_mm(640, 64, 640)         # transposed QK chunk
    raw_mm_i8(2240, 64, 640)
    raw_mm_i8(640, 64, 640)

    print("== kernels ==", flush=True)
    report("v2 current (bq2240 ch640)", lambda q, k, v: flash_attention(q, k, v))
    for nb, ch in ((640, 640), (896, 640), (4480, 128), (640, 896)):
        report(f"vT fp32 nb{nb} ch{ch}",
               functools.partial(attn_T, n_block=nb, chunk=ch))
    for nb, ch in ((640, 640), (896, 896), (640, 896)):
        report(f"vTb bf16 nb{nb} ch{ch}",
               functools.partial(attn_T, n_block=nb, chunk=ch,
                                 score_dtype=jnp.bfloat16))
    report("vI int8qk (bq2240 ch640)", attn_I)
    for nb, ch in ((640, 640), (896, 896)):
        report(f"vTI int8+T nb{nb} ch{ch}",
               functools.partial(attn_TI, n_block=nb, chunk=ch))


if __name__ == "__main__":
    main()
