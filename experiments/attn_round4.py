"""Round-4 attention sweep: chunk_kv in the TRANSPOSED kernel + a
two-stream split-softmax variant.

The transposed kernel (docs/PERF.md round 3) runs at 77 TF/s with
chunk_kv=128 — a value inherited from the natural-layout kernel, never
swept after the transpose. Two untried knobs:

1. chunk_kv: bigger chunks mean fewer, deeper QK matmuls
   ((chunk, 64) x (64, n)) and fewer rescale passes; 4480 = 128*35 so
   the divisor-respecting candidates are 320/640/896/2240.
2. split-softmax: the online-softmax chunk walk is SERIAL in
   (m, acc) — chunk t+1's alpha-rescale waits on chunk t. Two
   independent streams over interleaved chunk sets have no cross-stream
   dependency, so Mosaic can overlap one stream's exp2/PV with the
   other's QK; exact merge at the end (same math as the ring-attention
   shard merge).

Hoist-proof methodology (PERF.md): the kernel output feeds the next
iteration's qt, zero layout ops in the loop.

Run: nohup python experiments/attn_round4.py > /tmp/attn_round4.log 2>&1 &
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpdm_tpu.ops.attention import _flash_kernel

LOG2E = 1.4426950408889634
B, H, N, D = 2, 24, 4480, 64
DV = 80


def kernel_call(qt, k3, vt_ext, chunk=128):
    bh = qt.shape[0]
    return pl.pallas_call(
        functools.partial(_flash_kernel, kv_padded=N, chunk_kv=chunk),
        grid=(bh, 1),
        in_specs=[
            pl.BlockSpec((1, D, N), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DV, N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, N), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, D, N), qt.dtype),
    )(qt, k3, vt_ext)


def _split_kernel(qt_ref, k_ref, vt_ref, o_ref, *, kv_padded, chunk_kv):
    """Two independent online-softmax streams over interleaved chunks,
    merged exactly at the end: stream A takes chunks 0,2,4,... stream B
    takes 1,3,5,... — no serial (m, acc) dependency between streams."""
    qt = qt_ref[0]
    streams = [None, None]  # (m, acc) per stream
    starts = list(range(0, kv_padded, chunk_kv))
    for idx, start in enumerate(starts):
        sid = idx % 2
        k = k_ref[0, start:start + chunk_kv, :]
        vt = vt_ref[0, :, start:start + chunk_kv]
        s = jax.lax.dot_general(
            k, qt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if streams[sid] is None:
            m = jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp2(s - m)
            acc = jax.lax.dot_general(
                vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            streams[sid] = (m, acc)
        else:
            m_prev, acc_prev = streams[sid]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            acc = acc_prev * alpha + jax.lax.dot_general(
                vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            streams[sid] = (m_new, acc)
    (ma, acca), (mb, accb) = streams
    m_star = jnp.maximum(ma, mb)
    acc = acca * jnp.exp2(ma - m_star) + accb * jnp.exp2(mb - m_star)
    d = o_ref.shape[1]
    o_ref[0] = (acc[:d, :] / acc[d:d + 1, :]).astype(o_ref.dtype)


def split_call(qt, k3, vt_ext, chunk=128):
    bh = qt.shape[0]
    return pl.pallas_call(
        functools.partial(_split_kernel, kv_padded=N, chunk_kv=chunk),
        grid=(bh, 1),
        in_specs=[
            pl.BlockSpec((1, D, N), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DV, N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, N), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, D, N), qt.dtype),
    )(qt, k3, vt_ext)


def _sync(x):
    return float(x.reshape(-1)[0].astype(jnp.float32))


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    bh = B * H
    scale = LOG2E / D**0.5
    qt = (jax.random.normal(kq, (bh, D, N), jnp.float32) * scale).astype(jnp.bfloat16)
    k3 = jax.random.normal(kk, (bh, N, D), jnp.bfloat16)
    vt = jax.random.normal(kv_, (bh, D, N), jnp.bfloat16)
    ones = jnp.ones((bh, 1, N), jnp.bfloat16)
    zeros = jnp.zeros((bh, DV - D - 1, N), jnp.bfloat16)
    vt_ext = jnp.concatenate([vt, ones, zeros], axis=1)

    flops = 4 * bh * N * N * D
    reps = 30

    # correctness check against the production kernel first
    ref = kernel_call(qt, k3, vt_ext, 128)
    for chunk in (320, 640):
        for name, call in (("chunk", kernel_call), ("split", split_call)):
            got = call(qt, k3, vt_ext, chunk)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"correctness {name}{chunk}: maxerr {err:.2e}", flush=True)

    def report(name, call, chunk):
        @jax.jit
        def loop(q0, k3, vt_ext):
            def body(i, q):
                o = call(q, k3, vt_ext, chunk)
                return q + (0.001 * o.astype(jnp.float32)).astype(q.dtype)
            return jax.lax.fori_loop(0, reps, body, q0)

        try:
            _sync(loop(qt, k3, vt_ext))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                _sync(loop(qt, k3, vt_ext))
                ms = (time.perf_counter() - t0) / reps * 1000
                best = ms if best is None else min(best, ms)
            print(f"{name:24s} {best:7.3f} ms  {flops/best/1e9:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    report("chunk128 (production)", kernel_call, 128)
    for chunk in (320, 640, 896, 2240):
        report(f"chunk{chunk}", kernel_call, chunk)
    for chunk in (128, 320, 640):
        report(f"split2 chunk{chunk}", split_call, chunk)


if __name__ == "__main__":
    main()
