"""Round-3b: refine the transposed-layout attention kernel (winner of 3a).

3a result (v5e, 2x24x4480x64): vT fp32 nb4480 ch128 = 3.216 ms (76.7 TF/s)
vs current v2 = 4.118 ms (59.9). This round sweeps chunk/block and tests:

  vT    baseline transposed (running max + acc rescale), fp32 softmax
  vTc   s downcast to bf16 before max/sub/exp2 (half VPU width; p needs no
        astype before PV)
  vTm   max-free: per-query Cauchy-Schwarz bound rb >= rowmax passed in;
        no running max, no acc rescale (pure accumulation)
  vTmc  vTm + bf16 softmax

Run detached:
  nohup python experiments/attn_round3b.py > /tmp/attn_r3b.log 2>&1 &
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpdm_tpu.ops.attention import attention_reference, flash_attention

LOG2E = 1.4426950408889634


def _kernel_T(qt_ref, k_ref, vt_ref, o_ref, *, chunk, kv_padded, soft_dtype):
    qt = qt_ref[0]
    m = None
    acc = None
    for start in range(0, kv_padded, chunk):
        k = k_ref[0, start:start + chunk, :]
        vt = vt_ref[0, :, start:start + chunk]
        s = jax.lax.dot_general(
            k, qt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(soft_dtype)
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
            alpha = jnp.exp2((m - m_new).astype(jnp.float32))
            acc = acc * alpha + jax.lax.dot_general(
                vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_new
    d = o_ref.shape[1]
    o_ref[0] = (acc[:d, :] / acc[d:d + 1, :]).astype(o_ref.dtype)


def _kernel_Tm(qt_ref, rb_ref, k_ref, vt_ref, o_ref, *, chunk, kv_padded,
               soft_dtype):
    """Max-free: rb (1, n_block) is a static upper bound on each query's
    row max (prescaled units). No running max, no acc rescale."""
    qt = qt_ref[0]
    rb = rb_ref[0].astype(soft_dtype)  # (1, n_block)
    acc = None
    for start in range(0, kv_padded, chunk):
        k = k_ref[0, start:start + chunk, :]
        vt = vt_ref[0, :, start:start + chunk]
        s = jax.lax.dot_general(
            k, qt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(soft_dtype)
        p = jnp.exp2(s - rb)
        pv = jax.lax.dot_general(
            vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = pv if acc is None else acc + pv
    d = o_ref.shape[1]
    o_ref[0] = (acc[:d, :] / acc[d:d + 1, :]).astype(o_ref.dtype)


def _prep_T(q, k, v):
    b, h, n, d = q.shape
    bh = b * h
    qs = (q.astype(jnp.float32) * (LOG2E / d**0.5)).astype(q.dtype)
    qt = jnp.swapaxes(qs, -1, -2).reshape(bh, d, n)
    dv = ((d + 1 + 15) // 16) * 16
    vt = jnp.swapaxes(v, -1, -2).reshape(bh, d, n)
    ones = jnp.ones((bh, 1, n), v.dtype)
    zeros = jnp.zeros((bh, dv - d - 1, n), v.dtype)
    vt_ext = jnp.concatenate([vt, ones, zeros], axis=1)
    return qt, k.reshape(bh, n, d), vt_ext, bh, dv


def attn_T(q, k, v, n_block=4480, chunk=128, soft_dtype=jnp.float32):
    b, h, n, d = q.shape
    qt, k3, vt_ext, bh, dv = _prep_T(q, k, v)
    out = pl.pallas_call(
        functools.partial(_kernel_T, chunk=chunk, kv_padded=n,
                          soft_dtype=soft_dtype),
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
    return jnp.swapaxes(out.reshape(b, h, d, n), -1, -2)


def attn_Tm(q, k, v, n_block=4480, chunk=128, soft_dtype=jnp.float32):
    b, h, n, d = q.shape
    qt, k3, vt_ext, bh, dv = _prep_T(q, k, v)
    # Cauchy-Schwarz bound per query, prescaled units
    qn = jnp.linalg.norm(
        qt.astype(jnp.float32), axis=1, keepdims=True
    )  # (bh, 1, n)
    kn = jnp.max(
        jnp.linalg.norm(k3.astype(jnp.float32), axis=-1), axis=-1
    )  # (bh,)
    rb = qn * kn[:, None, None]
    out = pl.pallas_call(
        functools.partial(_kernel_Tm, chunk=chunk, kv_padded=n,
                          soft_dtype=soft_dtype),
        grid=(bh, n // n_block),
        in_specs=[
            pl.BlockSpec((1, d, n_block), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_block), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, n_block), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d, n), q.dtype),
    )(qt, rb, k3, vt_ext)
    return jnp.swapaxes(out.reshape(b, h, d, n), -1, -2)


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
    b, h, n, d = 2, 24, 4480, 64
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
            print(f"{name:34s} {ms:7.3f} ms  {flops/ms/1e9:6.1f} TF/s  "
                  f"maxerr {err:.2e} rel {rel:.2e}", flush=True)
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    report("v2 current", lambda q, k, v: flash_attention(q, k, v))
    for nb, ch in ((4480, 128), (896, 128), (640, 128), (4480, 640)):
        report(f"vT f32 nb{nb} ch{ch}",
               functools.partial(attn_T, n_block=nb, chunk=ch))
    for nb, ch in ((4480, 128), (896, 128), (4480, 640)):
        report(f"vTc bf16soft nb{nb} ch{ch}",
               functools.partial(attn_T, n_block=nb, chunk=ch,
                                 soft_dtype=jnp.bfloat16))
    for nb, ch in ((4480, 128), (4480, 640), (896, 128)):
        report(f"vTm maxfree nb{nb} ch{ch}",
               functools.partial(attn_Tm, n_block=nb, chunk=ch))
    report("vTmc maxfree bf16 nb4480 ch128",
           functools.partial(attn_Tm, soft_dtype=jnp.bfloat16))
    # repeat winner for variance estimate
    report("vT f32 nb4480 ch128 (rep)", functools.partial(attn_T))
    report("vT f32 nb4480 ch128 (rep2)", functools.partial(attn_T))


if __name__ == "__main__":
    main()
