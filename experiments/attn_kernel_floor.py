"""Settle the bare-kernel floor: is the transposed flash kernel 1.9 or
3.2 ms once layout ops are excluded, measured hoist-proof?

attn_transpose_cost.py suggested 1.91 ms bare, but its loop carry ignored
the kernel output (LICM ambiguity). Here the kernel output (bh, d, n)
feeds the NEXT iteration's qt directly — same shape, strict data
dependency, zero layout ops inside the loop:

    qt <- qt + 0.001 * kernel(qt, k3, vt_ext)

Also tests an in-kernel-transpose variant: q arrives NATURAL (n, d) and
the kernel transposes it in VMEM (vector shuffles may beat the XLA
HBM-level transpose the production path pays).

Run: nohup python experiments/attn_kernel_floor.py > /tmp/attn_floor.log 2>&1 &
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpdm_tpu.ops.attention import _chunk_walk, _flash_kernel

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


def _kernel_inT(q_ref, k_ref, vt_ref, o_ref, *, kv_padded, chunk_kv):
    """q arrives NATURAL (n, d); transpose to (d, n) in VMEM."""
    qt = q_ref[0].T  # (d, n)
    acc, m = _chunk_walk(qt, k_ref, vt_ref, kv_padded, chunk_kv)
    d = o_ref.shape[1]
    o_ref[0] = (acc[:d, :] / acc[d:d + 1, :]).astype(o_ref.dtype)


def kernel_call_inT(qn, k3, vt_ext, chunk=128):
    bh = qn.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel_inT, kv_padded=N, chunk_kv=chunk),
        grid=(bh, 1),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DV, N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, N), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, D, N), qn.dtype),
    )(qn, k3, vt_ext)


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

    def report(name, call, q0):
        @jax.jit
        def loop(q0, k3, vt_ext):
            def body(i, q):
                o = call(q, k3, vt_ext)
                return q + (0.001 * o.astype(jnp.float32)).astype(q.dtype)
            return jax.lax.fori_loop(0, reps, body, q0)

        try:
            _sync(loop(q0, k3, vt_ext))
            t0 = time.perf_counter()
            _sync(loop(q0, k3, vt_ext))
            ms = (time.perf_counter() - t0) / reps * 1000
            print(f"{name:28s} {ms:7.3f} ms  {flops/ms/1e9:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)

    report("bare transposed-in kernel", kernel_call, qt)
    # natural-q variant (in-kernel VMEM transpose); the chain needs (n, d)
    # in/out so one XLA epilogue transpose rides along — compare against
    # bare to split kernel vs layout cost
    qn = jnp.swapaxes(qt, 1, 2)
    report("inT kernel (+1 epilogue T)", lambda q, k, v: jnp.swapaxes(
        kernel_call_inT(q, k, v), 1, 2), qn)


if __name__ == "__main__":
    main()
