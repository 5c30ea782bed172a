"""Bound the upside of model-side transposed qkv emission (ROADMAP item).

The production path pays 3 XLA layout ops around the transposed kernel
(q, v in; o out). This measures [prep + kernel + epilogue] vs the bare
pallas_call on pre-transposed operands at the SD3 1024px shape — the
difference bounds what re-plumbing the MMDiT projections could save.

Run: nohup python experiments/attn_transpose_cost.py > /tmp/attn_tc.log 2>&1 &
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpdm_tpu.ops.attention import (
    _flash_kernel,
    _prep_transposed,
    flash_attention,
)


def kernel_only(qt, k3, vt_ext, d=64, chunk=128):
    bh, _, n = qt.shape
    dv = vt_ext.shape[1]
    return pl.pallas_call(
        functools.partial(_flash_kernel, kv_padded=n, chunk_kv=chunk),
        grid=(bh, 1),
        in_specs=[
            pl.BlockSpec((1, d, n), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, n), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d, n), qt.dtype),
    )(qt, k3, vt_ext)


def _sync(x):
    return float(x.reshape(-1)[0].astype(jnp.float32))


def time_loop(f, args, reps=30):
    @jax.jit
    def loop(*args):
        def body(i, x):
            o = f(*args)
            return x + o.reshape(-1)[:1].astype(x.dtype)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((1,), jnp.float32))

    _sync(loop(*args))
    t0 = time.perf_counter()
    _sync(loop(*args))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    b, h, n, d = 2, 24, 4480, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, n, d), jnp.bfloat16)
    v = jax.random.normal(kv_, (b, h, n, d), jnp.bfloat16)

    full = time_loop(lambda q, k, v: flash_attention(q, k, v), (q, k, v))
    print(f"full path (prep+kernel+epilogue): {full:7.3f} ms", flush=True)

    qt, k3, vt_ext, *_ = jax.jit(
        lambda q, k, v: _prep_transposed(q, k, v, n, 128)[:3]
    )(q, k, v)
    bare = time_loop(kernel_only, (qt, k3, vt_ext))
    print(f"bare kernel on pre-transposed:    {bare:7.3f} ms", flush=True)
    print(f"layout-op overhead: {full - bare:.3f} ms "
          f"({(full - bare) / full * 100:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
