"""Kernel v4: natural-layout operands, transposed compute inside.

attn_block_layout.py (fixed harness) showed transposed EMISSION buys
nothing: moving the layout change into the projections costs the same as
explicit transposes. Next hypothesis: keep q/k/v in their natural
(b, h, n, d) layout and let Mosaic's matmul do the orientation work via
dot_general dimension numbers —

    S^T  (chunk, nb) = dot_general(k_chunk (chunk,d), q (nb,d), contract d/d)
    accT (dv, nb)    = dot_general(ve_chunk (chunk,dv), p (chunk,nb), contract 0/0)

so NO operand transposes exist anywhere (the ones denominator rides as a
COLUMN of v again), and only the o^T epilogue remains (measured ~free
in-model: it fuses into the out-projection).

Compares, as residual chains (hoist-proof):
  A current flash_attention (prep transposes inside)
  B natural-operand kernel v4
both as full attention blocks with projections.

Run: nohup python experiments/attn_natural_operands.py > /tmp/attn_nat.log 2>&1 &
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpdm_tpu.ops.attention import flash_attention

LOG2E = 1.4426950408889634
B, H, N, D = 2, 24, 4480, 64
C = H * D


def _kernel_nat(q_ref, k_ref, ve_ref, o_ref, *, kv_padded, chunk_kv):
    """q (nb, d) prescaled; k (kv, d); ve (kv, dv) with ones col at d.
    Output o^T (d, nb)."""
    q = q_ref[0]
    m = None
    acc = None
    for start in range(0, kv_padded, chunk_kv):
        k = k_ref[0, start:start + chunk_kv, :]
        ve = ve_ref[0, start:start + chunk_kv, :]
        s = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (chunk, nb)
        if m is None:
            m = jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp2(s - m)
            acc = jax.lax.dot_general(
                ve, p.astype(ve.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (dv, nb)
        else:
            m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            acc = acc * alpha + jax.lax.dot_general(
                ve, p.astype(ve.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_new
    d = o_ref.shape[1]
    o_ref[0] = (acc[:d, :] / acc[d:d + 1, :]).astype(o_ref.dtype)


def flash_nat(q, k, v, chunk=128):
    """(b,h,n,d) natural in; (b,h,d,n) transposed out (consumed by a
    dot_general out-projection, no materialized epilogue)."""
    b, h, n, d = q.shape
    bh = b * h
    qs = (q.astype(jnp.float32) * (LOG2E / d**0.5)).astype(q.dtype)
    dv = 80
    ones = jnp.ones((b, h, n, 1), v.dtype)
    zeros = jnp.zeros((b, h, n, dv - d - 1), v.dtype)
    ve = jnp.concatenate([v, ones, zeros], axis=-1)
    ot = pl.pallas_call(
        functools.partial(_kernel_nat, kv_padded=n, chunk_kv=chunk),
        grid=(bh, 1),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, n), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d, n), q.dtype),
    )(qs.reshape(bh, n, d), k.reshape(bh, n, d), ve.reshape(bh, n, dv))
    return ot.reshape(b, h, d, n)


def block_standard(x, wq, wk, wv, wo):
    q = (x @ wq).reshape(B, N, H, D).transpose(0, 2, 1, 3)
    k = (x @ wk).reshape(B, N, H, D).transpose(0, 2, 1, 3)
    v = (x @ wv).reshape(B, N, H, D).transpose(0, 2, 1, 3)
    o = flash_attention(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
    return o @ wo


def block_nat(x, wq, wk, wv, wo):
    q = (x @ wq).reshape(B, N, H, D).transpose(0, 2, 1, 3)
    k = (x @ wk).reshape(B, N, H, D).transpose(0, 2, 1, 3)
    v = (x @ wv).reshape(B, N, H, D).transpose(0, 2, 1, 3)
    ot = flash_nat(q, k, v)
    return jax.lax.dot_general(
        ot, wo.reshape(H, D, C), (((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _sync(x):
    return float(x.reshape(-1)[0].astype(jnp.float32))


def time_loop(f, args, reps=30):
    x0, *ws = args

    @jax.jit
    def loop(x0, *ws):
        def body(i, x):
            return x + (0.02 * f(x, *ws).astype(jnp.float32)).astype(x.dtype)
        return jax.lax.fori_loop(0, reps, body, x0)

    _sync(loop(x0, *ws))
    t0 = time.perf_counter()
    _sync(loop(x0, *ws))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, N, C), jnp.bfloat16)
    wq, wk, wv, wo = (
        jax.random.normal(k_, (C, C), jnp.bfloat16) * 0.02 for k_ in ks[1:]
    )

    try:
        a = jax.jit(block_standard)(x, wq, wk, wv, wo)
        bn = jax.jit(block_nat)(x, wq, wk, wv, wo)
        err = float(jnp.abs(a.astype(jnp.float32) - bn.astype(jnp.float32)).max())
        print(f"A vs B maxerr: {err:.2e} "
              f"(scale {float(jnp.abs(a.astype(jnp.float32)).max()):.2e})",
              flush=True)
    except Exception as e:
        print(f"B FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)
        return

    ta = time_loop(block_standard, (x, wq, wk, wv, wo))
    tb = time_loop(block_nat, (x, wq, wk, wv, wo))
    print(f"A current kernel block:     {ta:7.3f} ms", flush=True)
    print(f"B natural-operand block:    {tb:7.3f} ms  "
          f"(delta {ta - tb:+.3f} ms/layer, x24 = {(ta - tb) * 24:+.1f} ms/step)",
          flush=True)
if __name__ == "__main__":
    main()
