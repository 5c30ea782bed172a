"""Model-side transposed qkv emission: full attention-block comparison.

attn_transpose_cost.py showed the bare transposed kernel at 1.91 ms with
1.31 ms (41%) spent on XLA-materialized layout ops around the opaque
pallas call. This measures a full attention BLOCK (qkv projections ->
attention -> out projection) three ways at the SD3 shape:

  A  standard: x -> dense qkv -> (b,h,n,d) -> flash_attention (internal
     transposes) -> (b,n,hd) -> out proj
  B  transposed emission: q^T/v^T produced DIRECTLY by dot_general with
     the weight as lhs (output (h,d,b,n) -> major-dim permute, no data
     movement), k natural, kernel without prep transposes, out-proj
     contracts (h,d) straight from o^T (b,h,d,n)
  C  B but with the ones row concatenated per call (denominator cost)

Run: nohup python experiments/attn_block_layout.py > /tmp/attn_bl.log 2>&1 &
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpdm_tpu.ops.attention import _flash_kernel, flash_attention

LOG2E = 1.4426950408889634
B, H, N, D = 2, 24, 4480, 64
C = H * D  # 1536


def _kernel_call(qt, k3, vt_ext, d=D, chunk=128):
    bh, _, n = qt.shape
    dv = vt_ext.shape[1]
    return pl.pallas_call(
        functools.partial(_flash_kernel, kv_padded=n, chunk_kv=chunk),
        grid=(bh, 1),
        in_specs=[
            pl.BlockSpec((1, qt.shape[1], n), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, k3.shape[2]), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dv, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, n), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d, n), qt.dtype),
    )(qt, k3, vt_ext)


def block_standard(x, wq, wk, wv, wo):
    # wq/wk/wv: (C, C); wo: (C, C)
    q = (x @ wq).reshape(B, N, H, D).transpose(0, 2, 1, 3)
    k = (x @ wk).reshape(B, N, H, D).transpose(0, 2, 1, 3)
    v = (x @ wv).reshape(B, N, H, D).transpose(0, 2, 1, 3)
    o = flash_attention(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
    return o @ wo


def block_transposed(x, wq, wk, wv, wo, with_ones=True):
    # q^T: dot_general(W (c, h, d), x (b, n, c)) -> (h, d, b, n); the
    # permute to (b, h, d, n) moves only MAJOR dims (minor dim n stays) —
    # a layout relabel, not a copy.
    wq3 = wq.reshape(C, H, D)
    wv3 = wv.reshape(C, H, D)
    qt = jax.lax.dot_general(
        wq3, x, (((0,), (2,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype).transpose(2, 0, 1, 3)  # (b, h, d, n)
    vt = jax.lax.dot_general(
        wv3, x, (((0,), (2,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype).transpose(2, 0, 1, 3)
    k = (x @ wk).reshape(B, N, H, D).transpose(0, 2, 1, 3)  # (b, h, n, d)

    qt = (qt.astype(jnp.float32) * (LOG2E / D**0.5)).astype(qt.dtype)
    if with_ones:
        dv = 80
        ones = jnp.ones((B, H, 1, N), vt.dtype)
        zeros = jnp.zeros((B, H, dv - D - 1, N), vt.dtype)
        vt_ext = jnp.concatenate([vt, ones, zeros], axis=2)
    else:
        vt_ext = vt
    o_t = _kernel_call(
        qt.reshape(B * H, D, N), k.reshape(B * H, N, D),
        vt_ext.reshape(B * H, -1, N),
    ).reshape(B, H, D, N)
    # out proj straight off o^T: contract (h, d); output dims order is
    # [lhs free (b, n), rhs free (C)] = (b, n, C) — no epilogue transpose
    return jax.lax.dot_general(
        o_t, wo.reshape(H, D, C), (((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _sync(x):
    return float(x.reshape(-1)[0].astype(jnp.float32))


def time_loop(f, args, reps=30):
    """Residual chain x = x + 0.02*f(x): every iteration depends on the
    previous one, so XLA cannot hoist ANY loop-invariant prep out of the
    loop (the trap the first version of this experiment fell into — an
    ignored carry let LICM hoist projections/transposes and fake a 1.1 ms
    "block")."""
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

    a = jax.jit(block_standard)(x, wq, wk, wv, wo)
    bt = jax.jit(block_transposed)(x, wq, wk, wv, wo)
    err = float(jnp.abs(a.astype(jnp.float32) - bt.astype(jnp.float32)).max())
    print(f"A vs B maxerr: {err:.2e} (scale {float(jnp.abs(a.astype(jnp.float32)).max()):.2e})",
          flush=True)

    ta = time_loop(block_standard, (x, wq, wk, wv, wo))
    tb = time_loop(block_transposed, (x, wq, wk, wv, wo))
    print(f"A standard block:   {ta:7.3f} ms", flush=True)
    print(f"B transposed block: {tb:7.3f} ms  (delta {ta - tb:+.3f} ms/layer, "
          f"x24 = {(ta - tb) * 24:+.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
