"""Why is the kernel 6 TF/s at d=128? Block-size sweep at the FLUX shape.

The VMEM model approved one 4608-lane block at d=128 (dv=144) but the
measured rate collapsed — suspect Mosaic spilling once score+acc+operand
buffers brush the real limit. Sweep n_block and chunk_kv, plus the
streaming kernel.

Run: nohup python experiments/attn_d128_tune.py > /tmp/attn_d128.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tpdm_tpu.ops.attention import (
    _flash_attention_streaming_impl,
    _resident_flash_attention,
    attention_reference,
)


def _sync(x):
    return float(x.reshape(-1)[0].astype(jnp.float32))


def time_fn(f, q, k, v, reps=20):
    @jax.jit
    def loop(q, k, v):
        def body(i, x):
            o = f(x, k, v)
            return q + (0.001 * o.astype(jnp.float32)).astype(q.dtype)
        return jax.lax.fori_loop(0, reps, body, q)

    _sync(loop(q, k, v))
    t0 = time.perf_counter()
    _sync(loop(q, k, v))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    b, h, n, d = 1, 24, 4608, 128
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(kk, q.shape, jnp.bfloat16)
    v = jax.random.normal(kv, q.shape, jnp.bfloat16)
    ref = attention_reference(q, k, v)
    flops = 4 * b * h * n * n * d

    def report(name, f):
        try:
            out = jax.jit(f)(q, k, v)
            rel = float(
                jnp.linalg.norm(out.astype(jnp.float32) - ref.astype(jnp.float32))
                / jnp.linalg.norm(ref.astype(jnp.float32))
            )
            ms = time_fn(jax.jit(f), q, k, v)
            print(f"{name:32s} {ms:7.3f} ms  {flops/ms/1e9:6.1f} TF/s  rel {rel:.1e}",
                  flush=True)
        except Exception as e:
            print(f"{name:32s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    for nb in (4608, 2304, 1536, 1152, 512, 256):
        report(f"resident nb{nb} ch128",
               lambda q, k, v, nb=nb: _resident_flash_attention(
                   q, k, v, None, nb, False))
    for bq, bkv in ((256, 1024), (512, 512), (1536, 512), (512, 1536)):
        report(f"streaming bq{bq} bkv{bkv}",
               lambda q, k, v, bq=bq, bkv=bkv: _flash_attention_streaming_impl(
                   q, k, v, None, bq, bkv, False))


if __name__ == "__main__":
    main()
