"""Interleaved A/B: production chunk walk vs two-stream split-softmax.

attn_round4.py showed split2@128 at 3.198 ms vs production 3.396 ms in one
process — on the edge of shared-chip noise. Here the two variants alternate
A/B/A/B... 6 times each in one process; compare medians within the run.

Run: nohup python experiments/attn_split_ab.py > /tmp/attn_ab.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from experiments.attn_round4 import kernel_call, split_call, B, H, N, D, DV, LOG2E


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

    def make_loop(call):
        @jax.jit
        def loop(q0, k3, vt_ext):
            def body(i, q):
                o = call(q, k3, vt_ext, 128)
                return q + (0.001 * o.astype(jnp.float32)).astype(q.dtype)
            return jax.lax.fori_loop(0, reps, body, q0)
        return loop

    loops = {"prod": make_loop(kernel_call), "split2": make_loop(split_call)}
    for name, loop in loops.items():
        _sync(loop(qt, k3, vt_ext))  # compile

    times = {"prod": [], "split2": []}
    for trial in range(6):
        for name, loop in loops.items():
            t0 = time.perf_counter()
            _sync(loop(qt, k3, vt_ext))
            ms = (time.perf_counter() - t0) / reps * 1000
            times[name].append(ms)
            print(f"trial {trial} {name:7s} {ms:7.3f} ms", flush=True)

    for name, ts in times.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print(f"{name:7s} median {med:7.3f} ms  {flops/med/1e9:6.1f} TF/s  "
              f"min {ts[0]:.3f}", flush=True)


if __name__ == "__main__":
    main()
