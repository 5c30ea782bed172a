"""Bisect the host-offload out_shardings crash (select.47, 3 operands).

Three shapes of the rollout cache pattern, each jitted with pinned-host
out_shardings on the cache output:
  A: scan + DUS into a host buffer
  B: while_loop + DUS into a host buffer
  C: while_loop + DUS + early-exit all_done flag (the sampler's exact shape)

Run: nohup python experiments/offload_minimal.py > /tmp/offload_min.log 2>&1 &
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.sharding import SingleDeviceSharding

dev = jax.devices()[0]
HOST = SingleDeviceSharding(dev, memory_kind="pinned_host")
T, B, D = 4, 2, 8


def case_a(x):
    buf = jax.device_put(jnp.zeros((T, B, D)), HOST)

    def step(buf, i):
        h = x * (i + 1.0)
        return buf.at[i].set(jax.device_put(h, HOST)), None

    buf, _ = jax.lax.scan(step, buf, jnp.arange(T))
    return buf


def case_b(x):
    buf = jax.device_put(jnp.zeros((T, B, D)), HOST)

    def cond(s):
        return s[0] < T

    def body(s):
        i, buf = s
        h = x * (i + 1.0)
        return i + 1, buf.at[i].set(jax.device_put(h, HOST))

    _, buf = jax.lax.while_loop(cond, body, (jnp.int32(0), buf))
    return buf


def case_c(x):
    buf = jax.device_put(jnp.zeros((T, B, D)), HOST)

    def cond(s):
        return (s[0] < T) & ~s[2]

    def body(s):
        i, buf, done = s
        h = x * (i + 1.0)
        return i + 1, buf.at[i].set(jax.device_put(h, HOST)), jnp.all(h > 100.0)

    _, buf, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), buf, jnp.array(False)))
    return buf


def main():
    x = jnp.ones((B, D))
    for name, f in (("A scan", case_a), ("B while", case_b), ("C while+exit", case_c)):
        try:
            out = jax.jit(f, out_shardings=HOST)(x)
            print(name, "OK", out.sharding.memory_kind, float(out.sum()), flush=True)
        except Exception as e:
            print(name, "FAIL", type(e).__name__, str(e)[:160], flush=True)


if __name__ == "__main__":
    main()


def case_d(x):
    return jax.device_put(x * 2.0, HOST)


def run_d():
    x = jnp.ones((B, D))
    try:
        out = jax.jit(case_d, out_shardings=HOST)(x)
        print("D trivial OK", out.sharding.memory_kind, flush=True)
    except Exception as e:
        print("D trivial FAIL", type(e).__name__, str(e)[:160], flush=True)
