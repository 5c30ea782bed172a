"""SD1.5 UNet 512px forward timing (bf16, CFG batch 2, one chip).

The UNet's self-attention (4096 tokens at level 0) now routes through the
flash kernel (unet_sd15.py _attn); this measures the per-forward cost and
the 28-step-equivalent throughput, with the einsum path for comparison.

Run: nohup python experiments/bench_sd15.py > /tmp/bench_sd15.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15


def build(dtype):
    cfg = UNetConfig.sd15(dtype=dtype)
    unet = UNetSD15(cfg)
    b = 2  # CFG batch for 1 image
    lat = jax.random.normal(jax.random.PRNGKey(0), (b, 4, 64, 64), dtype)
    t = jnp.full((b,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 77, 768), dtype)
    shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(0), lat, t, ctx)
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        shapes,
    )
    return unet, params, lat, t, ctx


def time_forward(unet, params, lat, t, ctx, reps=20):
    @jax.jit
    def loop(params, lat):
        def body(i, ll):
            eps, *_ = unet.apply(params, ll, t, ctx)
            return lat + 0.001 * eps.astype(lat.dtype)
        return jax.lax.fori_loop(0, reps, body, lat)

    float(loop(params, lat).reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    float(loop(params, lat).reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    unet, params, lat, t, ctx = build(jnp.bfloat16)
    ms = time_forward(unet, params, lat, t, ctx)
    print(f"SD1.5 512px forward (bf16, flash attn): {ms:7.2f} ms "
          f"-> 28-step {1000 / (ms * 28):.3f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
