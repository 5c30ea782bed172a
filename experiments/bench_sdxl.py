"""SDXL-base UNet 1024px forward timing (bf16, CFG batch 2, one chip).

The beyond-reference SDXL family (UNetConfig.sdxl(): 2.6B, per-level
transformer depth (0,2,10), heads = C/64, text_time addition embedding)
measured with the same methodology as experiments/bench_sd15.py: zero
weights (dense math is value-independent), rep-chained forwards inside
one dispatch, 28-step-equivalent throughput.

Run: nohup python experiments/bench_sdxl.py > /tmp/bench_sdxl.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15


def build(dtype, latent=128):
    cfg = UNetConfig.sdxl(dtype=dtype, sample_size=latent)
    unet = UNetSD15(cfg)
    b = 2  # CFG batch for 1 image
    lat = jax.random.normal(jax.random.PRNGKey(0), (b, 4, latent, latent), dtype)
    t = jnp.full((b,), 500.0)
    ctx = jax.random.normal(
        jax.random.PRNGKey(1), (b, 77, cfg.cross_attention_dim), dtype
    )
    added = {
        "text_embeds": jnp.zeros((b, cfg.addition_pooled_dim), dtype),
        "time_ids": jnp.broadcast_to(
            jnp.asarray([1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0]), (b, 6)
        ),
    }
    shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(0), lat, t, ctx, added)
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        shapes,
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    return unet, params, lat, t, ctx, added, n_params


def time_forward(unet, params, lat, t, ctx, added, reps=10):
    @jax.jit
    def loop(params, lat):
        def body(i, ll):
            eps, *_ = unet.apply(params, ll, t, ctx, added)
            return lat + 0.001 * eps.astype(lat.dtype)
        return jax.lax.fori_loop(0, reps, body, lat)

    float(loop(params, lat).reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    float(loop(params, lat).reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    unet, params, lat, t, ctx, added, n_params = build(jnp.bfloat16)
    ms = time_forward(unet, params, lat, t, ctx, added)
    print(
        f"SDXL-base 1024px forward ({n_params/1e9:.2f}B bf16, CFG batch 2): "
        f"{ms:7.2f} ms -> 28-step {1000 / (ms * 28):.3f} img/s/chip",
        flush=True,
    )


if __name__ == "__main__":
    main()
