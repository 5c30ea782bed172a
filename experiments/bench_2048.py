"""2048px geometry timing: SD3-medium forward at 256x256 latents (16,717
joint tokens -> kv-streaming kernel + in-graph pos-embed regeneration).

Run: nohup python experiments/bench_2048.py > /tmp/bench_2048.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from tpdm_tpu.models import MMDiT, MMDiTConfig

    cfg = MMDiTConfig.sd3_medium()
    model = MMDiT(cfg)
    b, n_txt = 2, 333  # CFG batch for 1 image
    lat = jax.random.normal(
        jax.random.PRNGKey(0), (b, cfg.in_channels, 256, 256), jnp.bfloat16
    )
    ctx = jnp.zeros((b, n_txt, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)
    ts = jnp.full((b,), 800.0)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        lat[:, :, :cfg.sample_size, :cfg.sample_size], ts, ctx, pooled,
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        shapes,
    )

    def fwd(lat, params, ts, ctx, pooled):
        return model.apply(params, lat, ts, ctx, pooled)[0]

    reps = 3

    @jax.jit
    def loop(lat, params, ts, ctx, pooled):
        def body(i, x):
            o = fwd(x, params, ts, ctx, pooled)
            return lat + 0.0 * o.reshape(-1)[0].astype(lat.dtype)
        return jax.lax.fori_loop(0, reps, body, lat)

    out = loop(lat, params, ts, ctx, pooled)
    print("warm ok", float(out.reshape(-1)[0]), flush=True)
    t0 = time.perf_counter()
    out = loop(lat, params, ts, ctx, pooled)
    float(out.reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"2048px forward: {dt*1000:.1f} ms -> 28-step {28*dt:.2f} s/img "
          f"-> {1/(28*dt):.4f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
