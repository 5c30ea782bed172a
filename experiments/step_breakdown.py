"""Where does the 1024px CFG step spend its time? (real chip)

Times the SD3-medium forward at CFG batch 2 under several surgeries:
  full           — the real model
  attn=identity  — joint_attention stubbed to return v (dense-only cost)
  half depth     — 12 layers (per-layer slope vs fixed overhead)
  euler loop     — full fixed-schedule step incl. scheduler math

Run: nohup python experiments/step_breakdown.py > /tmp/breakdown.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(x.reshape(-1)[0])


def time_loop(f, args, reps=10):
    @jax.jit
    def loop(*args):
        def body(i, lat):
            out = f(lat, *args[1:])
            return args[0] + 0.0 * out.reshape(-1)[0].astype(args[0].dtype)

        return jax.lax.fori_loop(0, reps, body, args[0])

    _sync(loop(*args))
    t0 = time.perf_counter()
    _sync(loop(*args))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    from tpdm_tpu.models import MMDiT, MMDiTConfig
    import tpdm_tpu.models.mmdit as mmdit_mod

    n_txt = 333
    b = 2  # CFG batch

    def build(num_layers):
        cfg = MMDiTConfig.sd3_medium(num_layers=num_layers)
        model = MMDiT(cfg)
        lat = jax.random.normal(
            jax.random.PRNGKey(0),
            (b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
            jnp.bfloat16,
        )
        ctx = jnp.zeros((b, n_txt, cfg.joint_attention_dim), jnp.bfloat16)
        pooled = jnp.zeros((b, cfg.pooled_projection_dim), jnp.bfloat16)
        ts = jnp.full((b,), 800.0)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), lat, ts, ctx, pooled)
        params = jax.tree.map(
            lambda s: jnp.zeros(
                s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
            ),
            shapes,
        )
        return model, params, lat, ts, ctx, pooled

    model, params, lat, ts, ctx, pooled = build(24)

    def fwd(lat, params, ts, ctx, pooled):
        return model.apply(params, lat, ts, ctx, pooled)[0]

    t_full = time_loop(fwd, (lat, params, ts, ctx, pooled))
    print(f"full fwd 24L: {t_full:7.2f} ms", flush=True)

    model12, params12, *_ = build(12)

    def fwd12(lat, p, ts, ctx, pooled):
        return model12.apply(p, lat, ts, ctx, pooled)[0]

    t_half = time_loop(fwd12, (lat, params12, ts, ctx, pooled))
    print(f"full fwd 12L: {t_half:7.2f} ms  -> per-layer {(t_full-t_half)/12:5.3f} ms, fixed {t_full-2*(t_full-t_half):5.2f} ms", flush=True)

    real_attn = mmdit_mod.joint_attention
    try:
        mmdit_mod.joint_attention = lambda q, k, v, kv_len=None, use_pallas=None: v
        t_noattn = time_loop(fwd, (lat, params, ts, ctx, pooled))
        print(f"attn=identity 24L: {t_noattn:7.2f} ms  -> in-model attention {t_full-t_noattn:6.2f} ms", flush=True)
    finally:
        mmdit_mod.joint_attention = real_attn


if __name__ == "__main__":
    main()
