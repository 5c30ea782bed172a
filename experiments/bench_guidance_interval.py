"""Measure the guidance-interval speedup on the real chip (SD3-medium 1024px).

Legs (bf16, zeros params — dense TPU math is value-independent):
  1. fixed 28-step full-CFG baseline (anchor; matches bench.py's headline
     methodology)
  2. fixed 28-step with guidance_interval windows of decreasing width —
     steps outside the window run the SINGLE-batch conditional-only
     lax.cond branch, so each excluded step costs ~half

The sigma ladder is uniform_flow_sigmas(28, shift=3): sigma_0=1.0 down to
~0.003; a window (lo, hi) excludes the steps whose sigma falls outside.
Kynkäänniemi et al. 2024 report equal-or-better FID when guidance is
limited to the middle noise levels; here we measure the TPU wall-clock
side of that trade.

Methodology per docs/PERF.md: rep-chained data-dependent calls, one
one-element host readback per timing. One JSON line per leg.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpdm_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def _sync(x):
    _ = np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def zeros_params(model, *probe):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *probe)
    return jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        ),
        shapes,
    )


def main():
    from tpdm_tpu.models import MMDiT, MMDiTConfig
    from tpdm_tpu.ops.schedules import uniform_flow_sigmas
    from tpdm_tpu.pipeline.denoise import (
        make_cfg_interval_velocity_fn,
        make_cfg_velocity_fn,
    )
    from tpdm_tpu.pipeline.sampler import fixed_schedule_sample

    toy = "--toy" in sys.argv
    b, n_txt, steps = 1, (8 if toy else 333), (6 if toy else 28)
    cfg = MMDiTConfig.toy(dtype=jnp.bfloat16) if toy else MMDiTConfig.sd3_medium()
    model = MMDiT(cfg)
    sigmas = uniform_flow_sigmas(steps)
    reps = 1 if toy else 3

    lat = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
        jnp.bfloat16,
    )
    ctx = jnp.zeros((2 * b, n_txt, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((2 * b, cfg.pooled_projection_dim), jnp.bfloat16)
    params = zeros_params(
        model,
        jnp.zeros((2 * b,) + lat.shape[1:], jnp.bfloat16),
        jnp.ones((2 * b,)),
        ctx,
        pooled,
    )

    def timed(run):
        o = run(params, lat)
        _sync(o)
        t0 = time.time()
        x = lat
        for _ in range(reps):
            o = run(params, x)
            x = lat + 0.0 * o[:, :1, :1, :1].astype(lat.dtype)
        _sync(o)
        return (time.time() - t0) / reps

    @jax.jit
    def run_full(params, lat):
        vfn = make_cfg_velocity_fn(
            lambda *a: model.apply(params, *a), ctx, pooled, 7.0
        )
        return fixed_schedule_sample(vfn, lat, sigmas)

    dt0 = timed(run_full)
    print(json.dumps({"leg": "fixed_full_cfg", "img_per_s": round(b / dt0, 4),
                      "s_per_img": round(dt0, 3)}), flush=True)

    sig_np = np.asarray(sigmas)
    for lo, hi in ((0.05, 0.99), (0.15, 0.95), (0.25, 0.85)):
        guided_steps = int(((sig_np >= lo) & (sig_np < hi)).sum())

        def run_ivl(params, lat, _lo=lo, _hi=hi):
            vfn = make_cfg_interval_velocity_fn(
                lambda *a: model.apply(params, *a), ctx, pooled, 7.0,
                (_lo, _hi),
            )
            return fixed_schedule_sample(vfn, lat, sigmas)

        dt = timed(jax.jit(run_ivl))
        print(json.dumps({
            "leg": f"fixed_interval_{lo}_{hi}",
            "guided_steps": guided_steps,
            "total_steps": steps,
            "img_per_s": round(b / dt, 4),
            "s_per_img": round(dt, 3),
            "speedup_vs_full_cfg": round(dt0 / dt, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
