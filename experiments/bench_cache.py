"""Measure Δ-DiT-style residual caching on the real chip (SD3-medium 1024px).

Legs (all CFG batch 2, guidance 7.0, bf16, zeros params — dense TPU math is
value-independent):
  1. fixed 28-step Euler baseline (uncached) — sanity anchor vs bench.py
  2. fixed 28-step cached, front_blocks x interval sweep
  3. adaptive trained-like (~NFE 14) cached at the best setting — the two
     accelerations stacked (TPM early stop x residual reuse)

Methodology per docs/PERF.md: rep-chained data-dependent calls, one
one-element host readback per timing (the tunnel's block_until_ready is
unreliable; per-dispatch latency ~90 ms). Prints one JSON line per leg so
partial runs still yield data.
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
    from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
    from tpdm_tpu.ops.schedules import uniform_flow_sigmas
    from tpdm_tpu.pipeline.denoise import (
        make_cfg_denoise_cached_fns,
        make_cfg_velocity_cached_fns,
        make_cfg_velocity_fn,
    )
    from tpdm_tpu.pipeline.sampler import (
        CachedDenoise,
        SamplerConfig,
        adaptive_sample,
        cache_reuse_schedule,
        fixed_schedule_sample,
        fixed_schedule_sample_cached,
    )

    toy = "--toy" in sys.argv  # CPU smoke mode: tiny geometry, same code
    b, n_txt, steps = 1, (8 if toy else 333), (6 if toy else 28)
    mk_cfg = (
        (lambda **kw: MMDiTConfig.toy(dtype=jnp.bfloat16, **kw))
        if toy
        else MMDiTConfig.sd3_medium
    )
    sigmas = uniform_flow_sigmas(steps)
    reps = 1 if toy else 3

    def timed(run, params, lat0):
        o = run(params, lat0)
        _sync(o)  # compile + warm
        t0 = time.time()
        x = lat0
        for _ in range(reps):
            o = run(params, x)
            x = lat0 + 0.0 * jax.tree.leaves(o)[0][:, :1, :1, :1].astype(
                lat0.dtype
            )
        _sync(o)
        return (time.time() - t0) / reps

    base_cfg = mk_cfg()
    model = MMDiT(base_cfg)
    lat = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, base_cfg.in_channels, base_cfg.sample_size, base_cfg.sample_size),
        jnp.bfloat16,
    )
    ctx = jnp.zeros((2 * b, n_txt, base_cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((2 * b, base_cfg.pooled_projection_dim), jnp.bfloat16)
    params = zeros_params(
        model,
        jnp.zeros((2 * b,) + lat.shape[1:], jnp.bfloat16),
        jnp.ones((2 * b,)),
        ctx,
        pooled,
    )
    grid = base_cfg.sample_size // base_cfg.patch_size
    n_img = grid * grid

    # ---- leg 1: uncached fixed baseline ----
    @jax.jit
    def run_fixed(params, lat):
        vfn = make_cfg_velocity_fn(
            lambda *a: model.apply(params, *a), ctx, pooled, 7.0
        )
        return fixed_schedule_sample(vfn, lat, sigmas)

    dt = timed(run_fixed, params, lat)
    print(json.dumps({"leg": "fixed_uncached", "img_per_s": round(b / dt, 4),
                      "s_per_img": round(dt, 3)}), flush=True)

    # ---- leg 2: cached fixed sweep ----
    best = None
    for front in ((1,) if toy else (4, 6)):
        fcfg = mk_cfg(cache_front_blocks=front)
        fmodel = MMDiT(fcfg)
        for interval in (2, 3):
            sched = cache_reuse_schedule(steps, interval)

            def run_cached(params, lat, _fm=fmodel, _sched=sched):
                mode_apply = lambda mode: (
                    lambda l, t, pe_, pp_, d: _fm.apply(
                        params, l, t, pe_, pp_, delta=d, cache_mode=mode
                    )
                )
                full_fn, reuse_fn = make_cfg_velocity_cached_fns(
                    mode_apply("record"), mode_apply("reuse"), ctx, pooled, 7.0
                )
                return fixed_schedule_sample_cached(
                    full_fn, reuse_fn, lat, sigmas,
                    jnp.zeros((2 * b, n_img, fcfg.inner_dim), jnp.bfloat16),
                    _sched,
                )

            run = jax.jit(run_cached)
            dt_c = timed(run, params, lat)
            rec = {
                "leg": f"fixed_cached_front{front}_int{interval}",
                "img_per_s": round(b / dt_c, 4),
                "s_per_img": round(dt_c, 3),
                "speedup_vs_uncached": round(dt / dt_c, 3),
            }
            print(json.dumps(rec), flush=True)
            if best is None or dt_c < best[0]:
                best = (dt_c, front, interval)

    # ---- leg 3: adaptive trained-like (~NFE 14) with the cache ----
    front, interval = best[1], best[2]
    acfg = mk_cfg(cache_front_blocks=front)
    amodel = MMDiT(acfg)
    tpm = TimePredictor(
        conv_out_channels=8 if toy else 128, in_channels=2 * acfg.inner_dim,
        temb_dim=acfg.inner_dim, init_alpha=1.0, init_beta=0.55,
        dtype=jnp.bfloat16,
    )
    tpm_params = tpm.init(
        jax.random.PRNGKey(1),
        jnp.zeros((b, 2 * acfg.inner_dim, grid, grid), jnp.bfloat16),
        jnp.zeros((b, acfg.inner_dim), jnp.bfloat16),
    )
    scfg = SamplerConfig(
        max_inference_steps=steps, predict=True, min_sigma=0.001,
        cache_activations=False,
    )
    sched = cache_reuse_schedule(steps, interval)
    key = jax.random.PRNGKey(2)

    for cached_on in (False, True):

        def run_adaptive(params, lat, _on=cached_on):
            mode_apply = lambda mode: (
                lambda l, t, pe_, pp_, d: amodel.apply(
                    params, l, t, pe_, pp_, delta=d, cache_mode=mode
                )
            )
            full_fn, reuse_fn = make_cfg_denoise_cached_fns(
                mode_apply("record"), mode_apply("reuse"), ctx, pooled, 7.0,
                grid, acfg.patch_size,
            )
            cached = None
            if _on:
                cached = CachedDenoise(
                    full_fn, reuse_fn,
                    jnp.zeros((2 * b, n_img, acfg.inner_dim), jnp.bfloat16),
                    sched,
                )
                dfn = None
            else:
                from tpdm_tpu.pipeline.denoise import make_cfg_denoise_fn

                dfn = make_cfg_denoise_fn(
                    lambda *a: amodel.apply(params, *a), ctx, pooled, 7.0,
                    grid, acfg.patch_size,
                )
            out = adaptive_sample(
                dfn, lambda h, t: tpm.apply(tpm_params, h, t), lat, key,
                scfg, cached=cached,
            )
            return out.final_latents, out.last_valid_index

        run = jax.jit(run_adaptive)
        o = run(params, lat)
        _sync(o[0])
        t0 = time.time()
        x = lat
        for _ in range(reps):
            o = run(params, x)
            x = lat + 0.0 * o[0][:, :1, :1, :1]
        _sync(o[0])
        dt_a = (time.time() - t0) / reps
        nfe = float(np.mean(np.asarray(o[1])) + 1)
        print(json.dumps({
            "leg": f"adaptive_nfe14_{'cached' if cached_on else 'uncached'}"
                   + (f"_front{front}_int{interval}" if cached_on else ""),
            "img_per_s": round(b / dt_a, 4),
            "s_per_img": round(dt_a, 3),
            "mean_nfe": round(nfe, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
