"""Input-aware (TeaCache-class) residual caching: quality + throughput.

Two claims to verify against the fixed-interval schedule (Δ-DiT style,
`cache_interval`) at MATCHED cost (same number of full forwards):

1. quality: the input-aware policy places its full forwards where the
   trajectory turns fastest (early, high-sigma steps), so its final
   latents should sit CLOSER to the exact 28-step trajectory than the
   fixed grid's (latent MSE vs exact, lower is better);
2. throughput: per-step cost is identical (same full/reuse programs +
   a scalar accumulator), so img/s at matched full-step count matches
   the fixed schedule within noise.

Run on the real chip: `python experiments/bench_teacache.py`
(or JAX_PLATFORMS=cpu for the toy geometry).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    on_tpu = jax.default_backend() not in ("cpu", "gpu")

    from tpdm_tpu.models import MMDiT, MMDiTConfig
    from tpdm_tpu.ops.schedules import uniform_flow_sigmas
    from tpdm_tpu.pipeline.denoise import (
        make_cfg_velocity_cached_fns,
        make_cfg_velocity_fn,
    )
    from tpdm_tpu.pipeline.sampler import (
        cache_reuse_schedule,
        fixed_schedule_sample,
        fixed_schedule_sample_autocached,
        fixed_schedule_sample_cached,
    )

    if on_tpu:
        cfg = MMDiTConfig.sd3_medium()
    else:
        cfg = MMDiTConfig.toy(dtype=jnp.bfloat16, cache_front_blocks=1)
    model = MMDiT(cfg)
    b, n_txt, steps = 1, 154, 28
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(
        key, (b, cfg.in_channels, cfg.sample_size, cfg.sample_size), cfg.dtype
    )
    ctx = jax.random.normal(
        jax.random.PRNGKey(1), (2 * b, n_txt, cfg.joint_attention_dim), cfg.dtype
    ) * 0.02
    pooled = jax.random.normal(
        jax.random.PRNGKey(2), (2 * b, cfg.pooled_projection_dim), cfg.dtype
    ) * 0.02
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(3), lat, jnp.ones((b,)),
        ctx[:b], pooled[:b],
    )
    # random SMALL weights (zeros would make every trajectory identical and
    # the quality comparison vacuous); seeded per-leaf fold_in keeps it
    # deterministic and cheap enough on one host core
    leaves, treedef = jax.tree.flatten(shapes)
    keys = [jax.random.fold_in(jax.random.PRNGKey(42), i)
            for i in range(len(leaves))]
    params = jax.tree.unflatten(
        treedef,
        [
            (0.02 * jax.random.normal(k, s.shape)).astype(s.dtype)
            for k, s in zip(keys, leaves)
        ],
    )

    apply = lambda *a: model.apply(params, *a)
    mode_apply = lambda mode: (
        lambda l, t, pe_, pp_, d: model.apply(
            params, l, t, pe_, pp_, delta=d, cache_mode=mode
        )
    )
    vfn = make_cfg_velocity_fn(apply, ctx, pooled, 7.0)
    full_fn, reuse_fn = make_cfg_velocity_cached_fns(
        mode_apply("record"), mode_apply("reuse"), ctx, pooled, 7.0
    )
    sig = uniform_flow_sigmas(steps)
    n_img = (cfg.sample_size // cfg.patch_size) ** 2
    delta0 = jnp.zeros((2 * b, n_img, cfg.inner_dim), cfg.dtype)

    run_exact = jax.jit(lambda l: fixed_schedule_sample(vfn, l, sig))
    run_fixed_sched = jax.jit(
        lambda l, sched: fixed_schedule_sample_cached(
            full_fn, reuse_fn, l, sig, delta0, sched
        )
    )
    run_auto = jax.jit(
        lambda l, tau: fixed_schedule_sample_autocached(
            full_fn, reuse_fn, l, sig, delta0, tau
        )
    )

    exact = np.asarray(run_exact(lat), np.float32)

    def mse(x):
        return float(np.mean((np.asarray(x, np.float32) - exact) ** 2))

    print(f"backend={jax.default_backend()} steps={steps}")
    # sweep tau; report n_full + MSE; compare each against the fixed
    # interval whose full-step count is closest
    results = []
    for tau in (0.02, 0.05, 0.1, 0.2, 0.4, 0.8):
        out, n_full = run_auto(lat, tau)
        results.append((tau, int(n_full), mse(out)))
        print(f"auto tau={tau:<5} n_full={int(n_full):2d} mse={mse(out):.6f}",
              flush=True)
    for interval in (2, 3, 4):
        sched = cache_reuse_schedule(steps, interval)
        n_full = int((~np.asarray(sched)).sum())
        out = run_fixed_sched(lat, sched)
        print(f"fixed interval={interval} n_full={n_full:2d} "
              f"mse={mse(out):.6f}", flush=True)

    # matched-cost comparison: synthesize a fixed schedule with EXACTLY the
    # same n_full as each auto point (evenly spaced full steps)
    print("--- matched-cost (same n_full, evenly spaced fixed grid) ---")
    for tau, n_full, mse_auto in results:
        idx = np.unique(np.linspace(0, steps - 1, n_full).round().astype(int))
        sched = np.ones((steps,), bool)
        sched[idx] = False  # False = full step
        out = run_fixed_sched(lat, jnp.asarray(sched))
        mse_grid = mse(out)
        verdict = "AUTO WINS" if mse_auto < mse_grid else "grid wins"
        print(f"n_full={n_full:2d}: auto {mse_auto:.6f} vs grid "
              f"{mse_grid:.6f}  [{verdict}]", flush=True)

    if on_tpu:
        # throughput at matched cost: time the tau whose n_full ~ 10
        tau10 = min(results, key=lambda r: abs(r[1] - 10))[0]

        def chain(run, *extra):
            o = lat
            t0 = time.time()
            for _ in range(3):
                res = run(o, *extra)
                out = res[0] if isinstance(res, tuple) else res
                o = lat + 0.0 * out[:, :1, :1, :1]
            _ = float(jnp.asarray(out)[0, 0, 0, 0])
            return (time.time() - t0) / 3

        dt_auto = chain(run_auto, tau10)
        n10 = int(run_auto(lat, tau10)[1])
        idx = np.unique(np.linspace(0, steps - 1, n10).round().astype(int))
        sched = np.ones((steps,), bool)
        sched[idx] = False
        dt_grid = chain(run_fixed_sched, jnp.asarray(sched))
        print(f"throughput at n_full={n10}: auto {1/dt_auto:.4f} img/s vs "
              f"grid {1/dt_grid:.4f} img/s")


if __name__ == "__main__":
    main()
