"""Measure the second-order flow solvers' throughput on the real chip.

Claim under test (docs/PERF.md "Second-order flow solvers"): AB2 costs
exactly one model eval per step, so fixed-28 AB2 e2e must match Euler
within shared-chip noise; Heun costs 2T−1 evals, so it should run at
~half Euler's rate at the same step count (its value is matched
trajectory accuracy at roughly HALF the steps — heun-14 ≈ euler-28
accuracy class at euler-27-eval cost).

Timing: rep-chained inside one dispatch per trial, data-dependent
chaining so XLA cannot hoist, one-element host readback for sync (the
repo's standard methodology — docs/PERF.md).
"""
import sys, time

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
    from tpdm_tpu.pipeline.denoise import make_cfg_velocity_fn
    from tpdm_tpu.pipeline.sampler import fixed_schedule_sample_solver, solver_nfe

    cfg = (
        MMDiTConfig.sd3_medium()
        if on_tpu
        else MMDiTConfig.toy(dtype=jnp.bfloat16)
    )
    n_txt = 333 if on_tpu else 8
    model = MMDiT(cfg)
    b = 1
    lat = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
        jnp.bfloat16,
    )
    ctx2 = jax.random.normal(
        jax.random.PRNGKey(1), (2 * b, n_txt, cfg.joint_attention_dim),
        jnp.bfloat16,
    )
    pooled2 = jax.random.normal(
        jax.random.PRNGKey(2), (2 * b, cfg.pooled_projection_dim), jnp.bfloat16
    )
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(3), lat, jnp.ones((b,)),
        ctx2[:b], pooled2[:b],
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        ),
        shapes,
    )
    steps = 28
    sigmas = uniform_flow_sigmas(steps)

    def make_run(solver):
        @jax.jit
        def run(params, lat):
            vfn = make_cfg_velocity_fn(
                lambda *a: model.apply(params, *a), ctx2, pooled2, 7.0
            )
            return fixed_schedule_sample_solver(vfn, lat, sigmas, solver)

        return run

    reps = 3
    for solver in ("euler", "ab2", "heun"):
        run = make_run(solver)
        o = run(params, lat)
        float(o.astype(jnp.float32)[0, 0, 0, 0])  # warm + sync
        best = None
        for trial in range(2):
            t0 = time.time()
            o = lat
            for _ in range(reps):
                o = run(params, o)  # data-dependent chain: no hoisting
            float(o.astype(jnp.float32)[0, 0, 0, 0])
            dt = (time.time() - t0) / reps
            best = dt if best is None else min(best, dt)
        print(
            f"{solver:8s} 28-step: {best*1000:7.1f} ms/img = "
            f"{1/best:.4f} img/s (NFE {solver_nfe(steps, solver)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
