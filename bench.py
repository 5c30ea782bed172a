"""Benchmark: SD3-medium 1024x1024 generation throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Measured configuration (BASELINE.json config 2 family):
- Full SD3-medium MMDiT (2.04B params, bf16, Pallas flash attention), CFG
  batch doubling, guidance 7.0, 128x128x16 latents (1024px), 333 text
  tokens — the reference training/inference geometry
  (reference: src/models/stable_diffusion_3/modeling_sd3_pnt.py:456-457).
- Headline: fixed 28-step Euler flow sampler images/sec/chip.
- Extras: the TPM-adaptive sampler at its untrained paper init (alpha 2.5,
  beta 1.0 -> full-length schedules; trained TPMs cut NFE ~50%), and the
  per-forward latency.

vs_baseline: ratio to H100 + diffusers SD3-medium fp16 at 28 steps, taken
as 0.25 img/s (~4s/image, public diffusers numbers); the reference repo
itself publishes no numeric benchmarks (BASELINE.md).

Weights are zeros (dense math on TPU is value-independent); params are
passed as arguments so nothing constant-folds.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

H100_DIFFUSERS_IMG_PER_S = 0.25


def _sync(x) -> None:
    # The axon tunnel's block_until_ready is unreliable; force a host read.
    _ = np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def build(batch_images: int, on_tpu: bool):
    from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
    from tpdm_tpu.pipeline import SamplerConfig, adaptive_sample, fixed_schedule_sample
    from tpdm_tpu.pipeline.denoise import make_cfg_denoise_fn, make_cfg_velocity_fn
    from tpdm_tpu.ops.schedules import uniform_flow_sigmas

    if on_tpu:
        cfg = MMDiTConfig.sd3_medium()
        n_txt = 333
    else:  # CPU fallback so the bench never hard-fails off-TPU
        cfg = MMDiTConfig.toy(dtype=jnp.bfloat16, cache_front_blocks=1)
        n_txt = 8

    model = MMDiT(cfg)
    b = batch_images
    lat = jax.random.normal(
        jax.random.PRNGKey(0),
        (b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
        jnp.bfloat16,
    )
    ctx = jnp.zeros((2 * b, n_txt, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((2 * b, cfg.pooled_projection_dim), jnp.bfloat16)

    shapes = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jnp.zeros((2 * b,) + lat.shape[1:], jnp.bfloat16),
        jnp.ones((2 * b,)),
        ctx,
        pooled,
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        ),
        shapes,
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))

    grid = cfg.sample_size // cfg.patch_size
    tpm = TimePredictor(
        conv_out_channels=128 if on_tpu else 8,
        in_channels=2 * cfg.inner_dim,
        temb_dim=cfg.inner_dim,
        init_alpha=2.5,  # paper init (launch_sd3_train.sh:29-30)
        init_beta=1.0,
        dtype=jnp.bfloat16,
    )
    tpm_params = tpm.init(
        jax.random.PRNGKey(1),
        jnp.zeros((b, 2 * cfg.inner_dim, grid, grid), jnp.bfloat16),
        jnp.zeros((b, cfg.inner_dim), jnp.bfloat16),
    )
    # A trained-like policy: Beta mode ~0.61 stops at ~NFE 14 — the
    # reference's ~50% NFE headline shape — to measure the true end-to-end
    # early-stop speedup through the jitted while_loop (schedule is
    # simulated; quality claims need the real trained TPM weights).
    tpm_trained = TimePredictor(
        conv_out_channels=128 if on_tpu else 8,
        in_channels=2 * cfg.inner_dim,
        temb_dim=cfg.inner_dim,
        init_alpha=1.0,
        init_beta=0.55,
        dtype=jnp.bfloat16,
    )
    tpm_trained_params = tpm_trained.init(
        jax.random.PRNGKey(1),
        jnp.zeros((b, 2 * cfg.inner_dim, grid, grid), jnp.bfloat16),
        jnp.zeros((b, cfg.inner_dim), jnp.bfloat16),
    )

    from tpdm_tpu.models.vae import VAE, VAEConfig, make_fast_decode

    # bf16 decode (475 -> ~100 ms vs fp32; the diffusers anchor runs its
    # VAE in fp16 too). ONE code path with the training reward decode:
    # make_fast_decode builds the bf16+fp32-GN twin for both.
    vcfg = (
        VAEConfig.sd3()
        if on_tpu
        else VAEConfig.toy(latent_channels=cfg.in_channels)
    )
    vae = VAE(vcfg)
    decode_fn, _ = make_fast_decode(vae, None, jit=False)
    vshapes = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), lat[:1],
        jnp.zeros((1, 3, 8 * lat.shape[2], 8 * lat.shape[3]), jnp.bfloat16),
    )
    vae_params = jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        ),
        vshapes,
    )

    @jax.jit
    def run_decode_reps(vae_params, z, reps):
        # rep-chain INSIDE one dispatch: a per-call dispatch costs ~90 ms
        # of tunnel latency, comparable to the decode itself
        def body(i, zz):
            img = decode_fn(vae_params, zz)
            return z + 0.0 * img[:, :1, :1, :1].astype(z.dtype)
        return jax.lax.fori_loop(0, reps, body, z)

    steps = 28
    sigmas = uniform_flow_sigmas(steps)

    @jax.jit
    def run_fixed(params, lat):
        vfn = make_cfg_velocity_fn(
            lambda *a: model.apply(params, *a), ctx, pooled, 7.0
        )
        return fixed_schedule_sample(vfn, lat, sigmas)

    @jax.jit
    def run_adaptive(params, tpm_params, lat, key):
        dfn = make_cfg_denoise_fn(
            lambda *a: model.apply(params, *a), ctx, pooled, 7.0, grid, cfg.patch_size
        )
        out = adaptive_sample(
            dfn,
            lambda h, t: tpm.apply(tpm_params, h, t),
            lat,
            key,
            SamplerConfig(
                max_inference_steps=steps,
                predict=True,
                min_sigma=0.001,
                cache_activations=False,
            ),
        )
        return out.final_latents, out.num_steps, out.last_valid_index

    # ---- Δ-residual-cache legs (training-free DeepCache/Δ-DiT-class
    # acceleration; front4/interval3 measured best on v5e-1 —
    # experiments/bench_cache.py). Extra keys only: the headline stays the
    # uncached fixed-28 run so vs_baseline compares like-for-like. ----
    from tpdm_tpu.pipeline.denoise import (
        make_cfg_denoise_cached_fns,
        make_cfg_velocity_cached_fns,
    )
    from tpdm_tpu.pipeline.sampler import (
        CachedDenoise,
        cache_reuse_schedule,
        fixed_schedule_sample_cached,
    )

    n_img = grid * grid
    cache_sched = cache_reuse_schedule(steps, 3)

    def _mode_apply(params, mode):
        return lambda l, t, pe_, pp_, d: model.apply(
            params, l, t, pe_, pp_, delta=d, cache_mode=mode
        )

    @jax.jit
    def run_fixed_cached(params, lat):
        full_fn, reuse_fn = make_cfg_velocity_cached_fns(
            _mode_apply(params, "record"), _mode_apply(params, "reuse"),
            ctx, pooled, 7.0,
        )
        return fixed_schedule_sample_cached(
            full_fn, reuse_fn, lat, sigmas,
            jnp.zeros((2 * b, n_img, cfg.inner_dim), jnp.bfloat16),
            cache_sched,
        )

    @jax.jit
    def run_adaptive_cached(params, tpm_params, lat, key):
        full_fn, reuse_fn = make_cfg_denoise_cached_fns(
            _mode_apply(params, "record"), _mode_apply(params, "reuse"),
            ctx, pooled, 7.0, grid, cfg.patch_size,
        )
        cached = CachedDenoise(
            full_fn, reuse_fn,
            jnp.zeros((2 * b, n_img, cfg.inner_dim), jnp.bfloat16),
            cache_sched,
        )
        out = adaptive_sample(
            None,
            lambda h, t: tpm.apply(tpm_params, h, t),
            lat,
            key,
            SamplerConfig(
                max_inference_steps=steps,
                predict=True,
                min_sigma=0.001,
                cache_activations=False,
            ),
            cached=cached,
        )
        return out.final_latents, out.num_steps, out.last_valid_index

    # ---- stacked training-free legs: Δ-cache × guidance interval (the
    # round-8 composition, measured here for the driver artifact). The
    # (0.25, 0.85) sigma window guides 15/28 steps (1.287x alone,
    # experiments/bench_guidance_interval.py); composed with front4/int3
    # reuse the two multiply (reuse steps outside the window run the
    # front blocks on a SINGLE-batch conditional forward). ----
    from tpdm_tpu.pipeline.denoise import (
        interval_cached_init_delta,
        make_cfg_interval_denoise_cached_fns,
        make_cfg_interval_velocity_cached_fns,
    )

    G_INTERVAL = (0.25, 0.85)

    @jax.jit
    def run_fixed_stacked(params, lat):
        full_fn, reuse_fn = make_cfg_interval_velocity_cached_fns(
            _mode_apply(params, "record"), _mode_apply(params, "reuse"),
            ctx, pooled, 7.0, G_INTERVAL,
        )
        return fixed_schedule_sample_cached(
            full_fn, reuse_fn, lat, sigmas,
            interval_cached_init_delta(
                jnp.zeros((2 * b, n_img, cfg.inner_dim), jnp.bfloat16)
            ),
            cache_sched,
        )

    @jax.jit
    def run_adaptive_stacked(params, tpm_params, lat, key):
        full_fn, reuse_fn = make_cfg_interval_denoise_cached_fns(
            _mode_apply(params, "record"), _mode_apply(params, "reuse"),
            ctx, pooled, 7.0, G_INTERVAL, grid, cfg.patch_size,
        )
        cached = CachedDenoise(
            full_fn, reuse_fn,
            interval_cached_init_delta(
                jnp.zeros((2 * b, n_img, cfg.inner_dim), jnp.bfloat16)
            ),
            cache_sched,
        )
        out = adaptive_sample(
            None,
            lambda h, t: tpm.apply(tpm_params, h, t),
            lat,
            key,
            SamplerConfig(
                max_inference_steps=steps,
                predict=True,
                min_sigma=0.001,
                cache_activations=False,
            ),
            cached=cached,
        )
        return out.final_latents, out.num_steps, out.last_valid_index

    return dict(
        run_fixed=run_fixed,
        run_adaptive=run_adaptive,
        run_fixed_cached=run_fixed_cached,
        run_adaptive_cached=run_adaptive_cached,
        run_fixed_stacked=run_fixed_stacked,
        run_adaptive_stacked=run_adaptive_stacked,
        run_decode_reps=run_decode_reps,
        params=params,
        tpm_params=tpm_params,
        tpm_trained_params=tpm_trained_params,
        vae_params=vae_params,
        lat=lat,
        n_params=n_params,
        steps=steps,
    )


def _time_forward_loop(fwd, params, lat, reps):
    """ms/forward via a rep-chained fori_loop in ONE dispatch (per-call
    tunnel latency ~90 ms would otherwise dominate)."""

    @jax.jit
    def loop(params, lat):
        def body(i, ll):
            out = fwd(params, ll)
            return lat + 0.001 * out.astype(lat.dtype)

        return jax.lax.fori_loop(0, reps, body, lat)

    _sync(loop(params, lat))
    best = float("inf")
    for _ in range(2):  # min of 2 passes: co-tenant-interference robust
        t0 = time.time()
        _sync(loop(params, lat))
        best = min(best, (time.time() - t0) / reps * 1000)
    return best


def _zeros_params(model, *probe_args):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *probe_args)
    return jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        ),
        shapes,
    )


def _free_device_memory():
    """Drop dead device buffers between model families: a 16GB v5e cannot
    hold the SD3 bench world AND the 2.6B SDXL (or reduced-depth FLUX)
    weights at once — without this the family section dies
    RESOURCE_EXHAUSTED (observed on the first TPU run)."""
    import gc

    gc.collect()
    try:
        jax.clear_caches()  # jit executable caches pin their constants
    except Exception:
        pass
    gc.collect()


def family_throughput(on_tpu: bool) -> dict:
    """Per-family img/s/chip keys (SD1.5, SDXL, FLUX) for the driver
    artifact — forward-timing methodology matching experiments/
    bench_sd15.py, bench_sdxl.py, bench_flux.py. On CPU uses toy
    geometry so the keys exist but carry a 'families_geometry' marker.
    Each family's weights are freed before the next is built."""
    from tpdm_tpu.models.flux import Flux, FluxConfig
    from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15

    out = {"families_geometry": "full" if on_tpu else "toy-cpu"}
    reps = 10 if on_tpu else 2

    # ---- SD1.5: 512px (64x64 latents), CFG batch 2, 28 DPM steps ----
    ucfg = UNetConfig.sd15(dtype=jnp.bfloat16) if on_tpu else UNetConfig.toy(
        dtype=jnp.bfloat16
    )
    unet = UNetSD15(ucfg)
    b = 2
    lat = jax.random.normal(
        jax.random.PRNGKey(0), (b, 4, ucfg.sample_size, ucfg.sample_size),
        jnp.bfloat16,
    )
    t = jnp.full((b,), 500.0)
    ctx = jnp.zeros((b, 77 if on_tpu else 5, ucfg.cross_attention_dim), jnp.bfloat16)
    params = _zeros_params(unet, lat, t, ctx)
    ms = _time_forward_loop(
        lambda p, ll: unet.apply(p, ll, t, ctx)[0], params, lat, reps
    )
    out["sd15_img_per_s"] = round(1000.0 / (ms * 28), 4)
    out["sd15_forward_ms"] = round(ms, 2)
    del unet, params, lat, ctx
    _free_device_memory()

    # ---- SDXL-base: 1024px (128x128 latents), 2.6B, CFG batch 2 ----
    xcfg = (
        UNetConfig.sdxl(dtype=jnp.bfloat16)
        if on_tpu
        else UNetConfig.toy_xl(dtype=jnp.bfloat16)
    )
    xunet = UNetSD15(xcfg)
    xlat = jax.random.normal(
        jax.random.PRNGKey(0), (b, 4, xcfg.sample_size, xcfg.sample_size),
        jnp.bfloat16,
    )
    xctx = jnp.zeros(
        (b, 77 if on_tpu else 5, xcfg.cross_attention_dim), jnp.bfloat16
    )
    added = {
        "text_embeds": jnp.zeros((b, xcfg.addition_pooled_dim), jnp.bfloat16),
        "time_ids": jnp.broadcast_to(
            jnp.asarray([1024.0, 1024.0, 0.0, 0.0, 1024.0, 1024.0]), (b, 6)
        ),
    }
    xparams = _zeros_params(xunet, xlat, t, xctx, added)
    ms = _time_forward_loop(
        lambda p, ll: xunet.apply(p, ll, t, xctx, added)[0], xparams, xlat,
        reps,
    )
    out["sdxl_img_per_s"] = round(1000.0 / (ms * 28), 4)
    out["sdxl_forward_ms"] = round(ms, 2)
    del xunet, xparams, xlat, xctx, added
    _free_device_memory()

    # ---- FLUX: 12B bf16 exceeds one 16GB chip, so measure per-layer
    # cost at two reduced depths and extrapolate to 19/38 (the
    # experiments/bench_flux.py model: a double block ~2x a single);
    # img/s at schnell's 4 steps ----
    def flux_ms(dd, ds):
        fcfg = (
            FluxConfig.flux_dev(depth_double=dd, depth_single=ds)
            if on_tpu
            else FluxConfig.toy(
                depth_double=dd, depth_single=ds, dtype=jnp.bfloat16
            )
        )
        model = Flux(fcfg)
        n_img, n_txt = (4096, 512) if on_tpu else (64, 5)
        img = jnp.zeros((1, n_img, fcfg.in_channels), jnp.bfloat16)
        img_ids = jnp.zeros((1, n_img, 3))
        txt = jnp.zeros((1, n_txt, fcfg.txt_dim), jnp.bfloat16)
        txt_ids = jnp.zeros((1, n_txt, 3))
        tf = jnp.full((1,), 0.5)
        vec = jnp.zeros((1, fcfg.vec_dim), jnp.bfloat16)
        g = jnp.full((1,), 3.5)
        fparams = _zeros_params(model, img, img_ids, txt, txt_ids, tf, vec, g)
        ms = _time_forward_loop(
            lambda p, ii: model.apply(p, ii, img_ids, txt, txt_ids, tf, vec, g)[0],
            fparams, img, reps,
        )
        del fparams
        _free_device_memory()
        return ms

    ms_a, w_a = flux_ms(4, 8), 4 + 8 / 2
    ms_b, w_b = flux_ms(8, 16), 8 + 16 / 2
    slope = (ms_b - ms_a) / (w_b - w_a)
    full = max(ms_a - slope * w_a + slope * (19 + 38 / 2), 1e-6)
    out["flux_img_per_s"] = round(1000.0 / (4 * full), 4)
    out["flux_forward_ms_extrapolated"] = round(full, 1)
    return out


def main():
    if "--cpu" in sys.argv:  # force the CPU fallback (the session env pins
        jax.config.update("jax_platforms", "cpu")  # the axon TPU plugin)
    # persistent compile cache: the remote compile helper degrades under
    # load (10+ min per jit observed); cached executables make bench runs
    # reproducible in minutes. Harmless no-op if the backend can't
    # serialize executables.
    from tpdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu", "gpu")
    # batch 1 (CFG batch 2) measured best img/s/chip; throughput is flat in
    # batch because 2x4429 tokens already saturates the chip.
    b = 1
    world = build(b, on_tpu)
    params, tpm_params, lat = world["params"], world["tpm_params"], world["lat"]
    steps = world["steps"]

    # The shared tunnel chip occasionally has a co-tenant: a single timing
    # pass can read 50%+ slow (round-4 driver artifact: adaptive leg 0.16
    # img/s vs 0.27 re-measured quiet — same program). Every leg therefore
    # times `passes` rep-chained passes and keeps the MINIMUM per-rep time
    # (min, not mean, is the interference-robust statistic: noise is
    # strictly additive).
    passes = 2 if on_tpu else 1
    reps = 3 if on_tpu else 1

    def timed_min(fn, warm):
        _sync(warm())  # compile + first run
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            out = fn()
            _sync(out)
            best = min(best, (time.time() - t0) / reps)
        return best

    # ---- fixed 28-step baseline ----
    def fixed_pass(runner):
        def run():
            o = lat
            for _ in range(reps):
                o = runner(params, o)  # chain to avoid tunnel latency
            return o
        return run

    fixed_dt = timed_min(fixed_pass(world["run_fixed"]),
                         lambda: world["run_fixed"](params, lat))
    fixed_img_s = b / fixed_dt

    # ---- adaptive sampler (untrained TPM, deterministic mode) ----
    # rep-chained like the fixed loop (round-1 single-shot numbers sat
    # inside the tunnel's noise floor); latents chain data-dependently.
    key = jax.random.PRNGKey(2)

    def timed_adaptive(tpm_p, reps, runner=None):
        run = runner or world["run_adaptive"]
        final, num_steps, lvi = run(params, tpm_p, lat, key)
        _sync(final)
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            o = lat
            for _ in range(reps):
                final, num_steps, lvi = run(params, tpm_p, o, key)
                o = lat + 0.0 * final[:, :1, :1, :1]
            _sync(final)
            best = min(best, (time.time() - t0) / reps)
        return best, lvi

    reps_a = 3 if on_tpu else 1
    adaptive_dt, lvi = timed_adaptive(tpm_params, reps_a)
    mean_nfe = float(np.mean(np.asarray(lvi)) + 1)
    adaptive_img_s = b / adaptive_dt

    # trained-like schedule (~NFE 14): the ~50% NFE headline, end to end
    trained_dt, lvi_t = timed_adaptive(world["tpm_trained_params"], reps_a)
    trained_nfe = float(np.mean(np.asarray(lvi_t)) + 1)
    trained_img_s = b / trained_dt

    # ---- Δ-residual-cache legs (training-free; front4/interval3) ----
    cached_fixed_dt = timed_min(
        fixed_pass(world["run_fixed_cached"]),
        lambda: world["run_fixed_cached"](params, lat),
    )

    cached_trained_dt, lvi_ct = timed_adaptive(
        world["tpm_trained_params"], reps_a, runner=world["run_adaptive_cached"]
    )
    cached_trained_nfe = float(np.mean(np.asarray(lvi_ct)) + 1)

    # ---- stacked legs: Δ-cache × guidance interval ((0.25, 0.85) sigma
    # window; composed combinator from round 8) ----
    stacked_fixed_dt = timed_min(
        fixed_pass(world["run_fixed_stacked"]),
        lambda: world["run_fixed_stacked"](params, lat),
    )
    stacked_trained_dt, lvi_st = timed_adaptive(
        world["tpm_trained_params"], reps_a,
        runner=world["run_adaptive_stacked"],
    )
    stacked_trained_nfe = float(np.mean(np.asarray(lvi_st)) + 1)

    # ---- VAE decode (runs once per image; the diffusers anchor includes
    # it, so the headline does too) ----
    dreps = 8 if on_tpu else 1
    out_d = world["run_decode_reps"](world["vae_params"], lat, dreps)
    _sync(out_d)
    decode_dt = float("inf")
    for _ in range(passes):
        t0 = time.time()
        out_d = world["run_decode_reps"](world["vae_params"], lat, dreps)
        _sync(out_d)
        decode_dt = min(decode_dt, (time.time() - t0) / dreps)

    fixed_e2e_img_s = b / (fixed_dt + decode_dt)
    trained_e2e_img_s = b / (trained_dt + decode_dt)

    result = {
        "metric": "images/sec/chip (SD3-medium 1024x1024, 28-step CFG Euler + VAE decode)",
        "value": round(fixed_e2e_img_s, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(fixed_e2e_img_s / H100_DIFFUSERS_IMG_PER_S, 3),
        "denoise_only_img_per_s": round(fixed_img_s, 4),
        "decode_ms": round(decode_dt * 1000, 1),
        "trained_like_e2e_img_per_s": round(trained_e2e_img_s, 4),
        "backend": backend,
        "batch_images": b,
        "params_B": round(world["n_params"] / 1e9, 3),
        "step_ms": round(fixed_dt / steps * 1000, 1),
        "adaptive_img_per_s": round(adaptive_img_s, 4),
        "adaptive_mean_nfe": mean_nfe,
        "adaptive_overhead_pct": round(
            100 * (adaptive_dt * steps / (mean_nfe if mean_nfe else steps) / fixed_dt - 1), 1
        ),
        "adaptive_trained_like_img_per_s": round(trained_img_s, 4),
        "adaptive_trained_like_mean_nfe": trained_nfe,
        # training-free Δ-residual cache (front4/interval3): fixed-28 and
        # stacked with the trained-like TPM early stop — approximate paths,
        # reported alongside (never as) the exact headline
        "cached_e2e_img_per_s": round(b / (cached_fixed_dt + decode_dt), 4),
        "cached_speedup_vs_fixed": round(fixed_dt / cached_fixed_dt, 3),
        "cached_trained_like_e2e_img_per_s": round(
            b / (cached_trained_dt + decode_dt), 4
        ),
        "cached_trained_like_mean_nfe": cached_trained_nfe,
        "cache_setting": "front4_interval3",
        # Δ-cache × guidance-interval composition (the round-8 combinator):
        # fixed-28 and stacked with the trained-like TPM early stop
        "stacked_e2e_img_per_s": round(b / (stacked_fixed_dt + decode_dt), 4),
        "stacked_speedup_vs_fixed": round(fixed_dt / stacked_fixed_dt, 3),
        "stacked_trained_like_e2e_img_per_s": round(
            b / (stacked_trained_dt + decode_dt), 4
        ),
        "stacked_trained_like_mean_nfe": stacked_trained_nfe,
        "stacked_setting": "front4_interval3_gi0.25-0.85",
    }
    # whole-family surface (SD1.5 / SDXL / FLUX keys; round-3 VERDICT
    # item 6) — measured last so a family failure can't cost the headline
    try:
        # free the SD3 world first: its 2B params + executables do not
        # coexist with the 2.6B SDXL weights on a 16GB chip
        del world, params, tpm_params, lat, out_d
        _free_device_memory()
        result.update(family_throughput(on_tpu))
    except Exception as e:  # pragma: no cover - keep the ONE line printing
        result["families_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
