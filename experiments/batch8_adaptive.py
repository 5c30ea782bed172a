"""BASELINE.json config 2 at batch 8: one-host 1024px adaptive throughput.

Round-2 VERDICT item 6: PERF.md's flat batch-1->8 scaling claim came from
the round-1 kernel; this measures the CURRENT transposed kernel +
included-decode pipeline at batch 8 so the claim is a number, not an
extrapolation. Reuses bench.py's world builder (same models, same rep-chain
methodology, same sync discipline).

Run: nohup python experiments/batch8_adaptive.py > /tmp/batch8.log 2>&1 &
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpdm_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import bench


def main():
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu", "gpu")
    b = 8
    world = bench.build(b, on_tpu)
    params, tpm_params, lat = world["params"], world["tpm_params"], world["lat"]
    steps = world["steps"]
    reps = 2 if on_tpu else 1

    # fixed 28-step at batch 8
    out = world["run_fixed"](params, lat)
    bench._sync(out)
    t0 = time.time()
    o = lat
    for _ in range(reps):
        o = world["run_fixed"](params, o)
    bench._sync(o)
    fixed_dt = (time.time() - t0) / reps

    # adaptive, trained-like (~NFE14) at batch 8
    key = jax.random.PRNGKey(2)
    final, _, lvi = world["run_adaptive"](
        params, world["tpm_trained_params"], lat, key
    )
    bench._sync(final)
    t0 = time.time()
    o = lat
    for _ in range(reps):
        final, _, lvi = world["run_adaptive"](
            params, world["tpm_trained_params"], o, key
        )
        o = lat + 0.0 * final[:, :1, :1, :1]
    bench._sync(final)
    trained_dt = (time.time() - t0) / reps
    trained_nfe = float(np.mean(np.asarray(lvi)) + 1)

    # decode at batch 8
    dreps = 4 if on_tpu else 1
    out_d = world["run_decode_reps"](world["vae_params"], lat, dreps)
    bench._sync(out_d)
    t0 = time.time()
    out_d = world["run_decode_reps"](world["vae_params"], lat, dreps)
    bench._sync(out_d)
    decode_dt = (time.time() - t0) / dreps

    result = {
        "experiment": "batch8_adaptive_1024px",
        "backend": backend,
        "batch_images": b,
        "fixed28_img_per_s": round(b / fixed_dt, 4),
        "fixed28_e2e_img_per_s": round(b / (fixed_dt + decode_dt), 4),
        "step_ms_per_batch": round(fixed_dt / steps * 1000, 1),
        "trained_like_img_per_s": round(b / trained_dt, 4),
        "trained_like_e2e_img_per_s": round(b / (trained_dt + decode_dt), 4),
        "trained_like_mean_nfe": trained_nfe,
        "decode_ms_per_batch": round(decode_dt * 1000, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
