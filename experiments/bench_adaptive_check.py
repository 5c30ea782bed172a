"""Re-measure fixed-28 vs adaptive (untrained + trained-like) denoise rates.

Round-4 driver bench recorded adaptive_img_per_s 0.1602 (overhead +68.5%)
against round-3's 0.2736 (-1.5%) with an unchanged run_adaptive program —
this isolates whether that was a real regression or shared-chip co-tenant
noise (BENCH ran at 05:54 while other sessions used the tunnel chip).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np
import bench as B

def main():
    from tpdm_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    world = B.build(1, on_tpu)
    params, tpm_params, lat = world["params"], world["tpm_params"], world["lat"]
    key = jax.random.PRNGKey(2)
    def sync(x):
        B._sync(x)
    # fixed
    o = world["run_fixed"](params, lat); sync(o)
    reps = 3
    for name, runner, tp in [
        ("fixed", None, None),
        ("adaptive_untrained", world["run_adaptive"], tpm_params),
        ("adaptive_trained", world["run_adaptive"], world["tpm_trained_params"]),
    ]:
        for trial in range(3):
            if runner is None:
                t0 = time.time(); o = lat
                for _ in range(reps):
                    o = world["run_fixed"](params, o)
                sync(o); dt = (time.time() - t0) / reps
                print(f"{name} trial{trial}: {dt*1000:.0f} ms/img = {1/dt:.4f} img/s", flush=True)
            else:
                final, num_steps, lvi = runner(params, tp, lat, key); sync(final)
                t0 = time.time(); o = lat
                for _ in range(reps):
                    final, num_steps, lvi = runner(params, tp, o, key)
                    o = lat + 0.0 * final[:, :1, :1, :1]
                sync(final); dt = (time.time() - t0) / reps
                nfe = float(np.mean(np.asarray(lvi)) + 1)
                print(f"{name} trial{trial}: {dt*1000:.0f} ms/img = {1/dt:.4f} img/s nfe={nfe}", flush=True)

if __name__ == "__main__":
    main()
