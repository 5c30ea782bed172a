"""Big-backbone single-chip legs: models that only fit via stored-int8.

v5e-1 has 16 GB HBM. FLUX-dev class (12B) is 23.8 GB in bf16 and
SD3.5-large class (8B) is 16.1 GB — neither fits; stored-int8
(ops/quant.py, W8A8-dynamic blocks + weight-only modulations for FLUX)
brings them to ~12 GB / ~8 GB and makes one-chip serving possible at all.
The reference never runs FLUX (capability named at
gradio_sd3_inference.py:23-28 but absent) and its fp16 FLUX would need a
>24 GB GPU.

Usage:  python experiments/bench_big_int8.py [flux] [sd35l] [--steps N] [--w4]
(--w4: group-int4 weight-only instead of int8 — the 4x capacity tier)
Prints one JSON line per leg: forward ms, img/s at N steps, HBM stats.

Timing per docs/PERF.md methodology: reps chained data-dependently inside
ONE jit dispatch (fori_loop), single one-element host readback.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def int8_zero_params(shapes):
    """Materialize a zeros param tree from eval_shape with int8 (or int4:
    2-D kernel_scale, see prequantize_params) kernels wherever a
    kernel_scale sibling marks a quantized Dense — without ever
    materializing the bf16 tree (24 GB for FLUX-dev would OOM the chip)."""
    def walk(node):
        if isinstance(node, dict):
            if "kernel" in node and "kernel_scale" in node and (
                getattr(node["kernel"], "ndim", 0) == 2
            ):
                qdtype = (
                    jnp.int4
                    if getattr(node["kernel_scale"], "ndim", 1) == 2
                    else jnp.int8
                )
                out = dict(node)
                out["kernel"] = jnp.zeros(node["kernel"].shape, qdtype)
                out["kernel_scale"] = jnp.ones(
                    node["kernel_scale"].shape, jnp.float32
                )
                out = {
                    k: (v if k in ("kernel", "kernel_scale")
                        else jnp.zeros(v.shape, jnp.bfloat16))
                    for k, v in out.items()
                }
                return out
            return {k: walk(v) for k, v in node.items()}
        return jnp.zeros(
            node.shape,
            jnp.bfloat16 if node.dtype == jnp.float32 else node.dtype,
        )

    return walk(shapes)


def _sync(x):
    _ = np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def _param_bytes(tree):
    # logical bytes: int4 counts 0.5/elt (XLA packs s4 two per byte in
    # HBM; the CPU ml_dtypes view byte-expands, so itemsize would lie)
    def nb(a):
        per = 0.5 if a.dtype == jnp.int4 else a.dtype.itemsize
        return int(np.prod(a.shape)) * per
    return int(sum(nb(a) for a in jax.tree.leaves(tree)))


def _mem_stats():
    try:
        s = jax.local_devices()[0].memory_stats()
        return {
            "hbm_in_use_gb": round(s.get("bytes_in_use", 0) / 2**30, 2),
            "hbm_limit_gb": round(s.get("bytes_limit", 0) / 2**30, 2),
        }
    except Exception:
        return {}


def leg_flux(steps: int, reps: int, bits: int = 8):
    from tpdm_tpu.models.flux import Flux, FluxConfig, pack_latents

    cfg = FluxConfig.flux_dev(quant_matmuls=True, quant_bits=bits)
    model = Flux(cfg)
    b = 1  # guidance-distilled: no CFG doubling
    lat = jax.random.normal(
        jax.random.PRNGKey(0), (b, 16, 128, 128), jnp.bfloat16
    )  # 1024px
    tokens, img_ids = pack_latents(lat)
    n_txt = 512
    txt = jnp.zeros((b, n_txt, cfg.txt_dim), jnp.bfloat16)
    txt_ids = jnp.zeros((b, n_txt, 3), jnp.float32)
    t = jnp.full((b,), 0.5, jnp.float32)
    pooled = jnp.zeros((b, cfg.vec_dim), jnp.bfloat16)
    g = jnp.full((b,), 3.5, jnp.float32)

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), tokens, img_ids, txt, txt_ids,
        t, pooled, g,
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    params = int8_zero_params(shapes)

    @jax.jit
    def run_reps(params, tok, reps):
        def body(i, tok):
            vel, _, _, _ = model.apply(
                params, tok, img_ids, txt, txt_ids, t, pooled, g
            )
            return tok + 0.0 * vel[:, :1, :1]

        return jax.lax.fori_loop(0, reps, body, tok)

    out = run_reps(params, tokens, 1)
    _sync(out)  # compile + first run
    t0 = time.time()
    out = run_reps(params, tokens, reps)
    _sync(out)
    fwd_s = (time.time() - t0) / reps
    return {
        "leg": f"flux_dev_int{bits}_1chip",
        "n_params": n_params,
        "param_gb": round(_param_bytes(params) / 2**30, 2),
        "tokens": int(tokens.shape[1] + n_txt),
        "forward_ms": round(fwd_s * 1e3, 1),
        "img_per_s_at_steps": round(1.0 / (steps * fwd_s), 4),
        "steps": steps,
        **_mem_stats(),
    }


def leg_sd35l(steps: int, reps: int, bits: int = 8):
    from tpdm_tpu.models import MMDiT, MMDiTConfig

    cfg = MMDiTConfig.sd35_large(quant_matmuls=True, quant_bits=bits)
    model = MMDiT(cfg)
    b = 1
    lat = jax.random.normal(
        jax.random.PRNGKey(0),
        (2 * b, cfg.in_channels, cfg.sample_size, cfg.sample_size),
        jnp.bfloat16,
    )  # CFG batch doubling (guidance 3.5 for SD3.5, modeling_sd3_pnt.py:795-796)
    ctx = jnp.zeros((2 * b, 333, cfg.joint_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((2 * b, cfg.pooled_projection_dim), jnp.bfloat16)
    tt = jnp.full((2 * b,), 500.0, jnp.float32)

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), lat, tt, ctx, pooled
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    params = int8_zero_params(shapes)

    @jax.jit
    def run_reps(params, lat, reps):
        def body(i, la):
            vel, _, _, _ = model.apply(params, la, tt, ctx, pooled)
            return la + 0.0 * vel[:, :1, :1, :1]

        return jax.lax.fori_loop(0, reps, body, lat)

    out = run_reps(params, lat, 1)
    _sync(out)
    t0 = time.time()
    out = run_reps(params, lat, reps)
    _sync(out)
    fwd_s = (time.time() - t0) / reps
    return {
        "leg": f"sd35_large_int{bits}_1chip",
        "n_params": n_params,
        "param_gb": round(_param_bytes(params) / 2**30, 2),
        "forward_ms": round(fwd_s * 1e3, 1),
        "img_per_s_at_steps": round(b / (steps * fwd_s), 4),
        "steps": steps,
        **_mem_stats(),
    }


def main():
    from tpdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    legs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "sd35l", "flux"
    ]
    steps = 28
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    reps = 3
    bits = 4 if "--w4" in sys.argv else 8
    for leg in legs:
        fn = {"flux": leg_flux, "sd35l": leg_sd35l}[leg]
        print(json.dumps(fn(steps, reps, bits)), flush=True)


if __name__ == "__main__":
    main()
