"""FLUX-class geometry on one chip: kernel rate at d=128 + per-layer cost.

FLUX-dev (19 double + 38 single blocks, 12B params) needs ~24GB of bf16
weights — more than one v5e's HBM, so full-model serving requires the
fsdp/tensor mesh axes. This measures what one chip CAN say:
  - flash kernel at the FLUX attention shape (h=24, d=128: the MXU's
    contraction is FULL, unlike SD3's half-filling d=64),
  - per-layer forward cost at reduced depth, extrapolated to full depth.

Run: nohup python experiments/bench_flux.py > /tmp/bench_flux.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpdm_tpu.models.flux import Flux, FluxConfig
from tpdm_tpu.ops.attention import flash_attention


def _sync(x):
    # one-element device-side slice: np.asarray of the full array drags
    # tens of MB through the tunnel (~1.5 s) and poisons per-rep timing
    return float(jax.tree.leaves(x)[0].reshape(-1)[0].astype(jnp.float32))


def kernel_rate():
    b, h, n, d = 1, 24, 4608, 128  # FLUX 1024px: 4096 img + 512 txt tokens
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(kk, q.shape, jnp.bfloat16)
    v = jax.random.normal(kv, q.shape, jnp.bfloat16)
    reps = 30

    @jax.jit
    def loop(q, k, v):
        def body(i, x):
            o = flash_attention(x, k, v)
            return q + (0.001 * o.astype(jnp.float32)).astype(q.dtype)
        return jax.lax.fori_loop(0, reps, body, q)

    _sync(loop(q, k, v))
    t0 = time.perf_counter()
    _sync(loop(q, k, v))
    ms = (time.perf_counter() - t0) / reps * 1000
    tf = 4 * b * h * n * n * d / ms / 1e9
    print(f"flash kernel at FLUX shape (24h x 4608 x d128): {ms:6.3f} ms "
          f"= {tf:5.1f} TF/s", flush=True)


def layer_cost(depth_double, depth_single):
    cfg = FluxConfig.flux_dev(
        depth_double=depth_double, depth_single=depth_single
    )
    model = Flux(cfg)
    b, n_img, n_txt = 1, 4096, 512
    img = jnp.zeros((b, n_img, cfg.in_channels), jnp.bfloat16)
    img_ids = jnp.zeros((b, n_img, 3))
    txt = jnp.zeros((b, n_txt, cfg.txt_dim), jnp.bfloat16)
    txt_ids = jnp.zeros((b, n_txt, 3))
    t = jnp.full((b,), 0.5)
    vec = jnp.zeros((b, cfg.vec_dim), jnp.bfloat16)
    g = jnp.full((b,), 3.5)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), img, img_ids, txt, txt_ids, t, vec, g
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        ),
        shapes,
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))

    @jax.jit
    def fwd(params, img):
        out = model.apply(params, img, img_ids, txt, txt_ids, t, vec, g)
        return out[0]

    reps = 10

    @jax.jit
    def loop(params, img0):
        def body(i, x):
            o = fwd(params, x)
            return img0 + (0.001 * o.astype(jnp.float32)).astype(img0.dtype)
        return jax.lax.fori_loop(0, reps, body, img0)

    _sync(loop(params, img))
    t0 = time.perf_counter()
    _sync(loop(params, img))
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"FLUX d{depth_double}/s{depth_single} ({n_params/1e9:.2f}B): "
          f"{ms:7.1f} ms/forward", flush=True)
    return ms, depth_double + depth_single / 2


def main():
    kernel_rate()
    ms_a, w_a = layer_cost(4, 8)
    ms_b, w_b = layer_cost(8, 16)
    # double blocks ~2x a single block's cost; extrapolate to 19/38
    slope = (ms_b - ms_a) / (w_b - w_a)
    fixed = ms_a - slope * w_a
    full = fixed + slope * (19 + 38 / 2)
    print(f"extrapolated FLUX-dev (19/38) forward: {full:.0f} ms "
          f"-> schnell-4-step {1000 / (4 * full):.3f} img/s/chip "
          f"(weights need fsdp over >=2 chips)", flush=True)


if __name__ == "__main__":
    main()
