"""Where do the VAE decoder's 334 ms go? (1024px, bf16, v5e)

Conv roofline says ~90 ms; measured 334. Bisection by monkeypatching one
suspect at a time:
  full        as-is
  no_gn       GroupNorm -> identity (isolates fp32-stats HBM passes)
  no_attn     VAEAttention -> residual identity
  bcast_up    jax.image.resize -> broadcast-reshape upsample (resize can
              lower to gathers on TPU)
  all         no_gn + bcast_up combined (attention kept)

Run: nohup python experiments/vae_decode_breakdown.py > /tmp/vae_bd.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import tpdm_tpu.models.vae as vae_mod
from tpdm_tpu.models.layers import GroupNorm


def broadcast_resize(x, shape, method):
    b, h, w, c = x.shape
    _, H, W, _ = shape
    fh, fw = H // h, W // w
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, fh, w, fw, c))
    return y.reshape(b, H, W, c)


def build(dtype=jnp.bfloat16):
    cfg = vae_mod.VAEConfig.sd3(dtype=dtype)
    vae = vae_mod.VAE(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 128, 128), dtype)
    shapes = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), z, jnp.zeros((1, 3, 1024, 1024), dtype)
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32 else s.dtype),
        shapes,
    )
    return vae, params, z


def time_decode(vae, params, z, reps=10):
    @jax.jit
    def loop(params, z):
        def body(i, zz):
            img = vae.apply(params, zz, method="decode")
            return z + 0.0 * img[:, :1, :1, :1].astype(z.dtype)
        return jax.lax.fori_loop(0, reps, body, z)

    float(loop(params, z).reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    float(loop(params, z).reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    vae, params, z = build()

    orig_gn_call = GroupNorm.__call__
    orig_resize = jax.image.resize
    orig_attn_call = vae_mod.VAEAttention.__call__

    def report(name):
        try:
            ms = time_decode(vae, params, z)
            print(f"{name:12s} {ms:8.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    report("full")

    GroupNorm.__call__ = lambda self, x: x
    report("no_gn")
    GroupNorm.__call__ = orig_gn_call

    vae_mod.VAEAttention.__call__ = lambda self, x: x
    report("no_attn")
    vae_mod.VAEAttention.__call__ = orig_attn_call

    jax.image.resize = broadcast_resize
    report("bcast_up")

    GroupNorm.__call__ = lambda self, x: x
    report("all(no_gn+bcast)")
    GroupNorm.__call__ = orig_gn_call
    jax.image.resize = orig_resize


if __name__ == "__main__":
    main()
