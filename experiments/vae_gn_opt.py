"""GroupNorm formulations in the 1024px VAE decoder (GN = 64 of 151 ms).

  current  x32 = cast(x); mean/var/normalize on the fp32 view
  twopass  reductions pull bf16 directly with dtype=f32 accumulation
           (mean pass, then centered-square pass, then one fma pass) — no
           fp32 materialization for XLA to schedule around
  onepass  s1/s2 in one fused read, var = E[x^2]-E[x]^2 (documented
           cancellation bound), then one fma pass

Run: nohup python experiments/vae_gn_opt.py > /tmp/vae_gn.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import flax.linen as nn

import tpdm_tpu.models.vae as vae_mod
from tpdm_tpu.models.layers import GroupNorm


class GroupNormTwoPass(GroupNorm):
    @nn.compact
    def __call__(self, x):
        return gn_twopass(self, x)


class GroupNormOnePass(GroupNorm):
    @nn.compact
    def __call__(self, x):
        return gn_onepass(self, x)


def gn_twopass(self, x):
    b, h, w, c = x.shape
    g = self.num_groups
    scale = self.param("scale", jax.nn.initializers.ones, (c,))
    bias = self.param("bias", jax.nn.initializers.zeros, (c,))
    xg = x.reshape(b, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(xg.astype(jnp.float32) - mean), axis=(1, 2, 4), keepdims=True
    )
    rstd = jax.lax.rsqrt(var + self.eps)
    y = (xg.astype(jnp.float32) - mean) * rstd
    y = y.reshape(b, h, w, c) * scale + bias
    return y.astype(x.dtype)


def gn_onepass(self, x):
    b, h, w, c = x.shape
    g = self.num_groups
    scale = self.param("scale", jax.nn.initializers.ones, (c,))
    bias = self.param("bias", jax.nn.initializers.zeros, (c,))
    xg = x.reshape(b, h, w, g, c // g)
    s1 = jnp.mean(xg, axis=(1, 2, 4), keepdims=True, dtype=jnp.float32)
    s2 = jnp.mean(
        jnp.square(xg.astype(jnp.float32)), axis=(1, 2, 4), keepdims=True
    )
    var = s2 - jnp.square(s1)
    rstd = jax.lax.rsqrt(var + self.eps)
    y = (xg.astype(jnp.float32) - s1) * rstd
    y = y.reshape(b, h, w, c) * scale + bias
    return y.astype(x.dtype)


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
    orig = vae_mod.GroupNorm

    # numerical sanity vs the current formulation on a small real input
    small = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32, 32), jnp.bfloat16)
    ref = vae.apply(params, small, method="decode")
    for name, cls in (("twopass", GroupNormTwoPass), ("onepass", GroupNormOnePass)):
        vae_mod.GroupNorm = cls
        got = vae.apply(params, small, method="decode")
        err = float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max())
        print(f"{name} maxerr vs current (32x32): {err:.2e}", flush=True)
        vae_mod.GroupNorm = orig

    print(f"current  {time_decode(vae, params, z):8.1f} ms", flush=True)
    vae_mod.GroupNorm = GroupNormTwoPass
    print(f"twopass  {time_decode(vae, params, z):8.1f} ms", flush=True)
    vae_mod.GroupNorm = GroupNormOnePass
    print(f"onepass  {time_decode(vae, params, z):8.1f} ms", flush=True)
    vae_mod.GroupNorm = orig


if __name__ == "__main__":
    main()
