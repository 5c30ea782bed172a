"""End-to-end toy generation drive: adaptive TPDM sampling on a tiny MMDiT.

Run: JAX_PLATFORMS=cpu python examples/generate_toy.py
Prints per-step sigmas, the realized step count vs the cap, and output
stats — the smallest full exercise of the framework's inference path.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.config.jax_platforms and "axon" in str(jax.config.jax_platforms):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
from tpdm_tpu.pipeline import SamplerConfig, adaptive_sample
from tpdm_tpu.pipeline.denoise import make_cfg_denoise_fn


def main():
    cfg = MMDiTConfig.toy()
    model = MMDiT(cfg)
    b = 2
    key = jax.random.PRNGKey(0)

    latents = jax.random.normal(
        key, (b, cfg.in_channels, cfg.sample_size, cfg.sample_size)
    )
    ctx = jax.random.normal(
        jax.random.PRNGKey(1), (2 * b, 6, cfg.joint_attention_dim)
    )
    pooled = jax.random.normal(
        jax.random.PRNGKey(2), (2 * b, cfg.pooled_projection_dim)
    )
    params = model.init(
        jax.random.PRNGKey(3),
        jnp.concatenate([latents] * 2),
        jnp.ones((2 * b,)),
        ctx,
        pooled,
    )

    grid = cfg.sample_size // cfg.patch_size
    tpm = TimePredictor(
        conv_out_channels=8,
        in_channels=2 * cfg.inner_dim,
        temb_dim=cfg.inner_dim,
        # steer toward small ratios so the adaptive stop actually triggers
        init_alpha=0.5,
        init_beta=2.0,
    )
    tpm_params = tpm.init(
        jax.random.PRNGKey(4),
        jnp.zeros((b, 2 * cfg.inner_dim, grid, grid)),
        jnp.zeros((b, cfg.inner_dim)),
    )

    denoise_fn = make_cfg_denoise_fn(
        lambda *a: model.apply(params, *a), ctx, pooled, 7.0, grid, cfg.patch_size
    )
    scfg = SamplerConfig(max_inference_steps=28, predict=True, min_sigma=0.01)

    out = jax.jit(
        lambda l, k: adaptive_sample(
            denoise_fn, lambda h, t: tpm.apply(tpm_params, h, t), l, k, scfg
        )
    )(latents, jax.random.PRNGKey(5))

    n = int(out.num_steps)
    print(f"steps taken: {n} / cap {scfg.max_inference_steps}")
    for i in range(b):
        sig = np.asarray(out.sigmas)[i, :n]
        print(f"sample {i}: sigmas = {np.round(sig, 4).tolist()}")
        print(
            f"sample {i}: last_valid_index={int(out.last_valid_index[i])} "
            f"alpha/beta[0]=({float(out.alphas[i,0]):.2f}, {float(out.betas[i,0]):.2f})"
        )
    img = np.asarray(out.final_latents)
    print(f"final latents: shape={img.shape} mean={img.mean():.4f} std={img.std():.4f} finite={np.isfinite(img).all()}")


if __name__ == "__main__":
    main()
