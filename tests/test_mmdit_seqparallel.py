"""Sequence-parallel MMDiT: ring attention wired into the model.

The reference caps its sequence at pos_embed_max_size (transformer_sd3.py:
93-95,333) and has no context parallelism; this is the TPU-native
long-context path (SURVEY §5): cfg.seq_mesh shards the joint-token axis
over a mesh "seq" axis, attention runs through
parallel/sp_attention.make_ring_attention, and the image-token
activations stay sharded between blocks via sharding constraints.

The parameter tree is identical to the unsharded model, so every test
inits once and applies with both configs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tpdm_tpu.models.mmdit import MMDiT, MMDiTConfig


def _toy_inputs(cfg, b=1, n_txt=11, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    latents = jax.random.normal(
        k1, (b, cfg.in_channels, cfg.sample_size, cfg.sample_size)
    )
    timestep = jnp.full((b,), 800.0)
    ctx = jax.random.normal(k2, (b, n_txt, cfg.joint_attention_dim))
    pooled = jax.random.normal(k3, (b, cfg.pooled_projection_dim))
    return latents, timestep, ctx, pooled


def _forward_parity(plain_cfg, n_seq_dev, rtol=2e-5, atol=2e-5, **inp_kw):
    mesh = Mesh(np.array(jax.devices()[:n_seq_dev]), ("seq",))
    sp_cfg = dataclasses.replace(plain_cfg, seq_mesh=mesh)
    args = _toy_inputs(plain_cfg, **inp_kw)
    params = MMDiT(plain_cfg).init(jax.random.PRNGKey(7), *args)
    ref = jax.jit(MMDiT(plain_cfg).apply)(params, *args)
    got = jax.jit(MMDiT(sp_cfg).apply)(params, *args)
    for r, g, name in zip(ref, got, ("vel", "temb", "h1", "h2")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=rtol, atol=atol, err_msg=name
        )


class TestForwardParity:
    def test_ring_forward_matches_unsharded(self):
        """Toy geometry, 4-way ring; joint length 16+11=27 needs a 1-token
        pad to tile the ring — exercises the kv_len correction."""
        _forward_parity(MMDiTConfig.toy(), n_seq_dev=4)

    def test_eight_device_ring_with_dual_attention(self):
        """SD3.5-style dual-attention layer: the image-only SelfAttention
        must route through the ring too (16 img tokens over 8 devices =
        2/shard, no pad; joint 27 -> pad 5)."""
        cfg = MMDiTConfig.toy(
            dual_attention_layers=(0,), qk_norm="rms_norm"
        )
        _forward_parity(cfg, n_seq_dev=8)

    def test_batch_and_seq_sharded_together(self):
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
        plain = MMDiTConfig.toy()
        sp_cfg = dataclasses.replace(plain, seq_mesh=mesh)
        args = _toy_inputs(plain, b=2)
        params = MMDiT(plain).init(jax.random.PRNGKey(7), *args)
        ref = jax.jit(MMDiT(plain).apply)(params, *args)
        got = jax.jit(MMDiT(sp_cfg).apply)(params, *args)
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(ref[0]), rtol=2e-5, atol=2e-5
        )

    def test_2048px_geometry_forward(self):
        """The real long-context shape: 2048px -> 256x256 latents -> 16384
        image tokens (the reference's max grid is 96x96=9216, SD3.5's 384
        table covers it but single-device attention at 16.7k tokens is the
        memory wall). Depth-1/1-head toy keeps CPU time sane; geometry is
        the real thing."""
        cfg = MMDiTConfig.toy(
            sample_size=256,
            num_layers=1,
            num_attention_heads=1,
            attention_head_dim=16,
            caption_projection_dim=16,  # == inner_dim (SD3 invariant)
            pos_embed_max_size=128,
        )
        _forward_parity(cfg, n_seq_dev=8, rtol=5e-5, atol=5e-5, n_txt=8)


class TestAdaptiveSampleParity:
    def test_seq_parallel_adaptive_sample_matches_unsharded(self):
        """The full product path: adaptive (self-terminating) sampling with
        the token axis sharded over 8 devices inside the while_loop ==
        the unsharded run, sigmas exact-ish and latents tight."""
        from tpdm_tpu.models.tpm import TimePredictor
        from tpdm_tpu.pipeline.denoise import make_cfg_denoise_fn
        from tpdm_tpu.pipeline.sampler import SamplerConfig, adaptive_sample

        plain = MMDiTConfig.toy(sample_size=16)  # 64 img tokens
        mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
        sp = dataclasses.replace(plain, seq_mesh=mesh)

        b, n_txt = 2, 11
        lat, _, ctx, pooled = _toy_inputs(plain, b=b, n_txt=n_txt, seed=3)
        params = MMDiT(plain).init(
            jax.random.PRNGKey(11), lat, jnp.full((b,), 800.0), ctx, pooled
        )
        tpm = TimePredictor(
            conv_out_channels=8,
            in_channels=2 * plain.inner_dim,
            temb_dim=plain.inner_dim,
        )
        gh = plain.sample_size // plain.patch_size
        h_probe = jnp.zeros((b, 2 * plain.inner_dim, gh, gh))
        t_probe = jnp.zeros((b, plain.inner_dim))
        tpm_params = tpm.init(jax.random.PRNGKey(12), h_probe, t_probe)

        scfg = SamplerConfig(
            max_inference_steps=4, min_sigma=0.01, predict=True,
            cache_activations=False,
        )

        def run(cfg):
            denoise = make_cfg_denoise_fn(
                lambda *a: MMDiT(cfg).apply(params, *a),
                ctx, pooled, None, gh, plain.patch_size,
            )
            out = adaptive_sample(
                denoise,
                lambda h, t: tpm.apply(tpm_params, h, t),
                lat, jax.random.PRNGKey(13), scfg,
            )
            return out

        ref = jax.jit(lambda: run(plain))()
        got = jax.jit(lambda: run(sp))()
        np.testing.assert_allclose(
            np.asarray(got.sigmas), np.asarray(ref.sigmas),
            rtol=1e-5, atol=1e-6,
        )
        assert int(got.num_steps) == int(ref.num_steps)
        np.testing.assert_allclose(
            np.asarray(got.final_latents), np.asarray(ref.final_latents),
            rtol=5e-4, atol=5e-4,
        )
