"""SD1.5 RL agent: frozen UNet + TPM over the DPM-Solver++ adaptive loop.

Protocol-compatible with RLOOTrainer (same surface as the SD3 TPDMAgent),
mirroring the reference `SD15PredictNextTimeStepModel`'s agent methods
(reference: src/models/stable_diffusion_v1_5/modeling_sd_v1_5.py:925-1041):
integer-timestep schedules, zero KL (:1005-1009), and replay of the
recorded Beta ratios.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpdm_tpu.models.tpm import TimePredictor
from tpdm_tpu.models.unet_sd15 import UNetConfig, UNetSD15
from tpdm_tpu.pipeline.sd15_sampler import (
    SD15SampleOutput,
    SD15SamplerConfig,
    sd15_adaptive_sample,
    sd15_replay_logprobs,
)
from tpdm_tpu.train.config import RLOOConfig


def make_sd15_denoise_fn(
    unet_apply, prompt_embeds, guidance_scale: Optional[float]
):
    """CFG wrapper: combine noise_pred AND temb/h1/h2
    (modeling_sd_v1_5.py:776-795). h_combined = concat([h1, h2], channel)."""

    def denoise_fn(latents, t):
        if guidance_scale is not None and guidance_scale > 1:
            lat = jnp.concatenate([latents, latents])
            tt = jnp.concatenate([t, t])
        else:
            lat, tt = latents, t
        eps, temb, h1, h2 = unet_apply(lat, tt, prompt_embeds)
        if guidance_scale is not None and guidance_scale > 1:

            def guide(a):
                u, c = jnp.split(a, 2)
                return u + guidance_scale * (c - u)

            eps, temb, h1, h2 = guide(eps), guide(temb), guide(h1), guide(h2)
        return eps, temb, jnp.concatenate([h1, h2], axis=1)

    return denoise_fn


def make_sd15_interval_denoise_fn(
    unet_apply, prompt_embeds, guidance_scale, interval
):
    """Guidance-interval variant of :func:`make_sd15_denoise_fn`
    (Kynkäänniemi et al. 2024, integer-t units): CFG weight
    ``guidance_scale`` while lo <= t < hi, 1.0 (== conditional-only)
    outside; when NO sample's t is inside the window a lax.cond branch
    runs the single-batch conditional forward — halving the step's FLOPs.
    Same guidance-on-activations contract (eps AND temb/h1/h2)."""
    from tpdm_tpu.pipeline.denoise import _interval_weight

    if guidance_scale is None or guidance_scale <= 1:
        raise ValueError("guidance interval requires CFG on")

    def denoise_fn(latents, t):
        b = latents.shape[0]
        n = prompt_embeds.shape[0] // 2

        def guided(latents, t):
            lat = jnp.concatenate([latents, latents])
            tt = jnp.concatenate([t, t])
            eps, temb, h1, h2 = unet_apply(lat, tt, prompt_embeds)

            def guide(a):
                u, c = jnp.split(a, 2)
                w, _ = _interval_weight(t, guidance_scale, interval, u.dtype)
                w = w.reshape((-1,) + (1,) * (u.ndim - 1))
                return u + w * (c - u)

            return guide(eps), guide(temb), guide(h1), guide(h2)

        def cond_only(latents, t):
            return unet_apply(latents, t, prompt_embeds[n:][:b])

        _, in_iv = _interval_weight(t, guidance_scale, interval, jnp.float32)
        eps, temb, h1, h2 = jax.lax.cond(
            jnp.any(in_iv), guided, cond_only, latents, t
        )
        return eps, temb, jnp.concatenate([h1, h2], axis=1)

    return denoise_fn


def make_sd15_denoise_cached_fns(
    unet_apply_record, unet_apply_reuse, prompt_embeds,
    guidance_scale: Optional[float],
):
    """DeepCache pair for the SD1.5 family: ``(full_fn, reuse_fn)``, each
    ``(latents, t, cache) -> (eps, temb, h_combined, cache)`` — the
    pipeline.sampler.CachedDenoise contract. The cache (the UNet's deep
    boundary feature, models/unet_sd15.py deepcache_feature_shape) rides
    the CFG-doubled batch and is NOT guidance-combined."""

    def make(apply_fn):
        def denoise_fn(latents, t, cache):
            if guidance_scale is not None and guidance_scale > 1:
                lat = jnp.concatenate([latents, latents])
                tt = jnp.concatenate([t, t])
            else:
                lat, tt = latents, t
            eps, temb, h1, h2, cache = apply_fn(lat, tt, prompt_embeds, cache)
            if guidance_scale is not None and guidance_scale > 1:

                def guide(a):
                    u, c = jnp.split(a, 2)
                    return u + guidance_scale * (c - u)

                eps, temb, h1, h2 = guide(eps), guide(temb), guide(h1), guide(h2)
            return eps, temb, jnp.concatenate([h1, h2], axis=1), cache

        return denoise_fn

    return make(unet_apply_record), make(unet_apply_reuse)


def make_sd15_interval_denoise_cached_fns(
    unet_apply_record, unet_apply_reuse, prompt_embeds, guidance_scale,
    interval,
):
    """DeepCache × guidance interval for SD1.5 (integer-t window units):
    :func:`make_sd15_denoise_cached_fns` composed with
    :func:`make_sd15_interval_denoise_fn` semantics via the shared
    pipeline.denoise.make_interval_cached_denoise_pair core (see its
    docstring for the cost model and the uncond-cache validity rule)."""
    from tpdm_tpu.pipeline.denoise import (
        _interval_weight,
        make_interval_cached_denoise_pair,
    )

    if guidance_scale is None or guidance_scale <= 1:
        raise ValueError("guidance interval requires CFG on")
    n = prompt_embeds.shape[0] // 2

    def g_fwd(apply_fn):
        def run(latents, t, cache):
            lat = jnp.concatenate([latents, latents])
            tt = jnp.concatenate([t, t])
            eps, temb, h1, h2, c = apply_fn(lat, tt, prompt_embeds, cache)
            return (eps, temb, h1, h2), c

        return run

    def c_fwd(apply_fn):
        def run(latents, t, cache):
            b = latents.shape[0]
            eps, temb, h1, h2, c = apply_fn(
                latents, t, prompt_embeds[n:][:b], cache
            )
            return (eps, temb, h1, h2), c

        return run

    return make_interval_cached_denoise_pair(
        g_fwd(unet_apply_record), g_fwd(unet_apply_reuse),
        c_fwd(unet_apply_record), c_fwd(unet_apply_reuse),
        lambda t: _interval_weight(t, guidance_scale, interval, jnp.float32),
        lambda outs: (
            outs[0], outs[1], jnp.concatenate([outs[2], outs[3]], axis=1)
        ),
    )


class SD15Agent:
    """RLOOTrainer-compatible agent over the SD1.5 UNet."""

    def __init__(
        self,
        unet: UNetSD15,
        unet_params,
        config: RLOOConfig,
        tpm: Optional[TimePredictor] = None,
        min_time: int = 10,
        guidance_scale: float = 7.5,
    ):
        self.unet = unet
        self.unet_params = unet_params
        self.config = config
        ucfg = unet.config
        self.guidance_scale = guidance_scale
        self.tpm = tpm or TimePredictor(
            conv_out_channels=128,
            in_channels=2 * ucfg.block_out_channels[0],
            # pre-MLP sinusoidal width (reference TPM input_dim=320,
            # modeling_sd_v1_5.py:100)
            temb_dim=ucfg.block_out_channels[0],
            init_alpha=config.init_alpha,
            init_beta=config.init_beta,
            param_cap=getattr(config, "tpm_param_cap", None),
        )
        self.sampler_cfg = SD15SamplerConfig(
            num_inference_steps=config.max_inference_steps,
            min_time=min_time,
            cache_activations=True,
        )
        self._sample_jit = jax.jit(self._sample, static_argnames=("scfg",))
        self._replay_jit = jax.jit(self.replay)

    def shard(self, mesh):
        """Mesh-shard the frozen UNet: 2D attention/FF kernels follow the
        shared column/row specs (same to_q/to_out naming as MMDiT); conv
        kernels replicate (they are a minority of UNet FLOPs and SD1.5 fits
        replicated in HBM). See tpdm_tpu.parallel.sharding.

        Also rebuilds the UNet with cfg.act_mesh=mesh: the activation
        anchors (models/unet_sd15.py _anchor) pin the transformer token
        stream to batch-only sharding, killing the per-block involuntary
        reshard GSPMD otherwise inserts on tensor>1 meshes (same fix as
        FluxAgent.shard)."""
        import dataclasses as _dc

        from tpdm_tpu.models.unet_sd15 import UNetSD15
        from tpdm_tpu.parallel.sharding import shard_params

        self.unet = UNetSD15(_dc.replace(self.unet.config, act_mesh=mesh))
        self.unet_params = shard_params(self.unet_params, mesh)
        return self

    # -- reward-gradient / preference fine-tuning hooks (train/draft.py,
    # train/dpo.py). eps-prediction analogues of TPDMAgent's flow hooks:
    # ReFL's own setting is SD1.5 and Diffusion-DPO's is SDXL, both this
    # integer-t DDPM regime (reference ships the differentiable
    # ImageReward.score_gard for exactly this, ImageReward.py:87-103).
    prediction_space = "epsilon"

    @property
    def backbone_params(self):
        """The frozen tree LoRA factors target (train/draft.py)."""
        return self.unet_params

    def denoise_builder(self, params, batch):
        """(merged backbone params, collated batch arrays) -> denoise_fn
        whose first output is the EPS prediction; same CFG contract as
        sample()."""
        pe = batch["prompt_embeds"]
        if self.guidance_scale is not None and self.guidance_scale > 1:
            pe = jnp.concatenate([batch["negative_prompt_embeds"], pe])
        return make_sd15_denoise_fn(
            lambda *a: self.unet.apply(params, *a), pe, self.guidance_scale
        )

    def forward_noising(self, x0, eps, s):
        """DDPM forward for training-time noising (train/dpo.py):
        continuous draw s in (0, 1) maps to t = s*999; returns
        (x_t = alpha x0 + sigma*alpha eps, t (b,), target = eps) in the
        VP parametrization the DPM solver uses (ops/dpm_solver.py)."""
        from tpdm_tpu.ops.dpm_solver import (
            ddpm_sigmas_from_betas,
            sigma_of_timestep,
            sigma_to_alpha_sigma_t,
        )

        t = s * 999.0
        sig = sigma_of_timestep(ddpm_sigmas_from_betas(), t)
        a, sa = sigma_to_alpha_sigma_t(sig)
        shape = (-1,) + (1,) * (x0.ndim - 1)
        x_t = a.reshape(shape) * x0 + sa.reshape(shape) * eps
        return x_t.astype(x0.dtype), t, eps

    def draft_step_builder(self, num_steps: int):
        """Differentiable fixed ladder for reward-gradient rollouts
        (train/draft.py): uniform integer-t schedule 999 -> 0, DDIM /
        DPM-Solver++(1) updates (pure functions, exact gradients). The
        terminal step takes the integrate-to-x0 limit exactly like the
        adaptive sampler's cap step (pipeline/sd15_sampler.py)."""
        from tpdm_tpu.ops.dpm_solver import (
            ddpm_sigmas_from_betas,
            dpm_first_order_update,
            epsilon_to_x0,
            sigma_of_timestep,
        )

        table = ddpm_sigmas_from_betas()
        ts = jnp.linspace(999.0, 0.0, num_steps + 1)

        def step(denoise_fn, lat, i, terminal: bool = False):
            b = lat.shape[0]
            t_i = jnp.full((b,), ts[i], jnp.float32)
            eps = denoise_fn(lat, t_i)[0].astype(jnp.float32)
            lat32 = lat.astype(jnp.float32)
            sig_s = sigma_of_timestep(table, t_i)
            x0 = epsilon_to_x0(eps, lat32, sig_s)
            if terminal:
                # sigma_t=0 limit: integrate straight to the x0 prediction
                return x0.astype(lat.dtype)
            sig_t = sigma_of_timestep(table, jnp.full((b,), ts[i + 1]))
            return dpm_first_order_update(x0, lat32, sig_t, sig_s).astype(
                lat.dtype
            )

        return step

    def init_tpm_params(self, key: jax.Array):
        ucfg = self.unet.config
        s = ucfg.sample_size
        return self.tpm.init(
            key,
            jnp.zeros((1, 2 * ucfg.block_out_channels[0], s, s)),
            jnp.zeros((1, ucfg.block_out_channels[0])),
        )

    def tpm_fn(self, tpm_params):
        return lambda h, t: self.tpm.apply(tpm_params, h, t)

    def prepare_latents(self, key, batch_size):
        ucfg = self.unet.config
        # DPM-Solver++ x0-parametrization starts from sigma-scaled noise:
        # diffusers init_noise_sigma for DPMSolver is 1.0 in epsilon space.
        return jax.random.normal(
            key, (batch_size, ucfg.in_channels, ucfg.sample_size, ucfg.sample_size),
            ucfg.dtype,
        )

    def _sample(self, unet_params, tpm_params, latents, prompt_embeds, key,
                step_caps, init_t, scfg):
        # backbone params as a jit ARGUMENT, not captured constants (see
        # TPDMAgent._sample)
        if scfg.guidance_interval is not None:
            denoise_fn = make_sd15_interval_denoise_fn(
                lambda *a: self.unet.apply(unet_params, *a),
                prompt_embeds,
                self.guidance_scale,
                scfg.guidance_interval,
            )
        else:
            denoise_fn = make_sd15_denoise_fn(
                lambda *a: self.unet.apply(unet_params, *a),
                prompt_embeds,
                self.guidance_scale,
            )
        cached = None
        if scfg.cache_interval >= 2 or scfg.cache_tau > 0:
            cached = self._make_cached(unet_params, latents, prompt_embeds,
                                       scfg)
            denoise_fn = None
        return sd15_adaptive_sample(
            denoise_fn, self.tpm_fn(tpm_params), latents, key, scfg,
            step_caps=step_caps, init_t=init_t, cached=cached,
        )

    def _make_cached(self, unet_params, latents, prompt_embeds, scfg):
        """DeepCache denoise pair (SD15SamplerConfig.cache_interval >= 2):
        deep-feature reuse between refresh steps, training-free. With
        ``scfg.guidance_interval`` ALSO set, the composed pair additionally
        skips the uncond tower outside the integer-t window (see
        make_sd15_interval_denoise_cached_fns)."""
        from tpdm_tpu.models.unet_sd15 import deepcache_feature_shape
        from tpdm_tpu.pipeline.sampler import (
            CachedDenoise,
            cache_reuse_schedule,
        )

        mode_apply = lambda mode: (
            lambda lat, tt, pe_, c: self.unet.apply(
                unet_params, lat, tt, pe_, cache=c, cache_mode=mode
            )
        )
        cfg_on = self.guidance_scale is not None and self.guidance_scale > 1
        bb = latents.shape[0] * (2 if cfg_on else 1)
        ucfg = self.unet.config
        init_cache = jnp.zeros(
            deepcache_feature_shape(ucfg, bb, latents.shape[-2:]),
            ucfg.dtype,
        )
        if scfg.guidance_interval is not None:
            from tpdm_tpu.pipeline.denoise import interval_cached_init_delta

            full_fn, reuse_fn = make_sd15_interval_denoise_cached_fns(
                mode_apply("record"), mode_apply("reuse"), prompt_embeds,
                self.guidance_scale, scfg.guidance_interval,
            )
            init_cache = interval_cached_init_delta(init_cache)
        else:
            full_fn, reuse_fn = make_sd15_denoise_cached_fns(
                mode_apply("record"), mode_apply("reuse"), prompt_embeds,
                self.guidance_scale,
            )
        return CachedDenoise(
            full_fn, reuse_fn, init_cache,
            cache_reuse_schedule(scfg.num_inference_steps, scfg.cache_interval),
            tau=scfg.cache_tau if scfg.cache_tau > 0 else None,
        )

    def sample(
        self, tpm_params, batch, key, predict=False, sampler_cfg=None,
        step_caps=None,
    ) -> SD15SampleOutput:
        """``batch`` may carry ``latents`` (explicit init) and ``init_t``
        ((b,) int starting timesteps — the integer-t img2img entry, see
        pipeline.variants.SD15Pipeline.generate(init_image=...))."""
        pe = batch["prompt_embeds"]
        if self.guidance_scale is not None and self.guidance_scale > 1:
            pe = jnp.concatenate([batch["negative_prompt_embeds"], pe])
        b = batch["prompt_embeds"].shape[0]
        key_lat, key_roll = jax.random.split(key)
        latents = batch.get("latents")
        if latents is None:
            latents = self.prepare_latents(key_lat, b)
        import dataclasses

        scfg = sampler_cfg or dataclasses.replace(
            self.sampler_cfg, predict=predict
        )
        if step_caps is not None:
            step_caps = jnp.asarray(step_caps, jnp.int32)
        init_t = batch.get("init_t")
        if init_t is not None:
            init_t = jnp.asarray(init_t, jnp.int32)
        return self._sample_jit(
            self.unet_params, tpm_params, latents, pe, key_roll, step_caps,
            init_t, scfg=scfg,
        )

    def replay(
        self, tpm_params, outputs: SD15SampleOutput, inputs=None,
        backbone_params=None,
    ) -> jax.Array:
        return sd15_replay_logprobs(
            self.tpm_fn(tpm_params),
            outputs.h_cache,
            outputs.temb_cache,
            outputs.ratios,
            outputs.prob_masks,
            self.sampler_cfg,
        )

    def logprobs(self, tpm_params, outputs: SD15SampleOutput) -> jax.Array:
        return self._replay_jit(tpm_params, outputs)

    def kl_divergence(self, outputs: SD15SampleOutput) -> jax.Array:
        """Identically zero (modeling_sd_v1_5.py:1005-1009)."""
        return jnp.zeros_like(outputs.logprobs)
