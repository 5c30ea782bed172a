"""RLOO/PPO training of the Time Prediction Module.

A TPU-native rebuild of the reference's `CommonRLOOTrainer`
(reference: src/train/rloo_trainer.py:79-611) and the RL-facing agent
protocol of `SD3PredictNextTimeStepModelRLOOWrapper`
(src/models/stable_diffusion_3/modeling_sd3_pnt.py:729-933):

- Experience collection = the jitted adaptive rollout (one `lax.while_loop`,
  no grad); PPO epochs re-run only the ~7M-param TPM over cached
  activations, so the policy update is a tiny jitted `train_step` with the
  clipped PG loss, NaN/Inf guards, and grad clipping fused in.
- The reference's per-sample Python loops for rewards/KL/entropy
  (modeling_sd3_pnt.py:828-901, rloo_trainer.py:526-532) are closed-form
  vectorized jnp expressions here.
- Data parallelism: the trainer's arrays are plain jax arrays; shard the
  batch over a mesh `data` axis with `NamedSharding` and the same jitted
  functions scale out (see tpdm_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import signal
import threading
import time
from typing import Callable, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpdm_tpu.models.mmdit import MMDiT
from tpdm_tpu.models.tpm import TimePredictor
from tpdm_tpu.ops.beta import beta_entropy, beta_kl
from tpdm_tpu.ops.schedules import get_ref_beta
from tpdm_tpu.pipeline.denoise import make_cfg_denoise_fn
from tpdm_tpu.pipeline.sampler import (
    SampleOutput,
    SamplerConfig,
    adaptive_sample,
    replay_logprobs,
)
from tpdm_tpu.train.config import RLOOConfig

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Pure RL math (each maps 1:1 to a reference code site)
# ---------------------------------------------------------------------------


def discounted_rewards(
    scores: jax.Array, last_valid_index: jax.Array, gamma: float
) -> jax.Array:
    """Step-count-discounted reward.

    reward = Σ_{i=0..L} r·γ^(L−i) / (L+1) with L = last_valid_index — the
    reference's per-sample loop (modeling_sd3_pnt.py:838-841) in closed form
    via the geometric series (1−γ^(L+1))/(1−γ).
    """
    L = last_valid_index.astype(jnp.float32)
    if gamma == 1.0:
        geo = L + 1.0
    else:
        geo = (1.0 - gamma ** (L + 1.0)) / (1.0 - gamma)
    return scores * geo / (L + 1.0)


def compute_beta_kl_penalty(
    alphas: jax.Array,  # (b, T)
    betas: jax.Array,
    sigmas: jax.Array,  # (b, T) recorded sigma_next
    prob_masks: jax.Array,  # (b, T) bool
    relative: bool = True,
) -> jax.Array:
    """Per-step KL(policy Beta || reference Beta), 0 where masked.

    Parity with wrapper.kl_divergence (modeling_sd3_pnt.py:875-901): the
    reference Beta is anchored at the step's *input* sigma (the recorded
    chain shifted right, padded with 1.0); the non-relative variant uses the
    fixed Beta(1.4, 11.2).
    """
    input_sigmas = jnp.pad(
        sigmas[:, :-1], ((0, 0), (1, 0)), constant_values=1.0
    )
    if relative:
        ref_a, ref_b = get_ref_beta(input_sigmas)
    else:
        ref_a = jnp.full_like(alphas, 1.4)
        ref_b = jnp.full_like(betas, 11.2)
    kl = beta_kl(alphas, betas, ref_a, ref_b)
    return jnp.where(prob_masks, 0.0, kl)


def rloo_advantages(rlhf_reward: jax.Array, rloo_k: int) -> jax.Array:
    """Leave-one-out advantages over tile-grouped repeats.

    Grouping is [s1..sN, s1..sN, ...] (tile), so reshape(k, -1) puts copies
    of a prompt in one column — exactly the reference's vectorized form
    (rloo_trainer.py:453-461).
    """
    r = rlhf_reward.reshape(rloo_k, -1)
    baseline = (r.sum(axis=0) - r) / (rloo_k - 1)
    return (r - baseline).reshape(-1)


def grpo_advantages(
    rlhf_reward: jax.Array, rloo_k: int, eps: float = 1e-4
) -> jax.Array:
    """Group-normalized advantages (GRPO, DeepSeekMath arXiv:2402.03300):
    (r - group_mean) / (group_std + eps) over the rloo_k repeats of each
    prompt. Same tile grouping as rloo_advantages — reshape(k, -1) puts one
    prompt's repeats in a column. Beyond-reference estimator selected by
    RLOOConfig.advantage_estimator="grpo"."""
    r = rlhf_reward.reshape(rloo_k, -1)
    mean = r.mean(axis=0)
    std = r.std(axis=0)
    return ((r - mean) / (std + eps)).reshape(-1)


def compute_advantages(
    rlhf_reward: jax.Array, rloo_k: int, estimator: str = "rloo"
) -> jax.Array:
    if estimator == "rloo":
        return rloo_advantages(rlhf_reward, rloo_k)
    if estimator == "grpo":
        return grpo_advantages(rlhf_reward, rloo_k)
    raise ValueError(f"unknown advantage_estimator: {estimator}")


def ppo_loss(
    new_logprobs: jax.Array,  # (b, T)
    old_logprobs: jax.Array,  # (b, T)
    advantages: jax.Array,  # (b,)
    cliprange: float,
):
    """Clipped policy-gradient loss over summed per-episode logprobs.

    Parity: rloo_trainer.py:485-495. Masked steps carry INVALID_LOGPROB in
    both new and old, cancelling in the difference.
    """
    diff = new_logprobs.sum(axis=1) - old_logprobs.sum(axis=1)
    ratio = jnp.exp(diff)
    pg1 = -advantages * ratio
    pg2 = -advantages * jnp.clip(ratio, 1.0 - cliprange, 1.0 + cliprange)
    loss = jnp.mean(jnp.maximum(pg1, pg2))
    stats = {
        "approxkl": 0.5 * jnp.mean(diff**2),
        "clipfrac": jnp.mean((pg2 > pg1).astype(jnp.float32)),
        "ratio_mean": jnp.mean(
            jnp.exp(new_logprobs - old_logprobs)
        ),  # per-step ratio metric (rloo_trainer.py:486,540)
    }
    return loss, stats


def rloo_repeat(batch: dict, rloo_k: int) -> dict:
    """Tile every field k times along the batch axis (wrapper.rloo_repeat,
    modeling_sd3_pnt.py:768-786)."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, (jax.Array, np.ndarray)):
            out[k] = jnp.tile(v, (rloo_k,) + (1,) * (v.ndim - 1))
        elif isinstance(v, list):
            out[k] = v * rloo_k
        else:
            out[k] = v
    return out


_TIME_MAJOR_FIELDS = (
    "h_cache",
    "temb_cache",
    "history_latents",
    # the SDXL ensemble's second expert keeps its own caches (different
    # channel widths than the base — train/sdxl_agent.py EnsembleSampleOutput)
    "refiner_h_cache",
    "refiner_temb_cache",
)
_SCALAR_FIELDS = ("num_steps",)


def subset_inputs(data: dict, inds) -> dict:
    """Micro-batch view of the collated input batch (wrapper.subset_inputs,
    modeling_sd3_pnt.py:903-914): array fields are row-indexed along the
    batch axis, python lists are fancy-indexed, everything else passes
    through unchanged."""
    inds = np.asarray(inds)
    out = {}
    for k, v in data.items():
        if isinstance(v, (jax.Array, np.ndarray)):
            out[k] = v[jnp.asarray(inds)]
        elif isinstance(v, list):
            out[k] = [v[int(i)] for i in inds]
        else:
            out[k] = v
    return out


def subset_outputs(outputs, inds: np.ndarray):
    """Micro-batch view of a rollout NamedTuple (wrapper.subset_outputs,
    modeling_sd3_pnt.py:916-933). Caches are time-major -> index axis 1.
    Works for any agent's output record (SD3 SampleOutput, SD15 variant)."""
    values = {}
    for name, value in outputs._asdict().items():
        if value is None or name in _SCALAR_FIELDS:
            values[name] = value
        elif name in _TIME_MAJOR_FIELDS:
            kind = getattr(getattr(value, "sharding", None), "memory_kind", None)
            if kind and "host" in kind:
                # host-offloaded cache: subset on host, ship only the
                # micro-batch slice to HBM (the point of the offload mode)
                values[name] = jnp.asarray(np.asarray(value)[:, inds])
            else:
                values[name] = value[:, inds]
        else:
            values[name] = value[inds]
    return type(outputs)(**values)


# ---------------------------------------------------------------------------
# Mesh placement helpers (GSPMD scale-out of the trainer loop)
# ---------------------------------------------------------------------------


def _named_put(leaf, mesh, spec):
    """Place a host/global array with a NamedSharding, multi-process safe.

    Single-process (incl. the N-virtual-device CPU mesh) takes the plain
    device_put path; under multi-controller JAX each process contributes the
    addressable shards of the *identical* host-side global batch (GSPMD is
    single-program: every process computes the same host values, parity note
    at RLOOTrainer.train)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(leaf, sharding)
    arr = np.asarray(leaf)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def shard_inputs(data: dict, mesh) -> dict:
    """Shard the collated batch's array fields over the mesh's (data, fsdp)
    batch axes; lists/scalars (prompt strings) stay host-side."""
    from tpdm_tpu.parallel.sharding import batch_spec

    out = {}
    for k, v in data.items():
        if isinstance(v, (jax.Array, np.ndarray)):
            out[k] = _named_put(v, mesh, batch_spec(v.ndim))
        else:
            out[k] = v
    return out


def shard_rollout(outputs, mesh):
    """Shard a rollout record over the mesh: per-step stats shard their
    leading batch axis, time-major caches shard axis 1, scalar counters
    replicate. Works for any agent family's output NamedTuple (the layout
    contract shared by SampleOutput / SD15SampleOutput)."""
    from jax.sharding import PartitionSpec as P

    from tpdm_tpu.parallel.sharding import batch_spec

    values = {}
    for name, value in outputs._asdict().items():
        if value is None:
            values[name] = None
        elif name in _SCALAR_FIELDS or getattr(value, "ndim", 0) == 0:
            values[name] = _named_put(value, mesh, P())
        elif name in _TIME_MAJOR_FIELDS:
            spec = P(None, ("data", "fsdp"), *([None] * (value.ndim - 2)))
            values[name] = _named_put(value, mesh, spec)
        else:
            values[name] = _named_put(value, mesh, batch_spec(value.ndim))
    return type(outputs)(**values)


# ---------------------------------------------------------------------------
# Agent
# ---------------------------------------------------------------------------


class TPDMAgent:
    """Functional RL agent: frozen MMDiT + trainable TPM + adaptive sampler.

    Implements the reference wrapper's protocol (sample / logprobs /
    kl_divergence / rloo_repeat / subset_*) as pure jitted functions over an
    explicit `tpm_params` pytree; the backbone params are closed over and
    never receive gradients (the reference freezes them with requires_grad_,
    modeling_sd3_pnt.py:760-763 — here immutability is structural).
    """

    def __init__(
        self,
        mmdit: MMDiT,
        mmdit_params,
        config: RLOOConfig,
        tpm: Optional[TimePredictor] = None,
        replay_mode: str = "cached",
    ):
        """replay_mode:
        - "cached": rollout stores (h_combined, temb) per step; PPO replay is
          TPM-only (the reference's SD3 strategy, ~25MB/sample/step of HBM,
          modeling_sd3_pnt.py:553-554 caches to CPU RAM instead).
        - "recompute": rollout stores only the latent history (~0.5MB/
          sample/step, 50x less); replay re-runs the frozen backbone on the
          recorded (latents, sigma) chain to regenerate activations (the
          reference's SD1.5 strategy, modeling_sd_v1_5.py:990-1003).
        """
        if replay_mode not in ("cached", "recompute"):
            raise ValueError(replay_mode)
        self.replay_mode = replay_mode
        self.mmdit = mmdit
        self.mmdit_params = mmdit_params
        self.config = config
        mcfg = mmdit.config
        self.token_grid = mcfg.sample_size // mcfg.patch_size
        self.patch_size = mcfg.patch_size
        self.tpm = tpm or TimePredictor(
            conv_out_channels=128,
            in_channels=2 * mcfg.inner_dim,
            temb_dim=mcfg.inner_dim,
            init_alpha=config.init_alpha,
            init_beta=config.init_beta,
            param_cap=getattr(config, "tpm_param_cap", None),
        )
        self.sampler_cfg = SamplerConfig(
            max_inference_steps=config.max_inference_steps,
            min_sigma=config.min_sigma,
            relative=config.relative,
            prediction_type=config.prediction_type,
            predict=False,
            cache_activations=(replay_mode == "cached"),
            keep_history=(replay_mode == "recompute"),
            # "xla" = pinned-host out_shardings on the rollout jit (see
            # _get_sample_jit); "host" is handled post-hoc by the trainer
            offload_cache=(getattr(config, "offload_cache", "none") == "xla"),
            solver=getattr(config, "solver", "euler"),
        )
        self.needs_inputs_for_replay = replay_mode == "recompute"
        self._sample_jit = jax.jit(self._sample, static_argnames=("scfg",))
        self._offload_sample_jits: dict = {}
        self._replay_jit = jax.jit(self._replay)
        self._recompute_jit = jax.jit(self._replay_recompute)

    def offload_out_shardings(self, scfg: SamplerConfig):
        """out_shardings pytree pinning the activation cache to host memory.

        A jit boundary without explicit out_shardings silently migrates the
        internally host-placed cache back to HBM (defeating the offload —
        the analogue of the reference's blocking CPU-RAM cache,
        modeling_sd3_pnt.py:553). Cache fields get pinned_host; everything
        else stays unspecified (None).
        """
        from jax.sharding import SingleDeviceSharding

        host = SingleDeviceSharding(jax.devices()[0], memory_kind="pinned_host")
        cached = ("h_cache", "temb_cache") if scfg.cache_activations else ()
        return SampleOutput(
            **{f: (host if f in cached else None) for f in SampleOutput._fields}
        )

    def _get_sample_jit(self, scfg: SamplerConfig):
        """Pick the jitted rollout for this config.

        The pinned-host out_shardings annotation is TPU-only (the CPU
        backend has no device↔host placement custom call); on CPU "device"
        memory already is host RAM, so the plain jit is semantically
        equivalent there.
        """
        if not (
            scfg.offload_cache
            and scfg.cache_activations
            and jax.default_backend() != "cpu"
        ):
            return self._sample_jit
        fn = self._offload_sample_jits.get(scfg)
        if fn is None:
            fn = jax.jit(
                self._sample,
                static_argnames=("scfg",),
                out_shardings=self.offload_out_shardings(scfg),
            )
            self._offload_sample_jits[scfg] = fn
        return fn

    def shard(self, mesh):
        """Move the frozen backbone onto the mesh: MMDiT kernels sharded over
        (fsdp, tensor) column/row splits (tpdm_tpu.parallel.sharding). The
        TPU-native analogue of the reference wrapping the backbone in
        FSDP/ZeRO-3 (accelerate.prepare, rloo_trainer.py:187-193). Returns
        self for chaining."""
        from tpdm_tpu.parallel.sharding import shard_params

        self.mmdit_params = shard_params(self.mmdit_params, mesh)
        return self

    # -- reward-gradient fine-tuning hooks (train/draft.py) ---------------
    @property
    def backbone_params(self):
        """The frozen tree LoRA factors target (train/draft.py)."""
        return self.mmdit_params

    def denoise_builder(self, params, batch):
        """(merged backbone params, collated batch arrays) -> denoise_fn
        whose first output is the velocity. The family-agnostic hook
        DraftTrainer drives, so one trainer covers every flow-matching
        backbone (SD3 here, FLUX in flux_agent.py)."""
        pe, pp = batch["prompt_embeds"], batch["pooled_prompt_embeds"]
        if self.config.guidance_scale is not None:
            pe = jnp.concatenate([batch["negative_prompt_embeds"], pe])
            pp = jnp.concatenate([batch["negative_pooled_prompt_embeds"], pp])
        return make_cfg_denoise_fn(
            lambda *a: self.mmdit.apply(params, *a),
            pe, pp, self.config.guidance_scale,
            self.token_grid, self.patch_size,
        )

    def init_tpm_params(self, key: jax.Array):
        mcfg = self.mmdit.config
        g = self.token_grid
        return self.tpm.init(
            key,
            jnp.zeros((1, 2 * mcfg.inner_dim, g, g)),
            jnp.zeros((1, mcfg.inner_dim)),
        )

    def tpm_fn(self, tpm_params):
        return lambda h, t: self.tpm.apply(tpm_params, h, t)

    def prepare_latents(self, key: jax.Array, batch_size: int) -> jax.Array:
        mcfg = self.mmdit.config
        return jax.random.normal(
            key,
            (batch_size, mcfg.in_channels, mcfg.sample_size, mcfg.sample_size),
            mcfg.dtype,
        )

    def _sample(
        self,
        mmdit_params,
        tpm_params,
        latents,
        prompt_embeds,
        pooled_embeds,
        key,
        scfg: SamplerConfig,
    ) -> SampleOutput:
        # The frozen backbone params arrive as a jit ARGUMENT: closing over
        # self.mmdit_params would bake the 2B-param tree into the jaxpr as
        # ~4GB of constants — re-shipped to the compiler on every lowering
        # and double-resident in HBM.
        denoise_fn = make_cfg_denoise_fn(
            lambda *a: self.mmdit.apply(mmdit_params, *a),
            prompt_embeds,
            pooled_embeds,
            self.config.guidance_scale,
            self.token_grid,
            self.patch_size,
        )
        return adaptive_sample(
            denoise_fn, self.tpm_fn(tpm_params), latents, key, scfg
        )

    def sample(
        self,
        tpm_params,
        batch: dict,
        key: jax.Array,
        predict: bool = False,
        sampler_cfg: Optional[SamplerConfig] = None,
    ) -> SampleOutput:
        """Rollout. `batch` carries CFG-ready embeds:
        prompt_embeds/pooled_prompt_embeds (b, ...) and, when guidance is on,
        negative_* counterparts (concatenated [neg; pos] here, parity with
        modeling_sd3_pnt.py:504-506)."""
        if "prompt_embeds" not in batch:
            raise ValueError(
                "batch has no 'prompt_embeds' (keys: "
                f"{sorted(batch)}). The trainer consumes CFG-ready embeds: "
                "precompute them in the dataset/collator (the reference's "
                "pre_process mode, modeling_sd3_pnt.py:162), wrap your "
                "collator with train.builders.make_prompt_encoder for toy "
                "runs, or omit --data_collator so main_train.py does so."
            )
        pe, pp = batch["prompt_embeds"], batch["pooled_prompt_embeds"]
        if self.config.guidance_scale is not None:
            pe = jnp.concatenate([batch["negative_prompt_embeds"], pe])
            pp = jnp.concatenate([batch["negative_pooled_prompt_embeds"], pp])
        b = batch["prompt_embeds"].shape[0]
        key_lat, key_roll = jax.random.split(key)
        latents = batch.get("latents")
        if latents is None:
            latents = self.prepare_latents(key_lat, b)
        scfg = sampler_cfg or dataclasses.replace(
            self.sampler_cfg, predict=predict
        )
        fn = self._get_sample_jit(scfg)
        if fn is not self._sample_jit:
            # Current TPU toolchains can crash XLA's host-offload
            # propagation pass on loop+DUS graphs (minimal repros in
            # experiments/offload_minimal.py); degrade to the plain jit
            # (cache migrates to HBM at the boundary) rather than failing.
            try:
                return fn(
                    self.mmdit_params, tpm_params, latents, pe, pp, key_roll,
                    scfg=scfg,
                )
            except Exception as e:  # pragma: no cover - backend-dependent
                logger.warning(
                    "pinned-host out_shardings compile failed (%s); "
                    "falling back to HBM-resident cache at the jit boundary",
                    type(e).__name__,
                )
                self._offload_sample_jits[scfg] = self._sample_jit
                fn = self._sample_jit
        return fn(
            self.mmdit_params, tpm_params, latents, pe, pp, key_roll, scfg=scfg
        )

    def _replay(self, tpm_params, h_cache, temb_cache, sigmas):
        return replay_logprobs(
            self.tpm_fn(tpm_params), h_cache, temb_cache, sigmas, self.sampler_cfg
        )

    def _replay_recompute(self, mmdit_params, tpm_params, outputs, inputs):
        """Regenerate (h_combined, temb) by re-running the frozen backbone
        on the recorded chain, then score the recorded actions. Activations
        are bit-identical to the rollout's by construction (fixed latents,
        fixed sigmas), so this matches the cached path exactly. Backbone
        params are an explicit argument (see _sample for why)."""
        from tpdm_tpu.ops.beta import beta_log_prob
        from tpdm_tpu.pipeline.sampler import INVALID_LOGPROB, _raw_to_alpha_beta

        pe, pp = inputs["prompt_embeds"], inputs["pooled_prompt_embeds"]
        if self.config.guidance_scale is not None:
            pe = jnp.concatenate([inputs["negative_prompt_embeds"], pe])
            pp = jnp.concatenate([inputs["negative_pooled_prompt_embeds"], pp])
        denoise_fn = make_cfg_denoise_fn(
            lambda *a: self.mmdit.apply(mmdit_params, *a),
            pe,
            pp,
            self.config.guidance_scale,
            self.token_grid,
            self.patch_size,
        )
        cfg = self.sampler_cfg
        # latents BEFORE step j: init for j=0, history[j-1] after
        lat_before = jnp.concatenate(
            [outputs.init_noise_latents[None], outputs.history_latents[:-1]]
        )
        sig_before = jnp.pad(
            outputs.sigmas[:, :-1], ((0, 0), (1, 0)), constant_values=1.0
        ).T  # (T, b)
        sig_next = outputs.sigmas.T  # (T, b)

        def step_fn(_, xs):
            lat, sigma, sigma_next = xs
            _, temb, h = denoise_fn(
                jax.lax.stop_gradient(lat), sigma.astype(lat.dtype)
            )
            raw = self.tpm.apply(tpm_params, h, temb).astype(jnp.float32)
            alpha, beta = _raw_to_alpha_beta(raw, cfg.prediction_type)
            done = sigma < cfg.min_sigma
            # sanitize 0/0 on trailing unexecuted steps (see replay_logprobs)
            safe_sigma = jnp.where(done, 1.0, sigma)
            ratio = sigma_next / safe_sigma if cfg.relative else sigma - sigma_next
            ratio = jnp.clip(ratio, cfg.epsilon, 1.0 - cfg.epsilon)
            ratio = jnp.where(done, 0.5, ratio)
            lp = jnp.where(
                done, INVALID_LOGPROB, beta_log_prob(alpha, beta, ratio)
            )
            return None, lp

        _, lp_tm = jax.lax.scan(
            step_fn, None, (lat_before, sig_before, sig_next)
        )
        return lp_tm.T

    def replay_backbone_params(self):
        """Backbone params the trainer must thread through its jitted step
        when replay re-runs the backbone (recompute mode) — passing them as
        a jit argument instead of letting replay() capture them as graph
        constants. None in cached mode (replay is TPM-only)."""
        return self.mmdit_params if self.replay_mode == "recompute" else None

    def replay(
        self, tpm_params, outputs, inputs=None, backbone_params=None
    ) -> jax.Array:
        """Differentiable logprobs of the rollout's actions — traced inside
        the trainer's jitted PPO step (not self-jitted; the outer jit
        compiles it)."""
        if self.replay_mode == "recompute":
            if inputs is None:
                raise ValueError("recompute replay needs the batch inputs")
            bp = backbone_params if backbone_params is not None else self.mmdit_params
            return self._replay_recompute(bp, tpm_params, outputs, inputs)
        return self._replay(
            tpm_params, outputs.h_cache, outputs.temb_cache, outputs.sigmas
        )

    def logprobs(self, tpm_params, outputs: SampleOutput, inputs=None) -> jax.Array:
        if self.replay_mode == "recompute":
            inputs = {
                k: v
                for k, v in inputs.items()
                if isinstance(v, (jax.Array, np.ndarray))
            }
            return self._recompute_jit(self.mmdit_params, tpm_params, outputs, inputs)
        return self._replay_jit(
            tpm_params, outputs.h_cache, outputs.temb_cache, outputs.sigmas
        )

    def kl_divergence(self, outputs: SampleOutput) -> jax.Array:
        return compute_beta_kl_penalty(
            outputs.alphas,
            outputs.betas,
            outputs.sigmas,
            outputs.prob_masks,
            relative=self.config.relative,
        )


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


def _make_lr_schedule(cfg: RLOOConfig, num_total_batches: int):
    base = _make_base_lr_schedule(cfg, num_total_batches)
    inner = max(1, cfg.num_ppo_epochs * cfg.num_mini_batches)
    # map optimizer-step counts back to trainer-update counts
    return lambda count: base(count // inner)


def _make_base_lr_schedule(cfg: RLOOConfig, num_total_batches: int):
    total_steps = max(1, num_total_batches)
    if cfg.lr_scheduler_type == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.lr_scheduler_type == "constant_with_warmup":
        return optax.schedules.warmup_constant_schedule(
            0.0, cfg.learning_rate, max(1, cfg.warmup_steps)
        )
    if cfg.lr_scheduler_type == "linear":
        return optax.linear_schedule(cfg.learning_rate, 0.0, total_steps)
    if cfg.lr_scheduler_type == "cosine":
        return optax.cosine_decay_schedule(cfg.learning_rate, total_steps)
    raise ValueError(f"unknown lr_scheduler_type: {cfg.lr_scheduler_type}")


class RLOOTrainer:
    """Drives rollout -> reward -> advantage -> PPO epochs, logging metrics.

    Args:
        config: RLOOConfig.
        agent: TPDMAgent (or any object with the same protocol).
        reward_fn: (prompts: list[str], outputs: SampleOutput) ->
            (scores, last_image_scores) float arrays of shape (b,). The
            step-discounting (gamma) is applied by the trainer
            (reference applies it inside wrapper.reward, same math).
        dataset: sequence of dicts; each must provide the embed fields the
            agent needs, plus optionally "prompt" strings for the reward_fn.
        callbacks: objects with on_step_end(trainer, update, metrics).
        mesh: optional jax.sharding.Mesh with ("data", "fsdp", "tensor")
            axes. When given, the trainer scales out the WHOLE loop under
            GSPMD: the rollout batch is sharded over (data, fsdp), the frozen
            backbone should already be mesh-sharded (agent.shard(mesh)), and
            the TPM + optimizer state are replicated. world_size is derived
            from the mesh (data*fsdp shards), matching the reference's
            accelerate/torchrun world (rloo_trainer.py:112-138,187-193) —
            except that here one program drives all shards, so "local" sizes
            in the batch algebra are per-shard while the loop iterates the
            GLOBAL batch.
    """

    def __init__(
        self,
        config: RLOOConfig,
        agent: TPDMAgent,
        reward_fn: Callable,
        dataset,
        collate_fn: Optional[Callable] = None,
        callbacks: Iterable = (),
        mesh=None,
    ):
        self.config = config
        self.agent = agent
        self.reward_fn = reward_fn
        self.dataset = dataset
        self.collate_fn = collate_fn or _default_collate
        self.callbacks = list(callbacks)
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape["data"] * mesh.shape["fsdp"]
            if config.world_size not in (1, dp):
                raise ValueError(
                    f"config.world_size={config.world_size} inconsistent with "
                    f"mesh data*fsdp={dp}"
                )
            if config.world_size != dp:
                config = dataclasses.replace(config, world_size=dp)
                self.config = config
        if config.report_to == "tensorboard":
            from tpdm_tpu.train.callbacks import TensorBoardCallback

            self.callbacks.append(
                TensorBoardCallback(os.path.join(config.output_dir, "tb"))
            )
        elif config.report_to != "none":
            raise ValueError(
                f"report_to={config.report_to!r} (none|tensorboard; wandb "
                "attaches through EvalVisualizationCallback when the wandb "
                "package is importable)"
            )
        if config.offload_cache not in ("none", "xla", "host"):
            raise ValueError(
                f"offload_cache={config.offload_cache!r} (none|xla|host)"
            )
        if config.offload_cache == "host" and jax.process_count() > 1:
            # each process would need the GLOBAL cache on host (an
            # allgather of the biggest tensor in the system); the per-device
            # "xla" mode is the multi-controller answer
            raise ValueError(
                "offload_cache='host' is single-controller only; use 'xla' "
                "for multi-controller runs"
            )
        self.sizes = config.derive_batch_sizes(len(dataset))
        self.metrics_history: list[dict] = []
        # Collapse alarm: rolling NaN-skip fraction (policy/skip_rate). A
        # collapsed policy (alpha/beta at the fp32 edge of the ratio clamp)
        # skips EVERY update behind the finite-guard — without this, a dead
        # run logs indistinguishably from a healthy one
        # (docs/learning_curve_sd3.json updates 23-30; the reference's own
        # guard rloo_trainer.py:497-523 has the same blind spot).
        import collections as _collections

        self._skip_window = _collections.deque(
            maxlen=max(int(getattr(config, "skip_alarm_window", 8)), 1)
        )

        schedule = _make_lr_schedule(config, self.sizes["num_total_batches"])
        # metrics report in trainer-update counts (the reference's lr metric)
        self._schedule = _make_base_lr_schedule(
            config, self.sizes["num_total_batches"]
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(
                schedule,
                b1=config.adam_beta1,
                b2=config.adam_beta2,
                eps=config.adam_epsilon,
            ),
        )
        if config.gradient_accumulation_steps > 1:
            # The reference accumulates grads across micro-batches and steps
            # once per boundary (accelerate's `accumulate` wrapper,
            # rloo_trainer.py:473); optax.MultiSteps reproduces that.
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=config.gradient_accumulation_steps
            )
        # adam's internal counter advances once per optimizer boundary
        # (num_ppo_epochs x num_mini_batches per trainer update), but the
        # schedule horizon — and the reference's per-update
        # lr_scheduler.step() (rloo_trainer.py:595) — count trainer updates.
        self._opt_steps_per_update = max(
            1, config.num_ppo_epochs * config.num_mini_batches
        )
        self._train_step = jax.jit(self._train_step_impl)
        # EMA of the trainable policy (config.ema_decay): one fused jitted
        # tree-map per trainer update; eval callbacks and checkpoints carry
        # the averaged weights.
        self.ema_params = None
        self._ema_fn = None
        if config.ema_decay:
            if not (0.0 < config.ema_decay < 1.0):
                raise ValueError(
                    f"ema_decay={config.ema_decay} must be in (0, 1)"
                )
            d = config.ema_decay
            self._ema_fn = jax.jit(
                lambda ema, p: jax.tree.map(
                    lambda e, x: d * e + (1.0 - d) * x, ema, p
                )
            )
        self.global_step = 0
        # updates completed by THIS process lifetime (never restored from
        # a checkpoint): the progress signal for stall detection — a
        # resume jumps global_step by N before the cold first-update
        # compile, which must NOT arm the watchdog's stall detector
        self.updates_this_run = 0
        self.episode = 0
        self._stop_requested = False
        self.stopped_early = False

    # -- preemption / graceful stop --------------------------------------
    def request_stop(self) -> None:
        """Ask train() to stop after the current update and checkpoint.

        Async-signal-safe (only sets a flag); train() installs this as the
        SIGTERM/SIGINT action so a TPU-pod preemption notice turns into a
        clean save+exit instead of a killed run. Also callable from
        callbacks (e.g. a wall-clock budget watchdog). The reference has no
        analogue — a preempted torchrun loses everything since the last
        `save_steps` boundary.
        """
        self._stop_requested = True

    def _stop_agreed(self) -> bool:
        """Every process must agree to stop at the SAME update.

        SIGTERM delivery on a preempted pod is per-process and not
        simultaneous; if one host exits while the others enter the next
        update's collectives, the survivors hang until the grace period
        kills them. One tiny host-side allgather per update (only in
        multi-controller runs) makes the decision collective: stop iff ANY
        process was signalled.
        """
        if jax.process_count() == 1:
            return self._stop_requested
        from tpdm_tpu.parallel.multihost import allgather_arrays

        flags = allgather_arrays(np.array([self._stop_requested], np.int32))
        return bool(np.max(flags))

    # -- mesh placement --------------------------------------------------
    def _replicate(self, tree):
        if self.mesh is None:
            return tree
        from tpdm_tpu.parallel.sharding import replicate

        return replicate(tree, self.mesh)

    def _put_inputs(self, data):
        return data if self.mesh is None else shard_inputs(data, self.mesh)

    def _put_outputs(self, outputs):
        return outputs if self.mesh is None else shard_rollout(outputs, self.mesh)

    def _offload_outputs_to_host(self, outputs):
        """Post-hoc host offload of the replay cache (offload_cache="host").

        One device->host copy of the time-major caches right after the
        rollout; `subset_outputs` then slices on host and only the
        micro-batch slice returns to HBM per PPO step. The toolchain-proof
        analogue of the reference parking the cache in CPU RAM
        (modeling_sd3_pnt.py:553-554) — rollout HBM is freed before the
        reward decode allocates."""
        values = {}
        for name, value in outputs._asdict().items():
            if name in _TIME_MAJOR_FIELDS and isinstance(value, jax.Array):
                host = np.asarray(value)
                value.delete()  # free HBM now, not at the next GC
                values[name] = host
            else:
                values[name] = value
        return type(outputs)(**values)

    def _host_reward_view(self, outputs):
        """Reward functions run on host numpy (decode -> BLIP -> scores). In
        a multi-controller run the rollout arrays are GLOBAL (each process
        holds only its shards), so materialize the fields rewards read —
        final latents + per-step stats — to every host via process_allgather.
        Caches (h_cache etc.) stay device-side: rewards never read them and
        they are the big ones. Single-process: identity."""
        if self.mesh is None or jax.process_count() == 1:
            return outputs
        from jax.experimental import multihost_utils

        values = {}
        for name, value in outputs._asdict().items():
            if value is None or name in _TIME_MAJOR_FIELDS:
                values[name] = value
            elif isinstance(value, jax.Array) and not value.is_fully_addressable:
                values[name] = multihost_utils.process_allgather(
                    value, tiled=True
                )
            else:
                values[name] = value
        return type(outputs)(**values)

    # -- data ------------------------------------------------------------
    def _loader(self, rng: np.random.Generator) -> Iterator[dict]:
        bsz = self.sizes["dataloader_batch_size"]
        n = len(self.dataset)
        if bsz > n:
            raise ValueError(
                f"dataset ({n} rows) smaller than the derived dataloader "
                f"batch ({bsz} = world_size*local_batch_size/rloo_k); add "
                f"data or shrink the batch configuration"
            )
        while True:
            order = rng.permutation(n)
            for start in range(0, n - bsz + 1, bsz):
                rows = [self.dataset[int(i)] for i in order[start : start + bsz]]
                yield self.collate_fn(rows)

    # -- jitted PPO micro-step ------------------------------------------
    def _train_step_impl(
        self, tpm_params, opt_state, outputs, advantages, inputs,
        backbone_params=None,
    ):
        old_logprobs = outputs.logprobs
        prob_masks = outputs.prob_masks
        alphas, betas = outputs.alphas, outputs.betas

        def loss_fn(p):
            new_lp = self.agent.replay(
                p, outputs, inputs=inputs, backbone_params=backbone_params
            )
            return ppo_loss(new_lp, old_logprobs, advantages, self.config.cliprange)

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(tpm_params)
        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        # NaN/Inf guard: skip the update entirely (rloo_trainer.py:497-523).
        safe_grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt_state = self.tx.update(safe_grads, opt_state, tpm_params)
        new_params = optax.apply_updates(tpm_params, updates)
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(finite, x, y), a, b
        )
        tpm_params = sel(new_params, tpm_params)
        opt_state = sel(new_opt_state, opt_state)

        stats = dict(stats)
        stats["loss"] = loss
        stats["grad_norm"] = grad_norm
        stats["skipped"] = (~finite).astype(jnp.float32)
        # metric parity: entropy over all (alpha, beta) entries and mean
        # unmasked step count (rloo_trainer.py:526-543)
        stats["entropy"] = jnp.mean(beta_entropy(alphas, betas))
        stats["steps"] = jnp.sum(~prob_masks) / prob_masks.shape[0]
        return tpm_params, opt_state, stats

    # -- main loop -------------------------------------------------------
    def train(
        self,
        tpm_params=None,
        resume_state: Optional[dict] = None,
        resume_from_checkpoint=None,
    ):
        """Run training. `resume_from_checkpoint`: True (latest in
        output_dir), a checkpoint path, or None — dispatch parity with the
        reference (main_diff_rloo_trainer.py:60-69, rloo_trainer.py:299-321).
        """
        cfg = self.config
        sizes = self.sizes
        # NOTE: unlike the reference's per-rank seed striding
        # (rloo_trainer.py:133, a DDP idiom), GSPMD is single-program: every
        # process must trace identical host-side values. Decorrelation across
        # the batch comes from jax.random over the *global* batch axis.
        key = jax.random.PRNGKey(cfg.seed)
        np_rng = np.random.default_rng(cfg.seed)

        if tpm_params is None:
            key, sub = jax.random.split(key)
            tpm_params = self.agent.init_tpm_params(sub)
        opt_state = self.tx.init(tpm_params)
        if self.mesh is not None and jax.process_count() > 1:
            # Host-side reward computation needs addressable final latents;
            # multi-controller runs must route reward_fn through
            # parallel.multihost.process_allgather (callbacks do).
            logger.info(
                "multi-controller mesh: %d processes, %d global devices",
                jax.process_count(), self.mesh.size,
            )

        if resume_from_checkpoint is not None and resume_state is None:
            from tpdm_tpu.train import checkpoint as ckpt

            path = resume_from_checkpoint
            if path is True:
                path = ckpt.latest_checkpoint(cfg.output_dir)
                if path is None:
                    raise ValueError(
                        f"no checkpoint found in {cfg.output_dir}"
                    )
            resume_state = ckpt.restore_checkpoint(path, tpm_params, opt_state)
            logger.info("resumed from %s (update %d)", path, resume_state["update"])

        start_update = 1
        if resume_state is not None:
            tpm_params = resume_state["tpm_params"]
            opt_state = resume_state["opt_state"]
            start_update = int(resume_state["update"]) + 1
            self.episode = int(resume_state.get("episode", 0))
            self.global_step = int(resume_state.get("update", 0))
            key = jax.random.fold_in(key, start_update)
            if "np_rng_state" in resume_state:
                np_rng.bit_generator.state = resume_state["np_rng_state"]

        # under a mesh, the trainable state and optimizer live replicated on
        # every device (the TPM is ~7M params; sharding it buys nothing)
        tpm_params = self._replicate(tpm_params)
        opt_state = self._replicate(opt_state)
        if self._ema_fn is not None:
            ema = None
            if resume_state is not None:
                ema = resume_state.get("ema_params")
            if ema is None:
                ema = tpm_params  # fresh EMA starts at the live policy
            self.ema_params = self._replicate(ema)

        loader = self._loader(np_rng)
        start_time = time.time()

        # SIGTERM (pod preemption notice) / SIGINT -> checkpoint + clean
        # exit after the current update. Handlers can only be installed in
        # the main thread; elsewhere (e.g. a serving-engine worker driving
        # a background fine-tune) request_stop() remains available.
        prev_handlers: dict = {}
        if threading.current_thread() is threading.main_thread():
            def _on_signal(signum, frame):
                logger.warning(
                    "signal %d: will checkpoint and stop after the current "
                    "update", signum,
                )
                self.request_stop()

            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    prev_handlers[sig] = signal.signal(sig, _on_signal)
                except (ValueError, OSError):  # pragma: no cover
                    pass
        try:
            tpm_params, opt_state = self._train_loop(
                tpm_params, opt_state, loader, np_rng, key, start_update,
                start_time,
            )
        finally:
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)
            for cb in self.callbacks:
                close = getattr(cb, "close", None)
                if close is not None:
                    try:
                        close()
                    except Exception:  # cleanup must not mask train errors
                        logger.exception("callback close() raised")
        return tpm_params, opt_state

    def _train_loop(
        self, tpm_params, opt_state, loader, np_rng, key, start_update,
        start_time,
    ):
        cfg = self.config
        sizes = self.sizes
        for update in range(start_update, sizes["num_total_batches"] + 1):
            self.episode += sizes["batch_size"]
            data = next(loader)
            data = self._put_inputs(rloo_repeat(data, cfg.rloo_k))

            # ---- experience collection (no grad) ----
            key, k_roll = jax.random.split(key)
            outputs = self.agent.sample(tpm_params, data, k_roll)
            if cfg.offload_cache == "host":
                outputs = self._offload_outputs_to_host(outputs)
            scores, last_image_scores = self.reward_fn(
                data.get("prompt"), self._host_reward_view(outputs)
            )
            scores = discounted_rewards(
                jnp.asarray(scores, jnp.float32), outputs.last_valid_index, cfg.gamma
            )
            kl = self.agent.kl_divergence(outputs)
            kl_reduced = kl.mean(axis=1) if cfg.mean_kl else kl.sum(axis=1)
            non_score_reward = -cfg.kl_coef * kl_reduced
            rlhf_reward = scores + non_score_reward
            advantages = compute_advantages(
                rlhf_reward, cfg.rloo_k, cfg.advantage_estimator
            )

            # ---- PPO epochs over the same rollout ----
            # One program iterates the GLOBAL batch; each micro-step is
            # micro_batch_size = per_device * world_size rows sharded over
            # (data, fsdp) — per-shard compute matches the reference's
            # per-rank per_device_train_batch_size micro-batches.
            stats_acc: list[dict] = []
            global_bs = sizes["batch_size"]
            micro_bs = sizes["micro_batch_size"]
            for _ in range(cfg.num_ppo_epochs):
                b_inds = np_rng.permutation(global_bs)
                for mb_start in range(0, global_bs, sizes["mini_batch_size"]):
                    mb_inds = b_inds[mb_start : mb_start + sizes["mini_batch_size"]]
                    for mi_start in range(0, len(mb_inds), micro_bs):
                        inds = mb_inds[mi_start : mi_start + micro_bs]
                        mo = self._put_outputs(subset_outputs(outputs, inds))
                        adv = advantages[jnp.asarray(inds)]
                        if self.mesh is not None:
                            from tpdm_tpu.parallel.sharding import batch_spec

                            adv = _named_put(adv, self.mesh, batch_spec(1))
                        mb_inputs = None
                        if getattr(self.agent, "needs_inputs_for_replay", False):
                            mb_inputs = self._put_inputs({
                                k: v
                                for k, v in subset_inputs(data, inds).items()
                                if isinstance(v, (jax.Array, np.ndarray))
                            })
                        tpm_params, opt_state, stats = self._train_step(
                            tpm_params, opt_state, mo, adv,
                            mb_inputs,
                            getattr(self.agent, "replay_backbone_params",
                                    lambda: None)(),
                        )
                        stats_acc.append(stats)

            # ---- metrics (names parity: rloo_trainer.py:561-592) ----
            agg = {
                k: float(np.mean([np.asarray(s[k]) for s in stats_acc]))
                for k in stats_acc[0]
            }
            ratios = np.array([np.asarray(s["ratio_mean"]) for s in stats_acc])
            metrics = {
                "eps": int(self.episode / max(time.time() - start_time, 1e-9)),
                "objective/kl": float(jnp.mean(kl_reduced)),
                "objective/non_score_reward": float(jnp.mean(non_score_reward)),
                "objective/rlhf_reward": float(jnp.mean(rlhf_reward)),
                "objective/scores": float(jnp.mean(scores)),
                "objective/last_image_scores": float(np.mean(last_image_scores)),
                "policy/approxkl_avg": agg["approxkl"],
                "policy/clipfrac_avg": agg["clipfrac"],
                "policy/steps_avg": agg["steps"],
                "policy/grad_norm_avg": agg["grad_norm"],
                "loss/policy_avg": agg["loss"],
                "policy/entropy_avg": agg["entropy"],
                "val/ratio": float(ratios.mean()),
                "val/ratio_var": float(ratios.var()),
                "val/num_skipped": agg["skipped"],
                "lr": float(self._schedule(self.global_step)),
                "episode": self.episode,
            }
            self._skip_window.append(agg["skipped"])
            skip_rate = float(np.mean(self._skip_window))
            metrics["policy/skip_rate"] = skip_rate
            threshold = float(
                getattr(cfg, "skip_alarm_threshold", 0.5) or 0.5
            )
            if (
                len(self._skip_window) == self._skip_window.maxlen
                and skip_rate > threshold
            ):
                logger.warning(
                    "policy collapse suspected: %.0f%% of the last %d "
                    "updates were NaN/Inf-skipped (skip_rate %.2f > %.2f) — "
                    "training has effectively stopped; consider "
                    "tpm_param_cap (bounded alpha/beta head) or a lower "
                    "learning rate",
                    100 * skip_rate, self._skip_window.maxlen, skip_rate,
                    threshold,
                )
            if self._ema_fn is not None:
                self.ema_params = self._ema_fn(self.ema_params, tpm_params)
            self.global_step += 1
            self.updates_this_run += 1
            if cfg.logging_steps and update % cfg.logging_steps == 0:
                logger.info("update %d: %s", update, metrics)
                self.metrics_history.append(metrics)
                self._append_metrics_jsonl(update, metrics)

            # eval on the EMA policy when enabled (eval-stability; the live
            # policy keeps training)
            eval_params = (
                self.ema_params if self.ema_params is not None else tpm_params
            )
            for cb in self.callbacks:
                cb.on_step_end(self, update, metrics, eval_params)

            saved_this_update = bool(cfg.save_steps) and update % cfg.save_steps == 0
            if saved_this_update:
                self._save(update, tpm_params, opt_state, np_rng)

            if self._stop_agreed():
                if not saved_this_update:
                    self._save(update, tpm_params, opt_state, np_rng)
                self.stopped_early = True
                logger.warning(
                    "graceful stop: checkpoint saved at update %d/%d; resume "
                    "with --resume_from_checkpoint", update,
                    sizes["num_total_batches"],
                )
                break

        if cfg.save_steps and not self.stopped_early:
            self._save(sizes["num_total_batches"], tpm_params, opt_state, np_rng)
        return tpm_params, opt_state

    def _append_metrics_jsonl(self, update, metrics):
        """Durable per-update metric stream: output_dir/metrics.jsonl, one
        JSON object per logged update (the greppable analogue of the
        reference's HF-Trainer log history / tensorboard scalars)."""
        import json
        import os

        # only for runs that already use output_dir (checkpoints or eval);
        # pure smoke runs stay filesystem-free
        if not (self.config.save_steps or self.config.eval_steps):
            return
        if jax.process_index() != 0:
            return
        try:
            os.makedirs(self.config.output_dir, exist_ok=True)
            with open(
                os.path.join(self.config.output_dir, "metrics.jsonl"), "a"
            ) as f:
                f.write(json.dumps({"update": update, **metrics}) + "\n")
        except OSError as e:  # metrics must never kill training
            logger.warning("metrics.jsonl write failed: %s", e)

    def _save(self, update, tpm_params, opt_state, np_rng):
        from tpdm_tpu.train import checkpoint as ckpt

        if jax.process_index() == 0:
            path = ckpt.save_checkpoint(
                self.config.output_dir,
                update,
                tpm_params,
                opt_state,
                episode=self.episode,
                np_rng_state=np_rng.bit_generator.state,
                ema_params=self.ema_params,
            )
            logger.info("saved checkpoint %s", path)
            pruned = ckpt.rotate_checkpoints(
                self.config.output_dir, self.config.save_total_limit
            )
            if pruned:
                logger.info(
                    "save_total_limit=%s: pruned %s",
                    self.config.save_total_limit, pruned,
                )


def _default_collate(rows: list[dict]) -> dict:
    out: dict = {}
    for k in rows[0]:
        vals = [r[k] for r in rows]
        if isinstance(vals[0], (np.ndarray, jax.Array)):
            out[k] = jnp.stack(vals)
        else:
            out[k] = vals
    return out
