"""Consistency distillation of the frozen backbone into few-step LoRA.

LCM-LoRA-style latent consistency distillation (Luo et al. 2023, arXiv
2310.04378 / 2311.05556; pseudo-huber loss per Improved Consistency
Training, Song & Dhariwal 2023): learn LoRA factors such that the merged
student maps any point on the teacher's probability-flow ODE trajectory
straight to its endpoint, enabling 1-4 step sampling.

The reference has no distillation at all — its only NFE-reduction
mechanism is the RL-trained TPM schedule policy (CommonRLOOTrainer,
src/train/rloo_trainer.py). This trainer is the complementary
beyond-reference attack on the same goal: TPDM learns WHEN to stop a
fixed solver; consistency distillation changes WHAT each step computes so
far fewer are needed. Both produce artifacts that compose with the rest
of the framework (the LoRA merges into any agent/engine via --lora).

Family-agnostic through the same agent hooks DRaFT/DPO use:
`.backbone_params`, `.denoise_builder(params, batch)` (first output =
model prediction), `.prepare_latents`, plus `.draft_step_builder` /
`.forward_noising` marking the eps-prediction integer-t regime
(SD1.5/SDXL). Flow-matching agents (SD3 TPDMAgent, FluxAgent) use the
rectified-flow parametrization below.

Objective (flow form; eps form is the VP analogue):
  sigma ladder s_0=1 > ... > s_N=0, random index i per sample,
  x_hi = (1-s_i) x0 + s_i eps                      (forward noising)
  x_lo = one teacher solver step x_hi: s_i -> s_{i+k}   (frozen teacher)
  f_theta(x, s) = x - s * v_theta(x, s)            (x0-prediction head)
  loss = pseudo-huber( f_student(x_hi, s_i) - sg[f_ema(x_lo, s_{i+k})] )
with f_ema an EMA of the student LoRA (the consistency target network).
The boundary f(x, 0) = x holds by construction.

Everything is single-controller jit; under a mesh the batch shards over
(data, fsdp) and the LoRA/EMA/opt state replicate — the same GSPMD
contract as DraftTrainer.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpdm_tpu.models.lora import apply_lora, init_lora, lora_param_count
from tpdm_tpu.ops.flow_euler import flow_euler_step
from tpdm_tpu.train.draft import save_rotating_lora

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DistillConfig:
    seed: int = 42
    output_dir: str = "output"
    total_updates: int = 10
    batch_size: int = 2
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.99
    adam_epsilon: float = 1e-5
    max_grad_norm: float = 1.0
    # LoRA adapter (models/lora.py) — LCM-LoRA's setting: the student is
    # teacher + rank-r factors, so the artifact is tiny and serves through
    # the existing --lora / register_adapter paths
    lora_rank: int = 8
    lora_scale: float = 1.0
    # teacher ladder discretization N (LCM uses 50 over the full schedule;
    # 28 matches the reference's inference geometry)
    num_ladder_steps: int = 28
    # LCM skip-step k: the teacher integrates k ladder cells per target
    # pair — larger k = stronger supervision per update, more solver error
    skip_steps: int = 1
    # EMA decay of the consistency target network (mu in the CM papers)
    ema_decay: float = 0.95
    # pseudo-huber constant c (Improved Consistency Training): loss =
    # sqrt(mse + c^2) - c, smooth near 0, L2-like for large residuals
    huber_c: float = 0.001
    logging_steps: int = 1
    save_steps: int = 0
    save_total_limit: "int | None" = None


def _bshape(a, ref):
    return a.reshape((-1,) + (1,) * (ref.ndim - 1))


def make_regime(agent, num_ladder_steps: int):
    """Family adapter: the three primitives consistency distillation needs,
    resolved from the agent's existing hooks.

    Returns dict(noise_to, x0_pred, teacher_step, n_levels):
      noise_to(x0, eps, i)            -> x at ladder level i (i: (b,) int)
      x0_pred(denoise_fn, x, i)       -> consistency head f(x, s_i)
      teacher_step(denoise_fn, x, i, j) -> one solver step level i -> j
    Levels run 0 (pure noise) .. N (clean).
    """
    N = num_ladder_steps
    if getattr(agent, "draft_step_builder", None) is not None:
        # eps-prediction integer-t regime (SD1.5/SDXL): DDPM VP table +
        # DPM-Solver++(1) teacher step — the same ladder draft_step_builder
        # rolls out (train/sd15_agent.py)
        from tpdm_tpu.ops.dpm_solver import (
            ddpm_sigmas_from_betas,
            dpm_first_order_update,
            epsilon_to_x0,
            sigma_of_timestep,
            sigma_to_alpha_sigma_t,
        )

        table = ddpm_sigmas_from_betas()
        ts = jnp.linspace(999.0, 0.0, N + 1)

        def noise_to(x0, eps, i):
            sig = sigma_of_timestep(table, ts[i])
            a, sa = sigma_to_alpha_sigma_t(sig)
            x = _bshape(a, x0) * x0.astype(jnp.float32) + _bshape(
                sa, x0
            ) * eps.astype(jnp.float32)
            return x.astype(x0.dtype)

        def x0_pred(denoise_fn, x, i):
            t_i = ts[i]
            eps_hat = denoise_fn(x, t_i)[0].astype(jnp.float32)
            sig = sigma_of_timestep(table, t_i)
            return epsilon_to_x0(eps_hat, x.astype(jnp.float32), sig)

        def teacher_step(denoise_fn, x, i, j):
            x32 = x.astype(jnp.float32)
            sig_s = sigma_of_timestep(table, ts[i])
            x0 = x0_pred(denoise_fn, x, i)
            sig_t = sigma_of_timestep(table, ts[j])
            return dpm_first_order_update(x0, x32, sig_t, sig_s).astype(
                x.dtype
            )

    else:
        # rectified-flow regime (SD3/FLUX): x_s = (1-s) x0 + s eps,
        # model predicts velocity v = d x / d s, so f(x, s) = x - s v
        sig = jnp.linspace(1.0, 0.0, N + 1, dtype=jnp.float32)

        def noise_to(x0, eps, i):
            s = _bshape(sig[i], x0)
            return ((1.0 - s) * x0.astype(jnp.float32)
                    + s * eps.astype(jnp.float32)).astype(x0.dtype)

        def x0_pred(denoise_fn, x, i):
            s = sig[i]
            v = denoise_fn(x, s)[0].astype(jnp.float32)
            return x.astype(jnp.float32) - _bshape(s, x) * v

        def teacher_step(denoise_fn, x, i, j):
            s, s_next = sig[i], sig[j]
            v = denoise_fn(x, s)[0]
            return flow_euler_step(v, s_next, s, x)

    return dict(
        noise_to=noise_to, x0_pred=x0_pred, teacher_step=teacher_step,
        n_levels=N,
    )


def make_few_step_sampler(agent, num_ladder_steps: int, levels):
    """Build the consistency few-step sampler for a distilled student.

    ``levels``: strictly increasing ladder indices starting at 0 (pure
    noise), e.g. (0,) for 1-step, (0, 14) for 2-step on a 28 ladder. Each
    round predicts x0 with the consistency head then re-noises to the next
    level with FRESH noise (the CM multistep sampler).

    Returns sample_fn(student_params, batch_arrays, eps, key=None,
    renoise=None) -> x0-space latents; jit it (or call under jit) with
    params as arguments. Re-noising noise comes from ``key`` (whole-batch
    draws) or, for per-request determinism in serving, from ``renoise`` —
    a pre-drawn (len(levels)-1, b, ...) stack (one row per re-noise
    round); exactly one of the two must be provided when len(levels) > 1.
    """
    levels = tuple(int(l) for l in levels)
    if not levels or levels[0] != 0 or list(levels) != sorted(set(levels)):
        raise ValueError(
            f"levels must be strictly increasing and start at 0: {levels}"
        )
    if any(not 0 <= l < num_ladder_steps for l in levels):
        raise ValueError(
            f"levels must lie in [0, {num_ladder_steps}): {levels}"
        )

    def sample_fn(student_params, batch_arrays, eps, key=None, renoise=None):
        if len(levels) > 1 and (key is None) == (renoise is None):
            raise ValueError(
                "multi-level sampling needs exactly one of key / renoise"
            )
        regime = make_regime(agent, num_ladder_steps)
        denoise = agent.denoise_builder(student_params, batch_arrays)
        b = eps.shape[0]
        x = regime["noise_to"](jnp.zeros_like(eps), eps, jnp.zeros((b,), jnp.int32))
        x0 = regime["x0_pred"](denoise, x, jnp.zeros((b,), jnp.int32))
        for r, lv in enumerate(levels[1:]):
            if renoise is not None:
                fresh = renoise[r].astype(eps.dtype)
            else:
                key, sub = jax.random.split(key)
                fresh = jax.random.normal(sub, eps.shape, eps.dtype)
            i = jnp.full((b,), lv, jnp.int32)
            x = regime["noise_to"](x0.astype(eps.dtype), fresh, i)
            x0 = regime["x0_pred"](denoise, x, i)
        return x0

    return sample_fn


class DistillTrainer:
    """Distill the frozen backbone into few-step LoRA factors.

    Args:
        config: DistillConfig.
        agent: any agent exposing backbone_params / denoise_builder /
            prepare_latents (TPDMAgent, FluxAgent, SD15Agent, SDXLAgent).
            Guidance lives on the agent (its denoise_builder bakes CFG),
            so the student learns the GUIDED x0 map at the agent's
            configured scale — LCM's fixed-w setting.
        latents_fn: (key, batch_size, batch) -> clean x0 latents the
            forward process noises. Production: VAE-encode dataset images;
            tests: synthetic. None = agent.prepare_latents (noise-shaped
            stand-in — fine for plumbing/dryrun, not for real training).
        dataset / collate_fn: prompt rows -> CFG-ready embed batch, same
            contract as the other trainers.
        mesh: optional Mesh — batch shards over (data, fsdp); LoRA, EMA
            and optimizer state replicate.
    """

    def __init__(
        self,
        config: DistillConfig,
        agent,
        dataset,
        collate_fn: Optional[Callable] = None,
        latents_fn: Optional[Callable] = None,
        callbacks: Iterable = (),
        mesh=None,
    ):
        if not (
            hasattr(agent, "backbone_params")
            and hasattr(agent, "denoise_builder")
        ):
            raise TypeError(
                f"{type(agent).__name__} does not expose the distill hooks "
                "(backbone_params / denoise_builder)"
            )
        if not 1 <= config.skip_steps < config.num_ladder_steps:
            raise ValueError(
                f"skip_steps must be in [1, num_ladder_steps): got "
                f"{config.skip_steps} of {config.num_ladder_steps}"
            )
        self.config = config
        self.agent = agent
        self.dataset = dataset
        self.mesh = mesh
        from tpdm_tpu.train.rloo import _default_collate

        self.collate_fn = collate_fn or _default_collate
        self.latents_fn = latents_fn or (
            lambda key, b, batch: agent.prepare_latents(key, b)
        )
        self.callbacks = list(callbacks)
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(
                config.learning_rate,
                b1=config.adam_beta1,
                b2=config.adam_beta2,
                eps=config.adam_epsilon,
            ),
        )
        self.regime = make_regime(agent, config.num_ladder_steps)
        self._update_jit = jax.jit(self._update)
        self.metrics_history: list[dict] = []
        self.global_step = 0
        self.updates_this_run = 0

    # -- one distillation update ------------------------------------------
    def _loss(self, lora, ema, x0, eps, idx, batch_arrays):
        cfg = self.config
        R = self.regime
        teacher = self.agent.denoise_builder(
            self.agent.backbone_params, batch_arrays
        )
        student = self.agent.denoise_builder(
            apply_lora(self.agent.backbone_params, lora, scale=cfg.lora_scale),
            batch_arrays,
        )
        target = self.agent.denoise_builder(
            apply_lora(self.agent.backbone_params, ema, scale=cfg.lora_scale),
            batch_arrays,
        )
        x_hi = R["noise_to"](x0, eps, idx)
        x_lo = jax.lax.stop_gradient(
            R["teacher_step"](teacher, x_hi, idx, idx + cfg.skip_steps)
        )
        f_student = R["x0_pred"](student, x_hi, idx)
        f_target = jax.lax.stop_gradient(
            R["x0_pred"](target, x_lo, idx + cfg.skip_steps)
        )
        d = (f_student - f_target).astype(jnp.float32)
        mse = jnp.mean(d * d, axis=tuple(range(1, d.ndim)))
        c = cfg.huber_c
        per_sample = jnp.sqrt(mse + c * c) - c
        return jnp.mean(per_sample), jnp.mean(mse)

    def _update(self, lora, ema, opt_state, x0, eps, idx, batch_arrays):
        (loss, mse), grads = jax.value_and_grad(self._loss, has_aux=True)(
            lora, ema, x0, eps, idx, batch_arrays
        )
        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        safe = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = self.tx.update(safe, opt_state, lora)
        new_lora = optax.apply_updates(lora, updates)
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(finite, x, y), a, b
        )
        new_lora = sel(new_lora, lora)
        mu = self.config.ema_decay
        new_ema = jax.tree.map(
            lambda e, p: mu * e + (1.0 - mu) * p, ema, new_lora
        )
        return new_lora, new_ema, sel(new_opt, opt_state), {
            "loss": loss,
            "mse": mse,
            "grad_norm": grad_norm,
            "skipped": (~finite).astype(jnp.float32),
        }

    # -- loop ---------------------------------------------------------------
    def train(self, lora=None):
        cfg = self.config
        key = jax.random.PRNGKey(cfg.seed)
        np_rng = np.random.default_rng(cfg.seed)
        if lora is None:
            key, sub = jax.random.split(key)
            lora = init_lora(self.agent.backbone_params, cfg.lora_rank, sub)
        ema = jax.tree.map(jnp.copy, lora)
        logger.info(
            "distill: %d LoRA params over %d kernels, ladder N=%d skip=%d",
            lora_param_count(lora), len(lora), cfg.num_ladder_steps,
            cfg.skip_steps,
        )
        opt_state = self.tx.init(lora)
        if self.mesh is not None:
            from tpdm_tpu.parallel.sharding import replicate

            lora = replicate(lora, self.mesh)
            ema = replicate(ema, self.mesh)
            opt_state = replicate(opt_state, self.mesh)
        t0 = time.time()
        for update in range(1, cfg.total_updates + 1):
            rows = [
                self.dataset[int(i)]
                for i in np_rng.choice(
                    len(self.dataset), cfg.batch_size, replace=False
                )
            ]
            batch = self.collate_fn(rows)
            key, k_x0, k_eps, k_idx = jax.random.split(key, 4)
            x0 = self.latents_fn(k_x0, cfg.batch_size, batch)
            eps = jax.random.normal(k_eps, x0.shape, x0.dtype)
            idx = jax.random.randint(
                k_idx, (cfg.batch_size,), 0,
                cfg.num_ladder_steps - cfg.skip_steps + 1, jnp.int32,
            )
            arrays = {
                k: v
                for k, v in batch.items()
                if isinstance(v, (jax.Array, np.ndarray))
            }
            if self.mesh is not None:
                from tpdm_tpu.parallel.sharding import batch_spec
                from tpdm_tpu.train.rloo import _named_put, shard_inputs

                arrays = shard_inputs(arrays, self.mesh)
                x0 = _named_put(x0, self.mesh, batch_spec(x0.ndim))
                eps = _named_put(eps, self.mesh, batch_spec(eps.ndim))
                idx = _named_put(idx, self.mesh, batch_spec(1))
            lora, ema, opt_state, stats = self._update_jit(
                lora, ema, opt_state, x0, eps, idx, arrays
            )
            metrics = {
                "distill/loss": float(stats["loss"]),
                "distill/mse": float(stats["mse"]),
                "distill/grad_norm": float(stats["grad_norm"]),
                "distill/num_skipped": float(stats["skipped"]),
                "lr": cfg.learning_rate,
                "eps": int(
                    update * cfg.batch_size / max(time.time() - t0, 1e-9)
                ),
            }
            self.global_step = update
            self.updates_this_run = update
            if cfg.logging_steps and update % cfg.logging_steps == 0:
                logger.info("distill update %d: %s", update, metrics)
                self.metrics_history.append(metrics)
            for cb in self.callbacks:
                cb.on_step_end(self, update, metrics, lora)
            if cfg.save_steps and update % cfg.save_steps == 0:
                self.save_lora(update, lora)
        if cfg.save_steps and cfg.total_updates % cfg.save_steps != 0:
            self.save_lora(cfg.total_updates, lora)
        return lora, ema, opt_state

    def save_lora(self, update: int, lora) -> str:
        return save_rotating_lora(
            self.config.output_dir, update, lora,
            self.config.save_total_limit,
        )
