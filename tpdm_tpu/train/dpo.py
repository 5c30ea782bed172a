"""Diffusion-DPO: preference-pair fine-tuning of the backbone via LoRA.

Third leg of the training story, next to RLOO (train/rloo.py — the TPM
learns WHEN to stop) and DRaFT (train/draft.py — reward-gradient ascent):
given (preferred, rejected) image pairs per prompt, minimize the
Diffusion-DPO objective (Wallace et al. 2023, adapted to flow matching)

    L = -E log sigmoid( -beta * [ (err_theta^w - err_ref^w)
                                - (err_theta^l - err_ref^l) ] )

where err is the per-sample denoising MSE at a randomly drawn noise
level. The noising/target pair is family-dependent: flow matching uses
x_sigma = (1-sigma) x0 + sigma eps with target v* = eps - x0;
eps-prediction families (SD1.5/SDXL — Diffusion-DPO's own flagship
setting is SDXL) use the DDPM forward x_t = alpha x0 + sigma*alpha eps
with target eps, supplied by the agent's `forward_noising` hook.
No reward model is needed — the supervision is the pair ordering itself.

The reference has no preference trainer (its only mode is RLOO on the
TPM, src/train/rloo_trainer.py); this is a beyond-reference capability
that composes with the rest: the policy is base + LoRA (models/lora.py)
and the REFERENCE model is the base weights with the LoRA absent — the
frozen-base parameterization gives the DPO reference model for free, no
second 2B-param copy in HBM. Trained factors serve through the same
multi-tenant adapter path as DRaFT LoRAs (serve.py --lora) and merge into
TPDMAgent for RLOO composition.

Family coverage mirrors DraftTrainer: any agent exposing the draft hooks
(`backbone_params` / `denoise_builder`) qualifies — SD3/SD3.5
(TPDMAgent), FLUX (FluxAgent), SD1.5 (SD15Agent) and SDXL (SDXLAgent);
the eps families also expose `forward_noising` (train/sd15_agent.py).

Variance reduction follows the official Diffusion-DPO implementation:
the preferred and rejected halves of a pair share ONE noise draw and ONE
sigma, so the loss differences isolate the content difference.

Mesh contract matches DraftTrainer: the pair batch shards over
(data, fsdp); LoRA factors + optimizer state replicate; the backbone
should already be mesh-sharded (agent.shard(mesh)).
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
from tpdm_tpu.train.draft import save_rotating_lora

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DPOConfig:
    seed: int = 42
    output_dir: str = "output"
    total_updates: int = 10
    batch_size: int = 2  # preference PAIRS per update (2x forwards each)
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.99
    adam_epsilon: float = 1e-5
    max_grad_norm: float = 1.0
    lora_rank: int = 4
    lora_scale: float = 1.0
    # DPO inverse temperature on the err difference. The Diffusion-DPO
    # paper uses ~5000 against eps-MSE on real SDXL noise scales; on toy
    # velocity-MSE keep it O(1e2) so log-sigmoid stays in range.
    beta: float = 500.0
    # noise-level draw per pair: "logit_normal" (SD3-paper density,
    # sigma = sigmoid(N(mean, std))) or "uniform" on (sigma_min, 1)
    timestep_sampling: str = "logit_normal"
    logit_mean: float = 0.0
    logit_std: float = 1.0
    sigma_min: float = 0.02
    logging_steps: int = 1
    save_steps: int = 0
    save_total_limit: "int | None" = None


class DPOTrainer:
    """Preference-pair LoRA fine-tuning over a frozen flow backbone.

    Args:
        config: DPOConfig.
        agent: agent exposing the draft hooks — `.backbone_params` and
            `.denoise_builder(params, batch)` whose first output is the
            model prediction (TPDMAgent, FluxAgent, SD15Agent, SDXLAgent);
            eps-prediction agents also expose `.forward_noising`.
        dataset / collate_fn: rows -> batch dict carrying the prompt
            embeds the agent's denoise_builder reads PLUS the pair, as
            either latents ("latents_w"/"latents_l", model-space
            (b, c, h, w)) or uint8 images ("images_w"/"images_l",
            (b, H, W, 3)) when `encode_fn` is given.
        encode_fn: optional uint8 images -> model-space latents (e.g.
            TPDMPipeline.encode_image); only consulted when the batch
            carries images instead of latents.
        mesh: optional jax.sharding.Mesh — same GSPMD contract as
            DraftTrainer/RLOOTrainer.
    """

    def __init__(
        self,
        config: DPOConfig,
        agent,
        dataset,
        collate_fn: Optional[Callable] = None,
        encode_fn: Optional[Callable] = None,
        callbacks: Iterable = (),
        mesh=None,
    ):
        if not (
            hasattr(agent, "backbone_params")
            and hasattr(agent, "denoise_builder")
        ):
            raise TypeError(
                f"{type(agent).__name__} does not expose the draft hooks "
                "(backbone_params / denoise_builder) — Diffusion-DPO needs "
                "a frozen backbone to LoRA-merge and a denoise chain "
                "(TPDMAgent, FluxAgent, SD15Agent, SDXLAgent all qualify)"
            )
        if config.timestep_sampling not in ("logit_normal", "uniform"):
            raise ValueError(
                f"unknown timestep_sampling {config.timestep_sampling!r}"
            )
        self.config = config
        self.agent = agent
        self.dataset = dataset
        self.encode_fn = encode_fn
        self.mesh = mesh
        from tpdm_tpu.train.rloo import _default_collate

        self.collate_fn = collate_fn or _default_collate
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
        self._update_jit = jax.jit(self._update)
        self.metrics_history: list[dict] = []
        self.global_step = 0
        self.updates_this_run = 0  # watchdog stall signal (see rloo.py)

    # -- loss ---------------------------------------------------------------
    def _pair_errs(self, params, x_sigma, t_arg, target, arrays2, b):
        """Denoising MSE at the drawn noise level, (b,) per half."""
        denoise = self.agent.denoise_builder(params, arrays2)
        v = denoise(x_sigma, t_arg)[0]
        err = jnp.mean(
            (v.astype(jnp.float32) - target) ** 2,
            axis=tuple(range(1, v.ndim)),
        )
        return err[:b], err[b:]

    def _update(self, lora, opt_state, lat_w, lat_l, eps, sigma, arrays):
        cfg = self.config
        base = self.agent.backbone_params
        b = lat_w.shape[0]
        # one denoise over [w; l]: shared eps/sigma per pair (official
        # Diffusion-DPO variance reduction), embeds duplicated to 2b
        x0 = jnp.concatenate([lat_w, lat_l]).astype(jnp.float32)
        noise = jnp.concatenate([eps, eps]).astype(jnp.float32)
        sigma2 = jnp.concatenate([sigma, sigma])
        fwd = getattr(self.agent, "forward_noising", None)
        if fwd is not None:
            # family forward process (eps-prediction DDPM for SD1.5/SDXL):
            # the agent maps the continuous draw to its own timestep arg
            x_sigma, t_arg, target = fwd(x0, noise, sigma2)
            x_sigma = x_sigma.astype(lat_w.dtype)
        else:
            sb = sigma2.reshape((-1,) + (1,) * (x0.ndim - 1))
            x_sigma = ((1.0 - sb) * x0 + sb * noise).astype(lat_w.dtype)
            target = noise - x0  # flow-matching velocity target
            t_arg = sigma2
        arrays2 = {
            k: (jnp.concatenate([v, v]) if v.shape[:1] == (b,) else v)
            for k, v in arrays.items()
        }

        ref_w, ref_l = self._pair_errs(
            base, x_sigma, t_arg, target, arrays2, b
        )

        def loss_fn(l):
            merged = apply_lora(base, l, scale=cfg.lora_scale)
            ew, el = self._pair_errs(
                merged, x_sigma, t_arg, target, arrays2, b
            )
            margin = -cfg.beta * ((ew - ref_w) - (el - ref_l))
            loss = -jnp.mean(jax.nn.log_sigmoid(margin))
            acc = jnp.mean((margin > 0).astype(jnp.float32))
            return loss, (jnp.mean(margin), jnp.mean(ew), jnp.mean(el), acc)

        (loss, (margin, ew, el, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(lora)
        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        safe = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = self.tx.update(safe, opt_state, lora)
        new_lora = optax.apply_updates(lora, updates)
        sel = lambda a, c: jax.tree.map(
            lambda x, y: jnp.where(finite, x, y), a, c
        )
        return sel(new_lora, lora), sel(new_opt, opt_state), {
            "loss": loss,
            "margin": margin,
            "implicit_acc": acc,
            "err_w": ew,
            "err_l": el,
            "grad_norm": grad_norm,
            "skipped": (~finite).astype(jnp.float32),
        }

    # -- data ----------------------------------------------------------------
    def _pair_latents(self, batch):
        if "latents_w" in batch and "latents_l" in batch:
            return jnp.asarray(batch["latents_w"]), jnp.asarray(
                batch["latents_l"]
            )
        if "images_w" in batch and "images_l" in batch:
            if self.encode_fn is None:
                raise ValueError(
                    "batch carries images_w/images_l but no encode_fn was "
                    "given (pass e.g. TPDMPipeline.encode_image)"
                )
            return (
                self.encode_fn(np.asarray(batch["images_w"])),
                self.encode_fn(np.asarray(batch["images_l"])),
            )
        raise ValueError(
            "DPO batch needs latents_w/latents_l or images_w/images_l; got "
            f"{sorted(batch)}"
        )

    def _draw_sigma(self, key, b):
        cfg = self.config
        if cfg.timestep_sampling == "logit_normal":
            u = jax.random.normal(key, (b,), jnp.float32)
            s = jax.nn.sigmoid(cfg.logit_mean + cfg.logit_std * u)
        else:
            s = jax.random.uniform(
                key, (b,), jnp.float32, cfg.sigma_min, 1.0
            )
        return jnp.clip(s, cfg.sigma_min, 1.0)

    # -- loop -----------------------------------------------------------------
    def train(self, lora=None):
        cfg = self.config
        key = jax.random.PRNGKey(cfg.seed)
        np_rng = np.random.default_rng(cfg.seed)
        if lora is None:
            key, sub = jax.random.split(key)
            lora = init_lora(self.agent.backbone_params, cfg.lora_rank, sub)
        logger.info(
            "dpo: %d LoRA params over %d kernels, beta=%.1f, %s timesteps",
            lora_param_count(lora), len(lora), cfg.beta,
            cfg.timestep_sampling,
        )
        opt_state = self.tx.init(lora)
        if self.mesh is not None:
            from tpdm_tpu.parallel.sharding import replicate

            lora = replicate(lora, self.mesh)
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
            lat_w, lat_l = self._pair_latents(batch)
            key, k_eps, k_sig = jax.random.split(key, 3)
            eps = jax.random.normal(k_eps, lat_w.shape, jnp.float32)
            sigma = self._draw_sigma(k_sig, lat_w.shape[0])
            arrays = {
                k: v
                for k, v in batch.items()
                if isinstance(v, (jax.Array, np.ndarray))
                and not k.startswith(("latents_", "images_"))
            }
            if self.mesh is not None:
                from tpdm_tpu.parallel.sharding import batch_spec
                from tpdm_tpu.train.rloo import _named_put, shard_inputs

                arrays = shard_inputs(arrays, self.mesh)
                lat_w = _named_put(lat_w, self.mesh, batch_spec(lat_w.ndim))
                lat_l = _named_put(lat_l, self.mesh, batch_spec(lat_l.ndim))
                eps = _named_put(eps, self.mesh, batch_spec(eps.ndim))
                sigma = _named_put(sigma, self.mesh, batch_spec(1))
            lora, opt_state, stats = self._update_jit(
                lora, opt_state, lat_w, lat_l, eps, sigma, arrays
            )
            metrics = {
                "dpo/loss": float(stats["loss"]),
                "dpo/margin": float(stats["margin"]),
                "dpo/implicit_acc": float(stats["implicit_acc"]),
                "dpo/err_w": float(stats["err_w"]),
                "dpo/err_l": float(stats["err_l"]),
                "dpo/grad_norm": float(stats["grad_norm"]),
                "dpo/num_skipped": float(stats["skipped"]),
                "lr": cfg.learning_rate,
                "eps": int(
                    update * cfg.batch_size / max(time.time() - t0, 1e-9)
                ),
            }
            self.global_step = update
            self.updates_this_run = update
            if cfg.logging_steps and update % cfg.logging_steps == 0:
                logger.info("dpo update %d: %s", update, metrics)
                self.metrics_history.append(metrics)
            for cb in self.callbacks:
                cb.on_step_end(self, update, metrics, lora)
            if cfg.save_steps and update % cfg.save_steps == 0:
                self.save_lora(update, lora)
        if cfg.save_steps and cfg.total_updates % cfg.save_steps != 0:
            self.save_lora(cfg.total_updates, lora)
        return lora, opt_state

    def save_lora(self, update: int, lora) -> str:
        return save_rotating_lora(
            self.config.output_dir, update, lora,
            self.config.save_total_limit,
        )
