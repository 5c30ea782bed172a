"""Reward-gradient fine-tuning of the backbone via LoRA (ReFL/DRaFT-style).

The reference ships a differentiable reward path — ImageReward's
`score_gard` (src/reward_models/ImageReward/ImageReward.py:87-103, kept
from the ImageReward paper's ReFL trainer) — but never consumes it: its
only training mode is RLOO on the TPM, with every backbone weight frozen
(modeling_sd3_pnt.py:760-763). This trainer closes that loop the way
ReFL / DRaFT-K do: run the deterministic fixed-schedule sampler, keep
only the LAST K denoising steps + VAE decode + reward differentiable
(`stop_gradient` at the truncation boundary — full-chain backprop costs
T× the memory for little gain), and ascend d(reward)/d(LoRA) directly.

Division of labor with RLOOTrainer: RLOO learns WHEN to stop (the TPM
schedule policy, non-differentiable NFE reward); DraftTrainer learns to
make the frozen backbone produce higher-reward images under LoRA
adapters (models/lora.py), leaving every base weight untouched. The two
compose — a LoRA-merged backbone drops into TPDMAgent unchanged.

Everything here is single-controller; batch/data sharding under a mesh
works through the same GSPMD machinery as the RLOO trainer (the LoRA
factors are tiny and replicate).
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

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DraftConfig:
    seed: int = 42
    output_dir: str = "output"
    total_updates: int = 10
    batch_size: int = 2
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.99
    adam_epsilon: float = 1e-5
    max_grad_norm: float = 1.0
    # LoRA adapter (models/lora.py): rank-r factors on every 2-D dense
    # kernel of the backbone; base weights never change
    lora_rank: int = 4
    lora_scale: float = 1.0
    # fixed uniform sigma ladder 1 -> 0 over num_steps Euler steps (the
    # reference's fixed-28 inference geometry, config.py:25)
    num_steps: int = 28
    # DRaFT-K: how many FINAL denoise steps stay differentiable
    k_backprop: int = 1
    # guidance lives on the AGENT (TPDMAgent config.guidance_scale /
    # FluxAgent embedded guidance); the trainer never second-guesses it
    logging_steps: int = 1
    save_steps: int = 0
    # keep at most this many lora-N.safetensors (oldest pruned after each
    # save); None = keep all — same semantics as RLOOConfig.save_total_limit
    save_total_limit: "int | None" = None


class DraftTrainer:
    """Maximize a differentiable reward over LoRA factors.

    Args:
        config: DraftConfig.
        agent: any agent exposing the draft hooks — `.backbone_params`
            (the frozen tree LoRA targets) and
            `.denoise_builder(merged_params, batch)` returning a
            denoise_fn whose first output is the model prediction — plus
            `.prepare_latents`. Flow-matching agents (TPDMAgent SD3/SD3.5,
            FluxAgent) roll out the uniform sigma ladder with Euler steps;
            eps-prediction agents (SD15Agent, SDXLAgent — ReFL's and
            Diffusion-DPO's own settings) additionally provide
            `.draft_step_builder(num_steps)`, a differentiable DDIM ladder
            over the DDPM table. The backbone params stay frozen; LoRA
            factors are the only trainable state.
        reward_apply: (images, batch) -> (b,) DIFFERENTIABLE scores, where
            `images` is whatever `decode_fn` returns. For ImageReward use
            build_image_reward_grad_apply (score_grad under the hood).
        decode_fn: latents (b, c, h, w) -> images, differentiable (e.g.
            models/vae.make_fast_decode's fn with params bound). None =
            rewards read raw latents (toy runs).
        dataset / collate_fn: prompt rows -> CFG-ready embed batch, same
            contract as RLOOTrainer.
        mesh: optional jax.sharding.Mesh ("data", "fsdp", "tensor"): the
            batch/latents shard over (data, fsdp), the LoRA factors and
            optimizer state replicate, and the backbone should already be
            mesh-sharded (agent.shard(mesh)) — the same GSPMD scale-out
            contract as RLOOTrainer.
    """

    def __init__(
        self,
        config: DraftConfig,
        agent,
        reward_apply: Callable,
        dataset,
        collate_fn: Optional[Callable] = None,
        decode_fn: Optional[Callable] = None,
        callbacks: Iterable = (),
        mesh=None,
    ):
        if not 1 <= config.k_backprop <= config.num_steps:
            raise ValueError(
                f"k_backprop must be in [1, num_steps], got "
                f"{config.k_backprop} vs {config.num_steps}"
            )
        if not (
            hasattr(agent, "backbone_params")
            and hasattr(agent, "denoise_builder")
        ):
            raise TypeError(
                f"{type(agent).__name__} does not expose the draft hooks "
                "(backbone_params / denoise_builder) — reward-gradient "
                "fine-tuning needs a frozen backbone the trainer can "
                "LoRA-merge and a differentiable denoise chain (TPDMAgent, "
                "FluxAgent, SD15Agent, SDXLAgent all qualify)"
            )
        self.config = config
        self.agent = agent
        self.reward_apply = reward_apply
        self.dataset = dataset
        self.mesh = mesh
        from tpdm_tpu.train.rloo import _default_collate

        self.collate_fn = collate_fn or _default_collate
        self.decode_fn = decode_fn or (lambda z: z)
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
        # uniform flow ladder sigma_i = 1 - i/T, sigma_T = 0 (the fixed-
        # schedule geometry the adaptive sampler collapses to when the TPM
        # ratio is constant)
        T = config.num_steps
        self.sigmas = jnp.linspace(1.0, 0.0, T + 1, dtype=jnp.float32)
        self._update_jit = jax.jit(self._update)
        self.metrics_history: list[dict] = []
        self.global_step = 0
        self.updates_this_run = 0  # stall-detection signal (see watchdog)

    # -- differentiable sampling chain ------------------------------------
    def _final_latents(self, lora, latents, batch_arrays):
        cfg = self.config
        merged = apply_lora(
            self.agent.backbone_params, lora, scale=cfg.lora_scale
        )
        denoise = self.agent.denoise_builder(merged, batch_arrays)
        b = latents.shape[0]

        # family ladder: agents in the eps-prediction integer-t regime
        # (SD1.5/SDXL) provide their own differentiable fixed schedule via
        # draft_step_builder (DDIM over the DDPM table); flow-matching
        # agents (SD3, FLUX) use the uniform sigma ladder + Euler below
        fam_step = getattr(self.agent, "draft_step_builder", None)
        if fam_step is not None:
            fam_step = fam_step(cfg.num_steps)

            def step(lat, i, terminal=False):
                return fam_step(denoise, lat, i, terminal=terminal)

        else:

            def step(lat, i, terminal=False):
                vel = denoise(lat, jnp.full((b,), self.sigmas[i]))[0]
                return flow_euler_step(
                    vel,
                    jnp.full((b,), self.sigmas[i + 1]),
                    jnp.full((b,), self.sigmas[i]),
                    lat,
                )

        T, K = cfg.num_steps, cfg.k_backprop
        if T > K:
            lat = jax.lax.fori_loop(
                0, T - K, lambda i, l: step(l, i), latents
            )
            # DRaFT-K truncation: the prefix contributes no gradient —
            # this cut is what makes the memory cost K steps, not T
            latents = jax.lax.stop_gradient(lat)
        for i in range(T - K, T):  # K is small: unroll
            latents = step(latents, i, terminal=(i == T - 1))
        return latents

    def _update(self, lora, opt_state, latents, batch_arrays):
        def loss_fn(l):
            final = self._final_latents(l, latents, batch_arrays)
            images = self.decode_fn(final)
            r = self.reward_apply(images, batch_arrays)
            return -jnp.mean(r), jnp.mean(r)

        (loss, reward), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora)
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
        return sel(new_lora, lora), sel(new_opt, opt_state), {
            "loss": loss,
            "reward": reward,
            "grad_norm": grad_norm,
            "skipped": (~finite).astype(jnp.float32),
        }

    # -- loop --------------------------------------------------------------
    def train(self, lora=None):
        cfg = self.config
        key = jax.random.PRNGKey(cfg.seed)
        np_rng = np.random.default_rng(cfg.seed)
        if lora is None:
            key, sub = jax.random.split(key)
            lora = init_lora(
                self.agent.backbone_params, cfg.lora_rank, sub
            )
        logger.info(
            "draft: %d LoRA params over %d kernels, K=%d/%d steps "
            "differentiable",
            lora_param_count(lora), len(lora), cfg.k_backprop, cfg.num_steps,
        )
        opt_state = self.tx.init(lora)
        if self.mesh is not None:
            # factors/opt replicate (tiny), batch shards per update below
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
            key, k_lat = jax.random.split(key)
            latents = self.agent.prepare_latents(k_lat, cfg.batch_size)
            arrays = {
                k: v
                for k, v in batch.items()
                if isinstance(v, (jax.Array, np.ndarray))
            }
            if self.mesh is not None:
                from tpdm_tpu.parallel.sharding import batch_spec
                from tpdm_tpu.train.rloo import _named_put, shard_inputs

                arrays = shard_inputs(arrays, self.mesh)
                latents = _named_put(
                    latents, self.mesh, batch_spec(latents.ndim)
                )
            lora, opt_state, stats = self._update_jit(
                lora, opt_state, latents, arrays
            )
            metrics = {
                "draft/reward": float(stats["reward"]),
                "draft/loss": float(stats["loss"]),
                "draft/grad_norm": float(stats["grad_norm"]),
                "draft/num_skipped": float(stats["skipped"]),
                "lr": cfg.learning_rate,
                "eps": int(
                    update * cfg.batch_size / max(time.time() - t0, 1e-9)
                ),
            }
            self.global_step = update
            self.updates_this_run = update
            if cfg.logging_steps and update % cfg.logging_steps == 0:
                logger.info("draft update %d: %s", update, metrics)
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


# -- LoRA (de)serialization: flat "path|a"/"path|b" safetensors --------------


def save_rotating_lora(
    output_dir: str, update: int, lora, save_total_limit: "int | None"
) -> str:
    """Write lora-<update>.safetensors and prune the oldest beyond the
    limit — RLOOConfig.save_total_limit semantics for adapter files.
    Shared by DraftTrainer and DPOTrainer."""
    import os
    import re

    path = os.path.join(output_dir, f"lora-{update}.safetensors")
    os.makedirs(output_dir, exist_ok=True)
    save_lora(path, lora)
    logger.info("saved %s", path)
    if save_total_limit and save_total_limit >= 1:
        found = []
        for name in os.listdir(output_dir):
            m = re.fullmatch(r"lora-(\d+)\.safetensors", name)
            if m:
                found.append((int(m.group(1)), name))
        found.sort()
        for _, name in found[: max(0, len(found) - save_total_limit)]:
            os.remove(os.path.join(output_dir, name))
            logger.info(
                "save_total_limit=%d: pruned %s", save_total_limit, name
            )
    return path


def save_lora(path: str, lora: dict) -> None:
    from safetensors.numpy import save_file

    flat = {}
    for name, fac in lora.items():
        flat[f"{name}|a"] = np.ascontiguousarray(np.asarray(fac["a"]))
        flat[f"{name}|b"] = np.ascontiguousarray(np.asarray(fac["b"]))
    save_file(flat, path)


def load_lora(path: str) -> dict:
    """Inverse of save_lora, failing LOUDLY on non-LoRA safetensors: a TPM
    or model checkpoint pointed at --lora must not silently merge nothing
    (or KeyError deep inside a tree_map)."""
    from tpdm_tpu.utils.convert import load_safetensors

    lora: dict = {}
    for key, value in load_safetensors(path).items():
        name, sep, which = key.rpartition("|")
        if not sep or which not in ("a", "b") or value.ndim != 2:
            raise ValueError(
                f"{path} is not a train/draft.py LoRA file: key {key!r} "
                "is not '<kernel-path>|a' / '|b' with a 2-D factor"
            )
        lora.setdefault(name, {})[which] = jnp.asarray(value)
    for name, fac in lora.items():
        if set(fac) != {"a", "b"} or fac["a"].shape[1] != fac["b"].shape[0]:
            raise ValueError(
                f"{path}: incomplete/mismatched factors for {name!r} "
                f"(have {sorted(fac)}, shapes "
                f"{[tuple(v.shape) for v in fac.values()]})"
            )
    return lora


def build_image_reward_grad_apply(model, image_size: Optional[int] = None):
    """reward_apply for DraftTrainer over an ImageRewardModel.

    Differentiable in-graph preprocessing: decoded fp32 images in [-1, 1]
    (NCHW, models/vae.make_fast_decode) -> [0, 1] -> jax bicubic resize to
    the reward resolution -> CLIP normalization -> score_grad. The resize
    deviates from the PIL-exact evaluation path (utils/image.py
    bicubic_resize_center_crop) — gradients need an in-graph resize; the
    non-differentiable scalar `score` keeps PIL parity.

    The batch must carry "reward_ids" (b, n) int tokens (native WordPiece
    tokenizer, utils/bert_tokenizer.py).
    """
    size = image_size or model.image_size
    mean = jnp.array([0.48145466, 0.4578275, 0.40821073], jnp.float32)
    std = jnp.array([0.26862954, 0.26130258, 0.27577711], jnp.float32)

    def reward_apply(images, batch):
        ids = batch["reward_ids"]
        x = jnp.clip(images.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC for resize
        x = jax.image.resize(
            x, (x.shape[0], size, size, 3), method="cubic"
        )
        x = (x - mean) / std
        x = jnp.transpose(x, (0, 3, 1, 2))
        return model.score_grad(model.params, x, jnp.asarray(ids))

    return reward_apply
