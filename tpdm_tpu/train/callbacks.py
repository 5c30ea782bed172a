"""Training callbacks: periodic eval with schedule visualizations.

Rebuild of the reference's `DiffusionWandbCallback`
(reference: src/train/callbacks.py:37-154): every eval_steps run
deterministic sampling (predict=True) on a fixed prompt set, score rewards,
filter steps with sigma > 0.01 (:92-97), and plot per-prompt sigma / alpha /
beta / concentration curves. Artifacts land on disk (matplotlib Agg); wandb
logging engages automatically when wandb is importable and a run is active
— it is optional here (gated import), where the reference hard-requires it.

Multi-host: eval prompts split into contiguous per-process slices (the
reference's accelerate `split_between_processes`, :53), every process
samples/scores/decodes only its slice, and stats + uint8 images gather to
process 0 with `process_allgather` (the TPU analogue of the reference's
NCCL `gather_object` of PIL images, :81-86). Uneven slices are padded so
every process traces identical shapes (SPMD), then trimmed after gather.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

# 5 MSCOCO + 5 ShareGPT4V-style fixed eval prompts (reference pins its own
# ten at callbacks.py:20-34).
def shard_eval_batch(batch: dict, index: int, count: int):
    """Contiguous per-process slice of an eval batch, padded to equal size.

    Every process must trace/execute identical shapes under SPMD, so short
    tail slices are padded by repeating the batch's first row. Returns
    (local_batch, n_valid) with n_valid the number of unpadded rows.
    """
    import jax as _jax

    total = None
    for v in batch.values():
        if isinstance(v, (np.ndarray, _jax.Array)):
            total = v.shape[0]
            break
        if isinstance(v, list):
            total = len(v)
            break
    if total is None:
        raise ValueError("eval batch has no batched fields")
    per = -(-total // count)
    lo = min(index * per, total)
    hi = min(lo + per, total)
    n_valid = hi - lo
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, _jax.Array)):
            part = np.asarray(v)[lo:hi]
            if part.shape[0] < per:
                fill = np.repeat(np.asarray(v)[:1], per - part.shape[0], axis=0)
                part = np.concatenate([part, fill], axis=0)
            out[k] = part
        elif isinstance(v, list):
            part = list(v[lo:hi])
            out[k] = part + [v[0]] * (per - len(part))
        else:
            out[k] = v
    return out, n_valid


def _gather_trim(local: np.ndarray, total: int, count: int) -> np.ndarray:
    """All-gather a per-process (per, ...) array and drop the tail padding."""
    from tpdm_tpu.parallel.multihost import allgather_arrays

    per = -(-total // count)
    stacked = allgather_arrays(np.asarray(local))  # (count, per, ...)
    rows = [
        stacked[i, j]
        for i in range(count)
        for j in range(max(0, min(total - i * per, per)))
    ]
    return np.stack(rows, axis=0)


DEFAULT_EVAL_PROMPTS = [
    "A man with a red helmet on a small moped on a dirt road.",
    "Man riding a motor bike on a dirt road on the countryside.",
    "A kitchen with a stove, sink, and refrigerator.",
    "Two women waiting at a bench next to a street.",
    "A large bus sitting next to a very tall building.",
    "The image shows a cozy reading nook with a plush armchair.",
    "The image shows a bustling night market lit by paper lanterns.",
    "The image shows an alpine lake reflecting snow-capped peaks.",
    "The image shows a chef plating an elaborate dessert.",
    "The image shows a vintage car parked outside a diner.",
]


class EvalVisualizationCallback:
    """on_step_end(trainer, update, metrics, tpm_params).

    Args:
        eval_batch: dict with the embed fields the agent needs (+ optional
            "prompt" strings for reward scoring and labels).
        reward_fn: optional scorer applied to the eval rollouts.
        eval_steps: cadence in updates; 0 disables.
        max_inference_steps: 40, the reference's eval budget (:58).
        sigma_filter: only plot steps with sigma above this (:93-97).
    """

    def __init__(
        self,
        eval_batch: dict,
        output_dir: str,
        reward_fn=None,
        eval_steps: int = 50,
        max_inference_steps: int = 40,
        sigma_filter: float = 0.01,
        save_images: bool = True,
        decode_fn=None,
    ):
        self.eval_batch = eval_batch
        self.output_dir = output_dir
        self.reward_fn = reward_fn
        self.eval_steps = eval_steps
        self.max_inference_steps = max_inference_steps
        self.sigma_filter = sigma_filter
        self.save_images = save_images
        self.decode_fn = decode_fn
        self.history: list[dict] = []

    def on_step_end(self, trainer, update: int, metrics: dict, tpm_params):
        if not self.eval_steps or update % self.eval_steps != 0:
            return
        import dataclasses

        import jax

        agent = trainer.agent
        # deterministic eval rollout at the eval budget — passed explicitly
        # (the sampler config is a static jit argument, so overrides get
        # their own compiled trace instead of silently reusing a stale one).
        # Field names differ per family (SD3/FLUX: max_inference_steps +
        # sigmas; SD1.5: num_inference_steps + integer times).
        cfg_fields = {f.name for f in dataclasses.fields(type(agent.sampler_cfg))}
        overrides = {"predict": True}
        if "cache_activations" in cfg_fields:
            overrides["cache_activations"] = False
        if "max_inference_steps" in cfg_fields:
            overrides["max_inference_steps"] = self.max_inference_steps
        elif "num_inference_steps" in cfg_fields:
            overrides["num_inference_steps"] = self.max_inference_steps
        eval_cfg = dataclasses.replace(agent.sampler_cfg, **overrides)

        # shard eval prompts across processes (reference callbacks.py:53)
        n_proc, proc = jax.process_count(), jax.process_index()
        if n_proc > 1:
            batch, _ = shard_eval_batch(self.eval_batch, proc, n_proc)
            total = len(self.eval_batch.get("prompt", [])) or next(
                v.shape[0]
                for v in self.eval_batch.values()
                if isinstance(v, (np.ndarray, jax.Array))
            )
        else:
            batch = self.eval_batch
            total = None

        outputs = agent.sample(
            tpm_params,
            batch,
            jax.random.PRNGKey(update),
            sampler_cfg=eval_cfg,
        )

        if hasattr(outputs, "sigmas"):
            sigmas = np.asarray(outputs.sigmas)
        else:  # SD1.5: integer timesteps -> t/1000 pseudo-sigma for plotting
            sigmas = np.asarray(outputs.times)[:, 1:] / 1000.0
        record = {
            "update": update,
            "sigmas": sigmas,
            "alphas": np.asarray(outputs.alphas),
            "betas": np.asarray(outputs.betas),
            "masks": np.asarray(outputs.prob_masks),
            "nfe": np.asarray(outputs.last_valid_index) + 1,
        }
        if self.reward_fn is not None:
            scores, _ = self.reward_fn(batch.get("prompt"), outputs)
            record["rewards"] = np.asarray(scores)
        imgs = None
        if self.save_images and self.decode_fn is not None:
            # decode locally on every process (SPMD-safe), gather uint8
            from tpdm_tpu.utils.image import postprocess_images

            imgs = postprocess_images(self.decode_fn(outputs.final_latents))

        if n_proc > 1:
            # gather every per-process slice to rank 0 (callbacks.py:81-86)
            record = {
                k: (_gather_trim(v, total, n_proc) if k != "update" else v)
                for k, v in record.items()
            }
            if imgs is not None:
                imgs = _gather_trim(np.asarray(imgs), total, n_proc)
        if proc != 0:
            return

        self.history.append(record)
        self._plot(record)
        if imgs is not None:
            self._save_images(update, imgs)
        logger.info(
            "eval @ update %d: mean NFE %.2f%s",
            update,
            float(record["nfe"].mean()),
            (
                f", mean reward {float(record['rewards'].mean()):.3f}"
                if "rewards" in record
                else ""
            ),
        )
        self._maybe_wandb(record, imgs=imgs, prompts=self.eval_batch.get("prompt"))

    # -- internals -------------------------------------------------------
    def _plot(self, rec: dict):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(self.output_dir, exist_ok=True)
        b = rec["sigmas"].shape[0]
        fig, axes = plt.subplots(1, 4, figsize=(18, 4))
        for i in range(b):
            sig = rec["sigmas"][i]
            keep = sig > self.sigma_filter
            steps = np.arange(len(sig))[keep]
            axes[0].plot(steps, sig[keep], alpha=0.7)
            axes[1].plot(steps, rec["alphas"][i][keep], alpha=0.7)
            axes[2].plot(steps, rec["betas"][i][keep], alpha=0.7)
            axes[3].plot(
                steps,
                (rec["alphas"][i] + rec["betas"][i])[keep],
                alpha=0.7,
            )
        for ax, title in zip(axes, ("sigma", "alpha", "beta", "concentration")):
            ax.set_title(title)
            ax.set_xlabel("step")
        fig.tight_layout()
        out = os.path.join(self.output_dir, f"eval_curves_{rec['update']}.png")
        fig.savefig(out)
        plt.close(fig)

    def _save_images(self, update: int, imgs):
        from PIL import Image

        strip = np.concatenate(list(np.asarray(imgs)), axis=1)
        Image.fromarray(strip).save(
            os.path.join(self.output_dir, f"eval_images_{update}.png")
        )

    def _plot_prompt(self, rec: dict, i: int):
        """One prompt's sigma/alpha/beta/concentration figure (the per-prompt
        figures the reference sends to wandb, callbacks.py:99-130)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        sig = rec["sigmas"][i]
        keep = sig > self.sigma_filter
        steps = np.arange(len(sig))[keep]
        fig, axes = plt.subplots(1, 4, figsize=(14, 3))
        series = (
            sig[keep],
            rec["alphas"][i][keep],
            rec["betas"][i][keep],
            (rec["alphas"][i] + rec["betas"][i])[keep],
        )
        for ax, ys, title in zip(
            axes, series, ("sigma", "alpha", "beta", "concentration")
        ):
            ax.plot(steps, ys, marker="o", markersize=3)
            ax.set_title(title)
            ax.set_xlabel("step")
        fig.tight_layout()
        return fig

    def _maybe_wandb(self, rec: dict, imgs=None, prompts=None):
        """Full eval payload parity with the reference's wandb callback
        (callbacks.py:99-154): scalars + NFE histogram + per-prompt
        schedule figures (captioned with prompt/reward/NFE) + image strip.
        Disk artifacts above remain the fallback when no run is active."""
        try:
            import wandb  # noqa: F401
        except ImportError:
            return
        if wandb.run is None:
            return
        import matplotlib.pyplot as plt

        payload = {"eval/mean_nfe": float(rec["nfe"].mean())}
        if "rewards" in rec:
            payload["eval/mean_reward"] = float(rec["rewards"].mean())
        payload["eval/nfe_hist"] = wandb.Histogram(
            np.asarray(rec["nfe"]).tolist()
        )
        b = rec["sigmas"].shape[0]
        for i in range(b):
            label = (
                prompts[i][:60] if prompts is not None and i < len(prompts)
                else f"prompt_{i}"
            )
            caption = f"{label} | nfe={int(rec['nfe'][i])}"
            if "rewards" in rec:
                caption += f" | reward={float(rec['rewards'][i]):.3f}"
            fig = self._plot_prompt(rec, i)
            payload[f"eval/curves/{i}"] = wandb.Image(fig, caption=caption)
            plt.close(fig)
        if imgs is not None:
            strip = np.concatenate(list(np.asarray(imgs)), axis=1)
            payload["eval/images"] = wandb.Image(strip)
        wandb.log(payload, step=rec["update"])


class TensorBoardCallback:
    """Stream every update's scalar metrics to a TensorBoard event file.

    Parity with the reference's `report_to=tensorboard` sink (HF Trainer
    plumbing; reference requirements.txt:13,22 pull tensorboard — here the
    event-file protocol is implemented natively in utils/tb_writer.py, no
    tensorboard install needed to WRITE; any stock TensorBoard reads it).
    Process 0 only; complements the greppable metrics.jsonl stream.
    """

    def __init__(self, logdir: str):
        self.logdir = logdir
        self._writer = None  # lazy: only process 0 ever creates the file

    def _get_writer(self):
        if self._writer is None:
            from tpdm_tpu.utils.tb_writer import EventWriter

            self._writer = EventWriter(self.logdir)
        return self._writer

    def on_step_end(self, trainer, update: int, metrics: dict, tpm_params):
        import jax

        if jax.process_index() != 0:
            return
        try:
            w = self._get_writer()
            w.add_scalars(update, metrics)
            w.flush()
        except OSError as e:  # observability must never kill training
            logger.warning("tensorboard event write failed: %s", e)

    def close(self):
        if self._writer is not None:
            self._writer.close()


class ProfilerCallback:
    """Capture a jax.profiler trace of a window of training updates.

    Starts recording after update `start` completes and stops after update
    `start + count`, so the compile-heavy first update never pollutes the
    trace (reference analogue: none — DeepSpeed wall_clock_breakdown is
    off and fvcore unused, SURVEY §5; this is the TPU-native answer:
    XProf/TensorBoard-readable traces of exactly the updates you ask
    for). Wired by `main_train.py --profile_updates N`.
    """

    def __init__(self, log_dir: str, start: int = 1, count: int = 1):
        self.log_dir = log_dir
        self.start = start
        self.count = count
        self._active = False
        self._done = False

    def on_step_end(self, trainer, update: int, metrics: dict, tpm_params):
        import jax

        if self._done:
            return
        if not self._active and update >= self.start:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            logger.info(
                "profiler: tracing updates %d..%d into %s",
                update + 1, update + self.count, self.log_dir,
            )
        elif self._active and update >= self.start + self.count:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            logger.info("profiler: trace written to %s", self.log_dir)

    def close(self):
        """Stop a still-open trace (early stop / horizon shorter than the
        window); called by RLOOTrainer.train() on exit."""
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self._done = True
        elif not self._done:
            # the window never opened: start lies beyond the run's last
            # update — say so instead of silently writing nothing
            logger.warning(
                "profiler: window never opened (start=%d is past the "
                "run's last update); no trace written to %s",
                self.start, self.log_dir,
            )


class TimeBudgetCallback:
    """Stop training gracefully before a wall-clock budget expires.

    TPU reservations and spot/preemptible slices come with fixed windows;
    this callback calls ``trainer.request_stop()`` once the budget (minus a
    safety margin for the final update + checkpoint write) is spent, so the
    run checkpoints itself resumably instead of being killed mid-update.
    Complements the trainer's SIGTERM handling (which needs the platform to
    deliver a preemption notice at all). No reference analogue — a
    preempted reference run loses everything since the last save_steps
    boundary (src/train/rloo_trainer.py:598-600).
    """

    def __init__(self, budget_seconds: float, margin_seconds: float = 60.0):
        import time

        self.deadline = time.monotonic() + budget_seconds - margin_seconds
        self._fired = False

    def on_step_end(self, trainer, update: int, metrics: dict, tpm_params):
        import time

        if not self._fired and time.monotonic() >= self.deadline:
            self._fired = True
            logger.info(
                "wall-clock budget reached at update %d: requesting stop",
                update,
            )
            trainer.request_stop()
