"""RLOO training entry point.

The tpdm_tpu analogue of the reference's `main_diff_rloo_trainer.py`: CLI
flags name component YAMLs (model/agent, reward, dataset, collator —
reference ConfigPathArguments, src/train/config.py:8-14) plus the training
hyperparameters; components instantiate through the mini-hydra resolver.

Smoke run (no pretrained weights needed):
    JAX_PLATFORMS=cpu python main_train.py \
        --model_config configs/models/toy_agent.yaml \
        --reward_model_config configs/models/toy_reward.yaml \
        --train_dataset configs/datasets/jsonl_prompts.yaml \
        --total_episodes 8 --per_device_train_batch_size 4 --rloo_k 2 \
        --max_inference_steps 3 --save_steps 1 --output_dir /tmp/tpdm_out

Real run: swap in configs/models/sd3_agent.yaml + image_reward.yaml (needs
the pretrained artifact directories named inside them).
"""

import argparse
import dataclasses
import functools
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpdm_tpu.train.config import RLOOConfig

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s: %(message)s"
)
logger = logging.getLogger("main_train")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_config", required=True, help="agent component yaml")
    p.add_argument("--reward_model_config", default=None,
                   help="reward yaml (required for rloo/draft; unused by "
                        "dpo — preference pairs ARE the supervision)")
    p.add_argument("--train_dataset", required=True, help="dataset yaml")
    p.add_argument("--data_collator", default=None, help="collator yaml")
    p.add_argument("--resume_from_checkpoint", default=None,
                   help="'true' for latest in output_dir, or a path")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() and train "
                        "mesh-native over all global devices")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the session env pins the "
                        "TPU plugin regardless of JAX_PLATFORMS)")
    p.add_argument("--watchdog_coordinator", default=None,
                   help="host:port for the out-of-band heartbeat watchdog "
                        "(a free port on process 0; same value on every "
                        "process). Detects dead/wedged peers that would "
                        "hang survivors in collectives forever")
    p.add_argument("--watchdog_timeout", type=float, default=30.0,
                   help="seconds of missed heartbeats before a peer is "
                        "declared dead")
    p.add_argument("--watchdog_stall_timeout", type=float, default=None,
                   help="fire the watchdog when NO process's update counter "
                        "advances for this many seconds (catches wedged-but-"
                        "alive peers that heartbeat liveness cannot); size "
                        "to several updates' wall time. Default off")
    p.add_argument("--watchdog_hard_exit", type=float, default=300.0,
                   help="seconds after a detected failure before a wedged "
                        "process hard-exits for the launcher to restart")
    p.add_argument("--mesh_shape", default=None,
                   help="'data,fsdp,tensor' (e.g. 4,2,1) or 'auto': build a "
                        "device mesh and run the trainer GSPMD-sharded "
                        "(implied by --multihost)")
    p.add_argument("--profile_updates", type=int, default=0,
                   help="capture a jax.profiler trace of this many updates "
                        "into output_dir/profile (XProf/TensorBoard-"
                        "readable). Recording starts after --profile_start "
                        "completes, so first-update compiles stay out")
    p.add_argument("--profile_start", type=int, default=1,
                   help="update whose COMPLETION starts the trace window")
    p.add_argument("--trainer", choices=["rloo", "draft", "dpo", "distill"],
                   default="rloo",
                   help="rloo = the reference algorithm (TPM schedule "
                        "policy); draft = reward-gradient LoRA fine-tuning "
                        "of the backbone (train/draft.py; the reward YAML "
                        "must build a DIFFERENTIABLE reward_apply); dpo = "
                        "Diffusion-DPO preference-pair LoRA fine-tuning "
                        "(train/dpo.py; no reward model — the dataset YAML "
                        "must yield latents_w/latents_l pairs, e.g. "
                        "configs/datasets/toy_preference_pairs.yaml or a "
                        "data.datasets.PreferencePairDataset manifest); "
                        "distill = LCM-LoRA consistency distillation "
                        "(train/distill.py; no reward model — the teacher "
                        "supervises itself)")
    p.add_argument("--lora_rank", type=int, default=4)
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--k_backprop", type=int, default=1,
                   help="DRaFT-K: how many final denoise steps backprop")
    p.add_argument("--draft_updates", type=int, default=10,
                   help="LoRA updates for --trainer draft AND dpo")
    p.add_argument("--dpo_beta", type=float, default=500.0,
                   help="DPO inverse temperature on the err difference")
    p.add_argument("--distill_skip", type=int, default=1,
                   help="LCM skip-k: teacher integrates k ladder cells "
                        "per consistency pair (--trainer distill)")
    p.add_argument("--distill_ema", type=float, default=0.95,
                   help="EMA decay of the consistency target network")
    p.add_argument("--dpo_timestep_sampling",
                   choices=["logit_normal", "uniform"],
                   default="logit_normal")
    for f in dataclasses.fields(RLOOConfig):
        flag = f"--{f.name}"
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(flag, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=f.default)
        elif f.default is None:
            p.add_argument(flag, default=None)
        else:
            p.add_argument(flag, type=type(f.default), default=f.default)
    return p.parse_args()


def _run_draft(args, config, agent, reward_apply, dataset, collate_fn, mesh):
    """--trainer draft: reward-gradient LoRA fine-tuning (train/draft.py).

    Shares the RLOO CLI surface where the concepts overlap (seed, lr,
    adam, grad clip, batch size, max_inference_steps -> ladder length,
    guidance, output_dir, logging/save cadence); the reward YAML builds a
    DIFFERENTIABLE reward_apply(images, batch) instead of the RLOO
    host-side reward_fn (e.g. configs/models/toy_draft_reward.yaml, or
    train/draft.py build_image_reward_grad_apply for ImageReward).
    """
    import contextlib

    from tpdm_tpu.train.draft import DraftConfig, DraftTrainer

    dcfg = DraftConfig(
        seed=config.seed,
        output_dir=config.output_dir,
        total_updates=args.draft_updates,
        batch_size=config.per_device_train_batch_size,
        learning_rate=config.learning_rate,
        adam_beta1=config.adam_beta1,
        adam_beta2=config.adam_beta2,
        adam_epsilon=config.adam_epsilon,
        max_grad_norm=config.max_grad_norm,
        lora_rank=args.lora_rank,
        lora_scale=args.lora_scale,
        num_steps=config.max_inference_steps,
        k_backprop=args.k_backprop,
        logging_steps=config.logging_steps,
        save_steps=config.save_steps,
    )
    callbacks = []
    if config.report_to == "tensorboard":
        from tpdm_tpu.train.callbacks import TensorBoardCallback

        callbacks.append(
            TensorBoardCallback(os.path.join(config.output_dir, "tb"))
        )
    if args.profile_updates:
        from tpdm_tpu.train.callbacks import ProfilerCallback

        callbacks.append(
            ProfilerCallback(
                os.path.join(config.output_dir, "profile"),
                start=args.profile_start,
                count=args.profile_updates,
            )
        )
    trainer = DraftTrainer(
        dcfg, agent, reward_apply, dataset,
        collate_fn=collate_fn, callbacks=callbacks, mesh=mesh,
    )
    with mesh if mesh is not None else contextlib.nullcontext():
        trainer.train()
    for cb in callbacks:
        close = getattr(cb, "close", None)
        if close is not None:
            close()
    logger.info(
        "draft training done: %d updates, final reward %.4f",
        dcfg.total_updates,
        trainer.metrics_history[-1]["draft/reward"]
        if trainer.metrics_history else float("nan"),
    )


def _run_distill(args, config, agent, dataset, collate_fn, mesh):
    """--trainer distill: LCM-LoRA-style consistency distillation
    (train/distill.py). No reward model — the teacher's own ODE
    trajectories are the supervision. The dataset supplies prompts (and,
    in production, clean latents via the dataset yaml's latents field);
    without a latents source the trainer falls back to
    agent.prepare_latents, which exercises the plumbing only."""
    import contextlib

    from tpdm_tpu.train.distill import DistillConfig, DistillTrainer

    dcfg = DistillConfig(
        seed=config.seed,
        output_dir=config.output_dir,
        total_updates=args.draft_updates,
        batch_size=config.per_device_train_batch_size,
        learning_rate=config.learning_rate,
        adam_beta1=config.adam_beta1,
        adam_beta2=config.adam_beta2,
        adam_epsilon=config.adam_epsilon,
        max_grad_norm=config.max_grad_norm,
        lora_rank=args.lora_rank,
        lora_scale=args.lora_scale,
        num_ladder_steps=config.max_inference_steps,
        skip_steps=args.distill_skip,
        ema_decay=args.distill_ema,
        logging_steps=config.logging_steps,
        save_steps=config.save_steps,
    )
    callbacks = []
    if config.report_to == "tensorboard":
        from tpdm_tpu.train.callbacks import TensorBoardCallback

        callbacks.append(
            TensorBoardCallback(os.path.join(config.output_dir, "tb"))
        )
    trainer = DistillTrainer(
        dcfg, agent, dataset, collate_fn=collate_fn,
        callbacks=callbacks, mesh=mesh,
    )
    with mesh if mesh is not None else contextlib.nullcontext():
        trainer.train()
    for cb in callbacks:
        close = getattr(cb, "close", None)
        if close is not None:
            close()
    last = trainer.metrics_history[-1] if trainer.metrics_history else {}
    logger.info(
        "distill training done: %d updates, final loss %.6f",
        dcfg.total_updates, last.get("distill/loss", float("nan")),
    )


def _run_dpo(args, config, agent, dataset, collate_fn, mesh):
    """--trainer dpo: Diffusion-DPO preference-pair LoRA fine-tuning
    (train/dpo.py). No reward model: the dataset supplies (preferred,
    rejected) pairs as model-space latents (latents_w/latents_l per row).
    The collate is wrapped so the pair arrays ride along with whatever
    prompt-embedding collate the agent uses."""
    import contextlib

    import jax.numpy as jnp

    from tpdm_tpu.train.dpo import DPOConfig, DPOTrainer

    base_collate = collate_fn

    def dpo_collate(rows):
        batch = base_collate(rows)
        for k in ("latents_w", "latents_l", "images_w", "images_l"):
            if k in rows[0]:
                batch[k] = jnp.stack([jnp.asarray(r[k]) for r in rows])
        return batch

    dcfg = DPOConfig(
        seed=config.seed,
        output_dir=config.output_dir,
        total_updates=args.draft_updates,
        batch_size=config.per_device_train_batch_size,
        learning_rate=config.learning_rate,
        adam_beta1=config.adam_beta1,
        adam_beta2=config.adam_beta2,
        adam_epsilon=config.adam_epsilon,
        max_grad_norm=config.max_grad_norm,
        lora_rank=args.lora_rank,
        lora_scale=args.lora_scale,
        beta=args.dpo_beta,
        timestep_sampling=args.dpo_timestep_sampling,
        logging_steps=config.logging_steps,
        save_steps=config.save_steps,
        save_total_limit=config.save_total_limit,
    )
    callbacks = []
    if config.report_to == "tensorboard":
        from tpdm_tpu.train.callbacks import TensorBoardCallback

        callbacks.append(
            TensorBoardCallback(os.path.join(config.output_dir, "tb"))
        )
    if args.profile_updates:
        from tpdm_tpu.train.callbacks import ProfilerCallback

        callbacks.append(
            ProfilerCallback(
                os.path.join(config.output_dir, "profile"),
                start=args.profile_start,
                count=args.profile_updates,
            )
        )
    trainer = DPOTrainer(
        dcfg, agent, dataset, collate_fn=dpo_collate,
        callbacks=callbacks, mesh=mesh,
    )
    with mesh if mesh is not None else contextlib.nullcontext():
        trainer.train()
    for cb in callbacks:
        close = getattr(cb, "close", None)
        if close is not None:
            close()
    last = trainer.metrics_history[-1] if trainer.metrics_history else {}
    logger.info(
        "dpo training done: %d updates, final margin %.4f acc %.2f",
        dcfg.total_updates,
        last.get("dpo/margin", float("nan")),
        last.get("dpo/implicit_acc", float("nan")),
    )


def main():
    args = parse_args()
    if args.trainer in ("rloo", "draft") and not args.reward_model_config:
        raise SystemExit(
            f"--trainer {args.trainer} requires --reward_model_config"
        )
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        import jax

        jax.distributed.initialize()

    # persistent compile cache: a restarted (resumed/preempted) run repays
    # nothing for unchanged jit graphs
    from tpdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    # rank-0 debugger attach, TPDM_DEBUG=1 gated (reference setup_debug,
    # src/train/train_utilis.py:22-33)
    from tpdm_tpu.utils.debug import setup_debug_from_env

    setup_debug_from_env()

    cfg_kwargs = {
        f.name: getattr(args, f.name) for f in dataclasses.fields(RLOOConfig)
    }
    if cfg_kwargs["total_episodes"] is not None:
        cfg_kwargs["total_episodes"] = int(cfg_kwargs["total_episodes"])
    if cfg_kwargs["save_total_limit"] is not None:
        cfg_kwargs["save_total_limit"] = int(cfg_kwargs["save_total_limit"])
    config = RLOOConfig(**cfg_kwargs)

    from tpdm_tpu.utils.instantiate import instantiate_file
    from tpdm_tpu.train.rloo import RLOOTrainer

    agent_builder = instantiate_file(args.model_config)
    agent = (
        agent_builder(config=config)
        if isinstance(agent_builder, functools.partial)
        else agent_builder
    )
    reward_fn = (
        instantiate_file(args.reward_model_config)
        if args.reward_model_config else None
    )
    if args.trainer == "dpo" and reward_fn is not None:
        logger.info("--trainer dpo ignores --reward_model_config")
    dataset = instantiate_file(args.train_dataset)

    if args.data_collator is not None:
        collate_fn = instantiate_file(args.data_collator)
    else:
        # toy agents embed prompts hash-deterministically; real agents get
        # embeds from a preprocessing stage or text encoders
        from tpdm_tpu.train.builders import make_prompt_encoder

        collate_fn = make_prompt_encoder(agent)

    # Mesh-native scale-out (TPU analogue of the reference's accelerate
    # prepare + torchrun launch, src/train/rloo_trainer.py:187-193,
    # scripts/launch_sd3_train.sh:10): one GSPMD program shards the batch
    # over (data, fsdp) and the frozen backbone over (fsdp, tensor).
    mesh = None
    if args.multihost or args.mesh_shape:
        import jax

        from tpdm_tpu.parallel.mesh import auto_mesh_shape, make_mesh

        devices = jax.devices()
        if args.mesh_shape and args.mesh_shape.lower() != "auto":
            d, f, t = (int(x) for x in args.mesh_shape.split(","))
        else:
            d, f, t = auto_mesh_shape(len(devices))
        mesh = make_mesh(devices, data=d, fsdp=f, tensor=t)
        logger.info(
            "mesh-native training: data=%d fsdp=%d tensor=%d over %d devices "
            "(%d processes)", d, f, t, len(devices), jax.process_count(),
        )
        if hasattr(agent, "shard"):
            agent.shard(mesh)
        else:
            logger.warning(
                "agent %s has no .shard(mesh); backbone stays unsharded",
                type(agent).__name__,
            )

    if args.trainer == "draft":
        _run_draft(args, config, agent, reward_fn, dataset, collate_fn, mesh)
        return
    if args.trainer == "dpo":
        _run_dpo(args, config, agent, dataset, collate_fn, mesh)
        return
    if args.trainer == "distill":
        _run_distill(args, config, agent, dataset, collate_fn, mesh)
        return

    callbacks = []
    if config.eval_steps:
        from tpdm_tpu.train.callbacks import EvalVisualizationCallback

        eval_rows = [dataset[i] for i in range(min(10, len(dataset)))]
        callbacks.append(
            EvalVisualizationCallback(
                collate_fn(eval_rows),
                output_dir=os.path.join(config.output_dir, "eval"),
                reward_fn=reward_fn,
                eval_steps=config.eval_steps,
            )
        )

    if args.profile_updates:
        from tpdm_tpu.train.callbacks import ProfilerCallback

        callbacks.append(
            ProfilerCallback(
                os.path.join(config.output_dir, "profile"),
                start=args.profile_start,
                count=args.profile_updates,
            )
        )

    trainer = RLOOTrainer(
        config, agent, reward_fn, dataset, collate_fn=collate_fn,
        callbacks=callbacks, mesh=mesh,
    )

    # out-of-band failure detection: a dead/wedged peer otherwise hangs
    # every survivor forever inside the next collective (no analogue in
    # the reference — SURVEY §5 "failure detection: none")
    watchdog = None
    if args.watchdog_coordinator:
        import jax

        from tpdm_tpu.parallel.watchdog import (
            HeartbeatWatchdog,
            attach_to_trainer,
        )

        watchdog = HeartbeatWatchdog(
            args.watchdog_coordinator,
            process_id=jax.process_index(),
            num_processes=jax.process_count(),
            timeout=args.watchdog_timeout,
            # interval follows the timeout so any --watchdog_timeout the
            # CLI accepts is satisfiable (constructor requires
            # timeout > interval; ~5 pings per window)
            interval=min(2.0, args.watchdog_timeout / 5.0),
            stall_timeout=args.watchdog_stall_timeout,
        )
        attach_to_trainer(
            watchdog, trainer, hard_exit_after=args.watchdog_hard_exit
        )
        watchdog.start()

    resume = args.resume_from_checkpoint
    if isinstance(resume, str):
        # true|false|path, reference contract (launch_sd3_train.sh:37,
        # main_diff_rloo_trainer.py:60-69): "false"/"" must mean "fresh
        # run", not a checkpoint directory literally named "false"
        if resume.lower() in ("false", "none", ""):
            resume = None
        elif resume.lower() == "true":
            resume = True
    try:
        tpm_params, _ = trainer.train(resume_from_checkpoint=resume)
    finally:
        if watchdog is not None:
            watchdog.stop()
            timer = getattr(watchdog, "_hard_exit_timer", None)
            if timer is not None:  # clean exit won the race: no hard kill
                timer.cancel()
    logger.info("training done: %d updates", trainer.global_step)
    for m in trainer.metrics_history[-3:]:
        logger.info("metrics: %s", m)


if __name__ == "__main__":
    main()
