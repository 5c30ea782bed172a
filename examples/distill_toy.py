"""End-to-end toy consistency distillation (LCM-LoRA-style).

Run: JAX_PLATFORMS=cpu python examples/distill_toy.py
Distills a tiny frozen MMDiT teacher into rank-4 LoRA factors on a
2-cell ladder, then samples in ONE step with the consistency head: the
one-step sample's MSE to the teacher's full-ladder rollout must drop by
at least 2x (probe-measured ~6x at these settings).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.config.jax_platforms and "axon" in str(jax.config.jax_platforms):
    jax.config.update("jax_platforms", "cpu")

import logging

import jax.numpy as jnp
import numpy as np

from tpdm_tpu.models.lora import apply_lora, init_lora
from tpdm_tpu.train import DistillConfig, DistillTrainer, RLOOConfig
from tpdm_tpu.train import make_few_step_sampler
from tpdm_tpu.train.builders import build_toy_agent, make_prompt_encoder

logging.basicConfig(level=logging.INFO, format="%(message)s")


def main():
    agent = build_toy_agent(RLOOConfig(guidance_scale=7.0))
    dataset = [{"prompt": f"prompt {i}"} for i in range(2)]
    cfg = DistillConfig(
        total_updates=40,
        batch_size=2,
        learning_rate=1e-2,
        lora_rank=4,
        num_ladder_steps=2,
        skip_steps=1,
        ema_decay=0.5,
        logging_steps=10,
    )
    trainer = DistillTrainer(
        cfg, agent, dataset, collate_fn=make_prompt_encoder(agent)
    )
    R = trainer.regime

    batch = trainer.collate_fn(dataset)
    arrays = {
        k: v for k, v in batch.items()
        if isinstance(v, (jax.Array, np.ndarray))
    }
    eps = agent.prepare_latents(jax.random.PRNGKey(42), 2)

    # the target: the teacher's full-ladder ODE rollout
    teacher = agent.denoise_builder(agent.backbone_params, arrays)
    x = eps
    for i in range(cfg.num_ladder_steps):
        x = R["teacher_step"](
            teacher, x, jnp.full((2,), i, jnp.int32),
            jnp.full((2,), i + 1, jnp.int32),
        )
    target = np.asarray(x, np.float32)

    sample1 = make_few_step_sampler(agent, cfg.num_ladder_steps, (0,))

    def one_step_err(lora):
        merged = apply_lora(agent.backbone_params, lora, scale=cfg.lora_scale)
        out = np.asarray(
            sample1(merged, arrays, eps, jax.random.PRNGKey(0)), np.float32
        )
        return float(np.mean((out - target) ** 2))

    lora0 = init_lora(agent.backbone_params, cfg.lora_rank, jax.random.PRNGKey(0))
    err_before = one_step_err(lora0)
    lora, _, _ = trainer.train(lora=jax.tree.map(jnp.copy, lora0))
    err_after = one_step_err(lora)

    print(f"one-step MSE to teacher rollout: {err_before:.4f} -> {err_after:.4f}")
    assert err_after < 0.5 * err_before, (err_before, err_after)
    print("OK: the student samples in 1 step what the teacher needs the "
          "full ladder for")


if __name__ == "__main__":
    main()
