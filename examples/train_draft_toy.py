"""End-to-end toy reward-gradient (DRaFT/ReFL-style) LoRA fine-tune.

Run: JAX_PLATFORMS=cpu python examples/train_draft_toy.py
Trains rank-2 LoRA factors over a tiny frozen MMDiT to maximize a
differentiable latent-mean reward through the last denoise step; the
per-update reward must ascend and the base weights must not move.
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

from tpdm_tpu.train import DraftConfig, DraftTrainer, RLOOConfig
from tpdm_tpu.train.builders import build_toy_agent, make_prompt_encoder

logging.basicConfig(level=logging.INFO, format="%(message)s")


def main():
    agent = build_toy_agent(RLOOConfig(guidance_scale=7.0))
    base_before = jax.tree.map(jnp.copy, agent.mmdit_params)
    dataset = [{"prompt": f"prompt {i}"} for i in range(4)]
    cfg = DraftConfig(
        total_updates=4,
        batch_size=2,
        learning_rate=5e-3,
        lora_rank=2,
        num_steps=3,
        k_backprop=1,
    )
    trainer = DraftTrainer(
        cfg,
        agent,
        # toy differentiable reward: mean final-latent value
        lambda images, batch: jnp.mean(images, axis=(1, 2, 3)),
        dataset,
        collate_fn=make_prompt_encoder(agent),
    )
    lora, _ = trainer.train()

    rewards = [m["draft/reward"] for m in trainer.metrics_history]
    print("rewards:", [round(r, 4) for r in rewards])
    assert rewards[-1] > rewards[0], "reward did not ascend"
    for a, b in zip(
        jax.tree_util.tree_leaves(base_before),
        jax.tree_util.tree_leaves(agent.mmdit_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("OK: reward ascended; base weights frozen; LoRA learned")


if __name__ == "__main__":
    main()
