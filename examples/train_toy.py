"""End-to-end toy RLOO training drive: 3 updates on a tiny MMDiT + TPM.

Run: JAX_PLATFORMS=cpu python examples/train_toy.py
Prints per-update metrics; all must be finite and the ratio must start ~1.
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

from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
from tpdm_tpu.train import RLOOConfig, RLOOTrainer, TPDMAgent

logging.basicConfig(level=logging.INFO, format="%(message)s")


def main():
    cfg_m = MMDiTConfig.toy()
    model = MMDiT(cfg_m)
    n_txt = 5
    b = 2
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.ones((b, cfg_m.in_channels, cfg_m.sample_size, cfg_m.sample_size)),
        jnp.ones((b,)),
        jnp.ones((b, n_txt, cfg_m.joint_attention_dim)),
        jnp.ones((b, cfg_m.pooled_projection_dim)),
    )
    config = RLOOConfig(
        per_device_train_batch_size=4,
        rloo_k=2,
        max_inference_steps=4,
        total_episodes=12,
        learning_rate=1e-3,
    )
    agent = TPDMAgent(
        model,
        params,
        config,
        tpm=TimePredictor(
            conv_out_channels=4,
            in_channels=2 * cfg_m.inner_dim,
            temb_dim=cfg_m.inner_dim,
        ),
    )

    rng = np.random.default_rng(0)
    dataset = [
        {
            "prompt": f"prompt {i}",
            "prompt_embeds": rng.normal(size=(n_txt, cfg_m.joint_attention_dim)).astype(np.float32),
            "pooled_prompt_embeds": rng.normal(size=(cfg_m.pooled_projection_dim,)).astype(np.float32),
            "negative_prompt_embeds": np.zeros((n_txt, cfg_m.joint_attention_dim), np.float32),
            "negative_pooled_prompt_embeds": np.zeros((cfg_m.pooled_projection_dim,), np.float32),
        }
        for i in range(4)
    ]

    # Reward that prefers fewer steps: the core TPDM objective shape.
    def reward_fn(prompts, outputs):
        quality = np.asarray(jnp.tanh(jnp.mean(outputs.final_latents, axis=(1, 2, 3))))
        return quality, quality

    trainer = RLOOTrainer(config, agent, reward_fn, dataset)
    trainer.train()
    for i, m in enumerate(trainer.metrics_history):
        print(
            f"update {i+1}: loss={m['loss/policy_avg']:.4f} "
            f"reward={m['objective/rlhf_reward']:.4f} kl={m['objective/kl']:.4f} "
            f"steps_avg={m['policy/steps_avg']:.2f} ratio={m['val/ratio']:.4f} "
            f"grad_norm={m['policy/grad_norm_avg']:.4f} skipped={m['val/num_skipped']}"
        )
    assert all(np.isfinite(list(m.values())).all() for m in trainer.metrics_history)
    print("OK: all metrics finite")


if __name__ == "__main__":
    main()
