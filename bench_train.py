"""Training-path benchmark: rollout (with activation cache) + PPO update.

Not run by the driver (bench.py is the headline); this measures the RLOO
training loop's two phases at SD3-medium scale on one chip:
  - rollout episodes/sec (28-step adaptive loop, cache ON, batch b)
  - PPO micro-steps/sec (TPM-only replay + update)

Usage: python bench_train.py [batch] [--int8] [--recompute] [--draft]
  --int8      stored-int8 backbone (prequantize_params): halves weight HBM
              (2.0 vs 4.1 GB at SD3-medium) to buy batch/cache headroom
  --recompute replay_mode="recompute" (latent-history replay, 50x smaller
              cache)
  --draft     additionally time one reward-gradient (DRaFT-K) LoRA update
              (train/draft.py): 28-step ladder, K=1 differentiable, toy
              latent-mean reward (isolates the sampler+backprop cost from
              the reward tower)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from tpdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    b = int(args[0]) if args else 2
    int8 = "--int8" in sys.argv
    replay_mode = "recompute" if "--recompute" in sys.argv else "cached"
    on_tpu = jax.default_backend() not in ("cpu", "gpu")

    from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
    from tpdm_tpu.train import RLOOConfig, TPDMAgent
    from tpdm_tpu.train.rloo import ppo_loss

    mcfg = (
        MMDiTConfig.sd3_medium(quant_matmuls=int8)
        if on_tpu
        else MMDiTConfig.toy(dtype=jnp.bfloat16, quant_matmuls=int8)
    )
    n_txt = 333 if on_tpu else 8
    model = MMDiT(mcfg)
    shapes = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jnp.zeros((2 * b, mcfg.in_channels, mcfg.sample_size, mcfg.sample_size), jnp.bfloat16),
        jnp.ones((2 * b,)),
        jnp.zeros((2 * b, n_txt, mcfg.joint_attention_dim), jnp.bfloat16),
        jnp.zeros((2 * b, mcfg.pooled_projection_dim), jnp.bfloat16),
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        shapes,
    )
    if int8:
        from tpdm_tpu.ops.quant import prequantize_params

        params = prequantize_params(params)
    config = RLOOConfig(max_inference_steps=28, rloo_k=2, per_device_train_batch_size=b)
    agent = TPDMAgent(
        model, params, config,
        tpm=TimePredictor(
            conv_out_channels=128 if on_tpu else 8,
            in_channels=2 * mcfg.inner_dim,
            temb_dim=mcfg.inner_dim,
            dtype=jnp.bfloat16,
        ),
        replay_mode=replay_mode,
    )
    tpm_params = agent.init_tpm_params(jax.random.PRNGKey(1))
    batch = {
        "prompt_embeds": jnp.zeros((b, n_txt, mcfg.joint_attention_dim), jnp.bfloat16),
        "pooled_prompt_embeds": jnp.zeros((b, mcfg.pooled_projection_dim), jnp.bfloat16),
        "negative_prompt_embeds": jnp.zeros((b, n_txt, mcfg.joint_attention_dim), jnp.bfloat16),
        "negative_pooled_prompt_embeds": jnp.zeros((b, mcfg.pooled_projection_dim), jnp.bfloat16),
    }

    def sync(x):
        _ = np.asarray(jax.tree.leaves(x)[0]).ravel()[0]

    out = agent.sample(tpm_params, batch, jax.random.PRNGKey(2))
    sync(out.sigmas)
    t0 = time.time()
    out = agent.sample(tpm_params, batch, jax.random.PRNGKey(3))
    sync(out.sigmas)
    rollout_s = time.time() - t0

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-6, b1=0.9, b2=0.99))
    opt_state = tx.init(tpm_params)
    adv = jnp.ones((b,))

    replay_inputs = batch if agent.needs_inputs_for_replay else None
    # backbone params flow through the jit signature in recompute mode —
    # captured constants would embed the full 2B tree in the jaxpr
    backbone = agent.replay_backbone_params()

    @jax.jit
    def ppo_step(p, opt_state, out, adv, backbone):
        def loss_fn(p):
            lp = agent.replay(
                p, out, inputs=replay_inputs, backbone_params=backbone
            )
            return ppo_loss(lp, out.logprobs, adv, 0.2)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    p, opt_state, loss = ppo_step(tpm_params, opt_state, out, adv, backbone)
    sync(loss)
    t0 = time.time()
    for _ in range(5):
        p, opt_state, loss = ppo_step(p, opt_state, out, adv, backbone)
    sync(loss)
    ppo_s = (time.time() - t0) / 5

    draft_s = None
    if "--draft" in sys.argv:
        from tpdm_tpu.train.draft import DraftConfig, DraftTrainer

        # per-sample rows from the batched embeds; default collate restacks
        rows = [
            {k: v[i % b] for k, v in batch.items()} for i in range(max(b, 2))
        ]
        dcfg = DraftConfig(
            total_updates=1, batch_size=b, learning_rate=1e-4,
            lora_rank=4, num_steps=config.max_inference_steps, k_backprop=1,
        )
        dtrainer = DraftTrainer(
            dcfg, agent,
            lambda imgs, _batch: jnp.mean(imgs, axis=(1, 2, 3)), rows,
        )
        dtrainer.train()  # compile
        t0 = time.time()
        lora, _ = dtrainer.train()
        sync(jax.tree.leaves(lora)[0])
        draft_s = time.time() - t0

    result = {
        "rollout_s": round(rollout_s, 3),
        "rollout_episodes_per_s": round(b / rollout_s, 4),
        "ppo_microstep_s": round(ppo_s, 4),
        "ppo_microsteps_per_s": round(1 / ppo_s, 2),
        "batch": b,
        "backend": jax.default_backend(),
        "nfe": int(out.num_steps),
        "int8": int8,
        "replay_mode": replay_mode,
    }
    if draft_s is not None:
        result["draft_update_s"] = round(draft_s, 3)
        result["draft_updates_per_s"] = round(1 / draft_s, 4)
    try:
        stats = jax.local_devices()[0].memory_stats()
        result["hbm_peak_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    except Exception:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
