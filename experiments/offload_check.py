"""On-TPU check: pinned-host activation cache survives the agent jit boundary.

Round-1 gap (VERDICT item 5): without out_shardings the cache silently
migrated back to HBM between rollout and replay. Run on the real chip:
  nohup python experiments/offload_check.py > /tmp/offload_check.log 2>&1 &
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
from tpdm_tpu.train import RLOOConfig, TPDMAgent


def main():
    assert jax.default_backend() not in ("cpu", "gpu"), jax.default_backend()
    cfg_m = MMDiTConfig.toy(use_pallas=False, dtype=jnp.bfloat16)
    model = MMDiT(cfg_m)
    n_txt = 5
    b = 2
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.ones((2 * b, cfg_m.in_channels, cfg_m.sample_size, cfg_m.sample_size), jnp.bfloat16),
        jnp.ones((2 * b,)),
        jnp.ones((2 * b, n_txt, cfg_m.joint_attention_dim), jnp.bfloat16),
        jnp.ones((2 * b, cfg_m.pooled_projection_dim), jnp.bfloat16),
    )
    config = RLOOConfig(
        per_device_train_batch_size=b, rloo_k=2, max_inference_steps=4,
        guidance_scale=7.0,
    )
    tpm = TimePredictor(
        conv_out_channels=4, in_channels=2 * cfg_m.inner_dim, temb_dim=cfg_m.inner_dim
    )

    import dataclasses

    agent = TPDMAgent(model, params, config, tpm=tpm)
    tpm_params = agent.init_tpm_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "prompt_embeds": jnp.asarray(rng.normal(size=(b, n_txt, cfg_m.joint_attention_dim)), jnp.float32),
        "pooled_prompt_embeds": jnp.zeros((b, cfg_m.pooled_projection_dim)),
        "negative_prompt_embeds": jnp.zeros((b, n_txt, cfg_m.joint_attention_dim)),
        "negative_pooled_prompt_embeds": jnp.zeros((b, cfg_m.pooled_projection_dim)),
    }
    key = jax.random.PRNGKey(7)

    base = agent.sample(tpm_params, batch, key)
    off_cfg = dataclasses.replace(agent.sampler_cfg, offload_cache=True)
    off = agent.sample(tpm_params, batch, key, sampler_cfg=off_cfg)

    kind = off.h_cache.sharding.memory_kind
    print("h_cache memory_kind across jit boundary:", kind)
    assert kind == "pinned_host", kind
    assert off.temb_cache.sharding.memory_kind == "pinned_host"
    assert base.h_cache.sharding.memory_kind != "pinned_host"

    np.testing.assert_allclose(
        np.asarray(base.sigmas), np.asarray(off.sigmas), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(base.h_cache, np.float32),
        np.asarray(off.h_cache, np.float32),
        rtol=1e-5,
    )

    # replay consumes the host-resident cache (streams steps back per scan)
    agent.sampler_cfg = off_cfg
    agent._replay_jit = jax.jit(agent._replay)
    lp = agent.logprobs(tpm_params, off)
    lp_base = np.asarray(base.logprobs)
    np.testing.assert_allclose(np.asarray(lp), lp_base, rtol=1e-3, atol=1e-4)
    print("offload_check OK: cache pinned_host end to end, replay matches")


if __name__ == "__main__":
    main()
