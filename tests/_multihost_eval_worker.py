"""Worker for the 2-process multihost eval-callback test.

Spawned by tests/test_callbacks_multihost.py as two real processes joined
with jax.distributed (Gloo on CPU) — the JAX answer to exercising the
reference's rank-split + gather eval path (reference:
src/train/callbacks.py:53,81-86) without a pod.

Usage: python _multihost_eval_worker.py <process_id> <port> <outdir>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    import numpy as np

    from tpdm_tpu.models import MMDiT, MMDiTConfig, TimePredictor
    from tpdm_tpu.train import RLOOConfig, TPDMAgent
    from tpdm_tpu.train.callbacks import EvalVisualizationCallback

    cfg_m = MMDiTConfig.toy()
    model = MMDiT(cfg_m)
    n_txt = 5
    params = model.init(
        jax.random.PRNGKey(1),
        jax.numpy.ones((2, cfg_m.in_channels, cfg_m.sample_size, cfg_m.sample_size)),
        jax.numpy.ones((2,)),
        jax.numpy.ones((2, n_txt, cfg_m.joint_attention_dim)),
        jax.numpy.ones((2, cfg_m.pooled_projection_dim)),
    )
    config = RLOOConfig(
        per_device_train_batch_size=2,
        rloo_k=2,
        max_inference_steps=3,
        guidance_scale=7.0,
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
    tpm_params = agent.init_tpm_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    n_eval = 3  # odd on purpose: process 1 gets a padded slice
    eval_batch = {
        "prompt": [f"eval prompt {i}" for i in range(n_eval)],
        "prompt_embeds": rng.normal(size=(n_eval, n_txt, cfg_m.joint_attention_dim)).astype(
            np.float32
        ),
        "pooled_prompt_embeds": rng.normal(
            size=(n_eval, cfg_m.pooled_projection_dim)
        ).astype(np.float32),
        "negative_prompt_embeds": np.zeros(
            (n_eval, n_txt, cfg_m.joint_attention_dim), np.float32
        ),
        "negative_pooled_prompt_embeds": np.zeros(
            (n_eval, cfg_m.pooled_projection_dim), np.float32
        ),
    }

    def reward_fn(prompts, outputs):
        # reward encodes which process scored the row, so the test can see
        # that rank 0's record contains rank 1's contributions post-gather
        b = outputs.sigmas.shape[0]
        r = np.full((b,), float(jax.process_index() + 1), np.float32)
        return r, r

    cb = EvalVisualizationCallback(
        eval_batch,
        output_dir=outdir,
        reward_fn=reward_fn,
        eval_steps=1,
        max_inference_steps=3,
        save_images=False,
    )

    class FakeTrainer:
        pass

    t = FakeTrainer()
    t.agent = agent
    cb.on_step_end(t, update=1, metrics={}, tpm_params=tpm_params)

    if jax.process_index() == 0:
        assert len(cb.history) == 1, cb.history
        rec = cb.history[0]
        summary = {
            "rows": int(rec["sigmas"].shape[0]),
            "steps": int(rec["sigmas"].shape[1]),
            "rewards": np.asarray(rec["rewards"]).tolist(),
            "nfe": np.asarray(rec["nfe"]).tolist(),
            "plot_exists": os.path.exists(
                os.path.join(outdir, "eval_curves_1.png")
            ),
        }
        with open(os.path.join(outdir, "summary.json"), "w") as f:
            json.dump(summary, f)
    else:
        assert cb.history == []  # non-zero ranks keep nothing


if __name__ == "__main__":
    main()
