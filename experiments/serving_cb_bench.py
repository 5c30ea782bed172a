"""Measure continuous batching vs fixed-batch serving under NFE variance.

The question: at real SD3-medium serving geometry, how much throughput
does step-level slot recycling (tpdm_tpu/serving_continuous.py) buy over
fixed-batch serving (tpdm_tpu/serving.py) when each request needs its OWN
number of denoise steps — the regime TPDM creates, whether via a trained
TPM's per-prompt early stopping or via the per-request `steps` knob?

Instrumentation: no trained weights exist in this environment, so the NFE
distribution is controlled directly through per-request step caps
(ServeRequest.steps ~ Uniform[10, 28], seeded) with a slow constant
policy (paper init alpha 2.5 / beta 1.0 -> ratio mode 1.0, clamped: sigma
never reaches min_sigma before the cap). Every request's NFE is then
exactly its cap, identical for both engines — the measured difference is
purely slot economics:

- fixed-batch: each batch runs to max(cap in batch); shorter requests'
  slots idle (the sampler's while_loop does early-exit at the batch max —
  its best case).
- continuous: finished slots refill between seg_steps-long segments.

Both engines share the model, fake text encoders (identical cost), no VAE
(identical cost). Outputs one JSON line per engine config.

Run (CPU logic check):   JAX_PLATFORMS=cpu python experiments/serving_cb_bench.py --toy
Run (real TPU geometry): nohup python experiments/serving_cb_bench.py > /tmp/cb_bench.log 2>&1 &
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_world(toy: bool):
    import jax

    if toy and "axon" in str(jax.config.jax_platforms):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpdm_tpu.models.mmdit import MMDiT, MMDiTConfig
    from tpdm_tpu.pipeline.pipeline import TPDMPipeline

    if toy:
        cfg = MMDiTConfig.toy(joint_attention_dim=96, pooled_projection_dim=64)
        ctx_len = 20
    else:
        cfg = MMDiTConfig.sd3_medium(dtype=jnp.bfloat16)
        ctx_len = 333
    mmdit = MMDiT(cfg)
    shapes = jax.eval_shape(
        mmdit.init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.in_channels, cfg.sample_size, cfg.sample_size), cfg.dtype),
        jnp.ones((1,), cfg.dtype),
        jnp.zeros((1, ctx_len, cfg.joint_attention_dim), cfg.dtype),
        jnp.zeros((1, cfg.pooled_projection_dim), cfg.dtype),
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    class SlowPolicy:
        """Paper-init constant policy (alpha 2.5, beta 1.0,
        launch_sd3_train.sh:29-30): Beta mode = 1.0 -> ratio clamps to
        1 - eps, so sigma never crosses min_sigma before the step cap and
        each request's NFE is EXACTLY its requested cap."""

        def apply(self, params, h, temb):
            b = h.shape[0]
            return jnp.broadcast_to(jnp.array([[2.5, 1.0]], jnp.float32), (b, 2))

    pipe = TPDMPipeline(mmdit, params, SlowPolicy(), None, vae=None,
                        vae_params=None, text_encoders=None, min_sigma=0.001)

    class FakeTextEncoders:
        """Deterministic random embeds per token-id content (cheap,
        identical cost for both engines — text encoding is out of scope)."""

        def encode(self, clip_ids, t5_ids=None):
            from tpdm_tpu.pipeline.text_encoding import PromptEmbeds

            rows_pe, rows_pp = [], []
            for row in np.asarray(clip_ids):
                seed = int(np.abs(row).sum()) % (2**31)
                k = jax.random.PRNGKey(seed)
                rows_pe.append(
                    jax.random.normal(
                        k, (ctx_len, cfg.joint_attention_dim), cfg.dtype
                    )
                )
                rows_pp.append(
                    jax.random.normal(
                        jax.random.fold_in(k, 1),
                        (cfg.pooled_projection_dim,),
                        cfg.dtype,
                    )
                )
            return PromptEmbeds(jnp.stack(rows_pe), jnp.stack(rows_pp))

    pipe.text_encoders = FakeTextEncoders()

    def tokenize(prompt, n=77):
        ids = [97] + [abs(hash(w)) % 30000 + 1 for w in prompt.split()[:10]] + [98]
        ids = ids[:n] + [0] * (n - len(ids))
        return np.array([ids], np.int32), np.zeros((1, 8), np.int32)

    return pipe, tokenize


def run_static(pipe, tokenize, prompts, seeds, caps, max_batch, max_steps):
    from tpdm_tpu.serving import BatchingEngine

    eng = BatchingEngine(pipe, tokenize, max_batch=max_batch, window_ms=1,
                         max_steps=max_steps)
    eng.generate_batch(prompts[:max_batch], seeds[:max_batch],
                       record_stats=False)  # warmup/compile
    t0 = time.monotonic()
    nfes, batch_steps = [], 0
    for i in range(0, len(prompts), max_batch):
        out = eng.generate_batch(prompts[i : i + max_batch],
                                 seeds[i : i + max_batch],
                                 steps=caps[i : i + max_batch])
        got = [o["inference_steps"] for o in out]
        nfes.extend(got)
        batch_steps += max(got)  # the while_loop runs to the batch max
    dt = time.monotonic() - t0
    return {
        "engine": "static",
        "wall_s": round(dt, 3),
        "img_per_s": round(len(prompts) / dt, 4),
        "nfe_mean": round(float(np.mean(nfes)), 2),
        "nfe_min": int(np.min(nfes)),
        "nfe_max": int(np.max(nfes)),
        # slot-steps actually paid vs useful: every slot runs to batch max
        "slot_steps_total": batch_steps * max_batch,
        "slot_steps_active": int(np.sum(nfes)),
        "slot_utilization": round(float(np.sum(nfes)) / (batch_steps * max_batch), 4),
    }


def run_continuous(pipe, tokenize, prompts, seeds, caps, slots, seg_steps,
                   max_steps, async_decode=True, pipeline_depth=1):
    from tpdm_tpu.serving_continuous import ContinuousBatchingEngine

    eng = ContinuousBatchingEngine(pipe, tokenize, slots=slots,
                                   seg_steps=seg_steps, max_steps=max_steps,
                                   queue_limit=len(prompts) + slots,
                                   async_decode=async_decode,
                                   pipeline_depth=pipeline_depth)
    eng.warmup()
    eng.start()
    t0 = time.monotonic()
    reqs = [eng.submit(p, seed=s, steps=c)
            for p, s, c in zip(prompts, seeds, caps)]
    nfes = [r.result(timeout=3600)["inference_steps"] for r in reqs]
    dt = time.monotonic() - t0
    eng.stop()
    s = eng.stats()
    return {
        "engine": f"continuous(seg={seg_steps})",
        "async_decode": async_decode,
        "pipeline_depth": pipeline_depth,
        "wall_s": round(dt, 3),
        "img_per_s": round(len(prompts) / dt, 4),
        "nfe_mean": round(float(np.mean(nfes)), 2),
        "nfe_min": int(np.min(nfes)),
        "nfe_max": int(np.max(nfes)),
        "slot_steps_total": s["slot_steps_total"],
        "slot_steps_active": s["slot_steps_active"],
        "slot_utilization": round(s["slot_utilization"], 4),
        "segments_run": s["segments_run"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--toy", action="store_true")
    ap.add_argument("--n", type=int, default=24, help="requests in the workload")
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--max_steps", type=int, default=28)
    ap.add_argument("--nfe_lo", type=int, default=10)
    ap.add_argument("--nfe_hi", type=int, default=28)
    ap.add_argument("--segs", default="4,7", help="seg_steps values to sweep")
    ap.add_argument("--async_sweep", action="store_true",
                    help="also measure async_decode=False (decode/readback "
                         "inline between segments) for each seg_steps")
    ap.add_argument("--depths", default="1",
                    help="pipeline_depth values to sweep (depth 2 overlaps "
                         "the per-segment host sync with device compute)")
    args = ap.parse_args()

    pipe, tokenize = build_world(args.toy)
    prompts = [f"benchmark prompt number {i} with words w{i} x{i*3}"
               for i in range(args.n)]
    seeds = list(range(args.n))
    rng = np.random.default_rng(0)
    caps = [int(c) for c in
            rng.integers(args.nfe_lo, args.nfe_hi + 1, size=args.n)]
    print(json.dumps({"workload_caps": caps}), flush=True)

    static = run_static(pipe, tokenize, prompts, seeds, caps, args.slots,
                        args.max_steps)
    print(json.dumps(static), flush=True)
    for seg in (int(x) for x in args.segs.split(",")):
        for depth in (int(x) for x in args.depths.split(",")):
            for async_decode in (
                (True, False) if args.async_sweep else (True,)
            ):
                cb = run_continuous(pipe, tokenize, prompts, seeds, caps,
                                    args.slots, seg, args.max_steps,
                                    async_decode=async_decode,
                                    pipeline_depth=depth)
                cb["speedup_vs_static"] = round(
                    cb["img_per_s"] / static["img_per_s"], 3
                )
                print(json.dumps(cb), flush=True)


if __name__ == "__main__":
    main()
