"""Multi-tenant LoRA serving: time-multiplexed vs FUSED, measured.

The continuous engine serves named adapters two ways
(tpdm_tpu/serving_continuous.py register_adapter):

- multiplex (default): one adapter's MERGED weights per segment, peer
  slots frozen by the live-mask. Exact merged numerics; utilization
  divides across tenants, and each resident merged tree is a full
  backbone copy in HBM (merged_cache) — evicted tenants pay a re-merge
  (a full tree-add materialization) every time they're scheduled.
- fused (--lora_fused): stacked rank-r factor banks, per-slot ids, and
  in-backbone per-row deltas (models/lora.py stack_adapters /
  lora_interceptor). Every tenant advances every segment; no merged
  copies; ~r/d extra FLOPs on each matched matmul.

This measures both at real SD3-medium 1024px serving geometry with the
same controlled-NFE workload as serving_cb_bench.py (caps ~
Uniform[10,28], slow constant policy -> NFE == cap exactly), plus a
fused-engine all-base leg isolating the interceptor's overhead.

Run (CPU logic check):
  JAX_PLATFORMS=cpu python experiments/serving_adapters_bench.py --toy
Run (real TPU geometry):
  nohup python experiments/serving_adapters_bench.py > /tmp/adapters_bench.log 2>&1 &
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from serving_cb_bench import build_world


def make_adapters(pipe, names, rank):
    import jax

    from tpdm_tpu.models.lora import init_lora

    return {
        n: init_lora(pipe.mmdit_params, rank=rank,
                     key=jax.random.PRNGKey(10 + i))
        for i, n in enumerate(names)
    }


def run_leg(pipe, tokenize, prompts, seeds, caps, loras, *, slots, seg,
            max_steps, fused, adapters, merged_cache, label):
    from tpdm_tpu.serving_continuous import ContinuousBatchingEngine

    eng = ContinuousBatchingEngine(
        pipe, tokenize, slots=slots, seg_steps=seg, max_steps=max_steps,
        queue_limit=len(prompts) + slots, fused_lora=fused,
    )
    for name, lora in adapters.items():
        eng.register_adapter(name, lora, merged_cache=merged_cache)
    eng.start()
    try:
        # warmup: compile the segment (+ the merge jit on multiplex) off
        # the clock — one request per registered tenant + one base
        warm = [eng.submit("warmup base", seed=0, steps=1)] + [
            eng.submit(f"warmup {n}", seed=0, steps=1, lora=n)
            for n in adapters
        ]
        for r in warm:
            r.result(timeout=3600)
        s0 = eng.stats()
        t0 = time.monotonic()
        reqs = [eng.submit(p, seed=s, steps=c, lora=l)
                for p, s, c, l in zip(prompts, seeds, caps, loras)]
        nfes = [r.result(timeout=3600)["inference_steps"] for r in reqs]
        dt = time.monotonic() - t0
        s1 = eng.stats()
    finally:
        eng.stop()
    tot = s1["slot_steps_total"] - s0["slot_steps_total"]
    act = s1["slot_steps_active"] - s0["slot_steps_active"]
    return {
        "leg": label,
        "mode": "fused" if fused else "multiplex",
        "tenants": sorted({l for l in loras if l}) or ["<base only>"],
        "merged_cache": merged_cache if (adapters and not fused) else None,
        "wall_s": round(dt, 3),
        "img_per_s": round(len(prompts) / dt, 4),
        "nfe_mean": round(float(np.mean(nfes)), 2),
        "slot_utilization": round(act / tot, 4) if tot else None,
        "segments_run": s1["segments_run"] - s0["segments_run"],
        "adapter_merges": s1.get("adapter_merges", 0),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--toy", action="store_true")
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--seg_steps", type=int, default=4)
    ap.add_argument("--max_steps", type=int, default=28)
    ap.add_argument("--nfe_lo", type=int, default=10)
    ap.add_argument("--nfe_hi", type=int, default=28)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--skip_4tenant", action="store_true")
    args = ap.parse_args()

    pipe, tokenize = build_world(args.toy)
    prompts = [f"tenant benchmark prompt {i} w{i} x{i*3}"
               for i in range(args.n)]
    seeds = list(range(args.n))
    rng = np.random.default_rng(0)
    caps = [int(c) for c in
            rng.integers(args.nfe_lo, args.nfe_hi + 1, size=args.n)]
    print(json.dumps({"workload_caps": caps, "slots": args.slots,
                      "seg_steps": args.seg_steps, "rank": args.rank}),
          flush=True)

    two = make_adapters(pipe, ["a", "b"], args.rank)
    mix2 = [["a", "b"][i % 2] for i in range(args.n)]
    base_only = [None] * args.n

    legs = [
        dict(loras=base_only, fused=False, adapters={}, merged_cache=1,
             label="baseline_no_adapters"),
        dict(loras=base_only, fused=True, adapters=two, merged_cache=1,
             label="fused_engine_base_traffic (interceptor overhead)"),
        dict(loras=mix2, fused=True, adapters=two, merged_cache=1,
             label="fused_2tenant_50_50"),
        dict(loras=mix2, fused=False, adapters=two, merged_cache=2,
             label="multiplex_2tenant_cache2"),
        dict(loras=mix2, fused=False, adapters=two, merged_cache=1,
             label="multiplex_2tenant_cache1 (re-merge thrash)"),
    ]
    if not args.skip_4tenant:
        four = make_adapters(pipe, ["a", "b", "c", "d"], args.rank)
        mix4 = [["a", "b", "c", "d"][i % 4] for i in range(args.n)]
        legs += [
            dict(loras=mix4, fused=True, adapters=four, merged_cache=1,
                 label="fused_4tenant_uniform"),
            dict(loras=mix4, fused=False, adapters=four, merged_cache=1,
                 label="multiplex_4tenant_cache1"),
        ]

    for leg in legs:
        label = leg["label"]
        try:
            out = run_leg(pipe, tokenize, prompts, seeds, caps,
                          leg["loras"], slots=args.slots,
                          seg=args.seg_steps, max_steps=args.max_steps,
                          fused=leg["fused"], adapters=leg["adapters"],
                          merged_cache=leg["merged_cache"], label=label)
        except BaseException as e:  # OOM on a leg is itself a finding
            out = {"leg": label, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
