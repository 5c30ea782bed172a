"""Reproduce the synthetic-reward learning curve (docs/LEARNING.md).

Runs the full RLOO stack (rollout -> step-discounted reward -> leave-one-out
advantage -> TPM-only replay -> clipped PG -> adam) on a toy MMDiT with a
CONSTANT positive score: with gamma < 1, the reference's discount
sum_i r*gamma^(L-i)/(L+1) (reference: modeling_sd3_pnt.py:838-841) strictly
favors shorter schedules, so a correct trainer must drive policy/steps_avg
down and objective/rlhf_reward up — the NFE-cut headline in miniature
(reference: README.md:16-17).

Run: JAX_PLATFORMS=cpu python examples/learn_synthetic.py
Writes docs/learning_curve.json and prints the curve.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.config.jax_platforms and "axon" in str(jax.config.jax_platforms):
    jax.config.update("jax_platforms", "cpu")

import logging

logging.disable(logging.INFO)

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def main(num_updates: int = 40):
    from test_learning import _build_world

    trainer = _build_world(num_updates=num_updates)
    trainer.train()
    hist = trainer.metrics_history

    rows = [
        {
            "update": i + 1,
            "steps_avg": round(m["policy/steps_avg"], 3),
            "rlhf_reward": round(m["objective/rlhf_reward"], 4),
            "scores": round(m["objective/scores"], 4),
            "ratio": round(m["val/ratio"], 4),
            "skipped": m["val/num_skipped"],
        }
        for i, m in enumerate(hist)
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "learning_curve.json",
    )
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    for r in rows[::4]:
        print(r)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
