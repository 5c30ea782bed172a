"""Policy-collapse guard: bounded TPM head + skip-rate alarm.

Reproduces the docs/learning_curve_sd3.json endgame (updates 23-30:
steps_avg 1.0, every update NaN/Inf-skipped): once the policy collapses
to the 1-step optimum, the unbounded exp() head blows past fp32 at the
ratio-clamp boundary and the finite-guard silently skips every update —
training is dead but the metrics stream looks alive. The reference's own
NaN guard (rloo_trainer.py:497-523) has the same blind spot.

Two defenses, both beyond-reference:
- `TimePredictor.param_cap` (RLOOConfig.tpm_param_cap): alpha/beta
  saturate finitely at epsilon + cap (an entropy floor) instead of
  overflowing;
- `policy/skip_rate` rolling metric + a WARNING once the rate exceeds
  RLOOConfig.skip_alarm_threshold over skip_alarm_window updates.
"""

import logging
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from test_learning import _build_world  # noqa: E402

from tpdm_tpu.models import TimePredictor  # noqa: E402


def _corrupt_head(tpm_params, raw=(90.0, -1.0)):
    """A collapsed policy's head: exp(90) overflows fp32 -> alpha = inf."""
    p = jax.tree.map(jnp.copy, tpm_params)
    p["params"]["fc2"]["bias"] = jnp.asarray(raw, jnp.float32)
    return p


class TestCollapseReproAndAlarm:
    def test_uncapped_collapse_skips_everything_and_alarms(self, caplog):
        trainer = _build_world(num_updates=10)
        bad = _corrupt_head(
            trainer.agent.init_tpm_params(jax.random.PRNGKey(0))
        )
        with caplog.at_level(logging.WARNING, logger="tpdm_tpu.train.rloo"):
            trainer.train(tpm_params=bad)
        hist = trainer.metrics_history
        # the reproduced endgame: every update skipped, rate pegged at 1
        assert all(m["val/num_skipped"] == 1.0 for m in hist), hist[-1]
        assert hist[-1]["policy/skip_rate"] == 1.0
        # ... and it is LOUD now
        assert any(
            "policy collapse suspected" in r.message for r in caplog.records
        )

    def test_healthy_run_has_zero_skip_rate_and_no_alarm(self, caplog):
        trainer = _build_world(num_updates=10)
        with caplog.at_level(logging.WARNING, logger="tpdm_tpu.train.rloo"):
            trainer.train()
        hist = trainer.metrics_history
        assert all(m["policy/skip_rate"] == 0.0 for m in hist)
        assert not any(
            "policy collapse suspected" in r.message for r in caplog.records
        )


class TestParamCap:
    def test_capped_head_matches_exp_in_the_working_range(self):
        """cap*sigmoid(x - log cap) == exp(x) to first order below the cap:
        the guard must not change the policy where it actually operates."""
        kw = dict(
            conv_out_channels=4, in_channels=8, temb_dim=8,
            init_alpha=2.5, init_beta=0.7,
        )
        plain = TimePredictor(**kw)
        capped = TimePredictor(param_cap=1e4, **kw)
        x = jnp.ones((2, 8, 4, 4))
        temb = jnp.ones((2, 8))
        params = plain.init(jax.random.PRNGKey(0), x, temb)
        a = plain.apply(params, x, temb)
        b = capped.apply(params, x, temb)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3
        )

    def test_capped_head_saturates_finitely(self):
        capped = TimePredictor(
            conv_out_channels=4, in_channels=8, temb_dim=8, param_cap=1e3
        )
        x = jnp.ones((1, 8, 4, 4))
        temb = jnp.ones((1, 8))
        params = _corrupt_head(capped.init(jax.random.PRNGKey(0), x, temb))
        out = np.asarray(capped.apply(params, x, temb))
        assert np.isfinite(out).all(), out
        assert out.max() <= 1e3 + capped.epsilon + 1e-3

    def test_capped_trainer_survives_the_collapsed_head(self):
        """Same corrupted head, tpm_param_cap on: every update stays
        finite (no silent skip-death) and the alarm stays quiet."""
        import dataclasses

        trainer = _build_world(num_updates=6)
        cfg = dataclasses.replace(trainer.config, tpm_param_cap=1e3)
        from tpdm_tpu.train import RLOOTrainer, TPDMAgent

        agent = TPDMAgent(
            trainer.agent.mmdit, trainer.agent.mmdit_params, cfg
        )
        assert agent.tpm.param_cap == 1e3  # config threads into the head
        t2 = RLOOTrainer(cfg, agent, trainer.reward_fn, trainer.dataset)
        bad = _corrupt_head(agent.init_tpm_params(jax.random.PRNGKey(0)))
        t2.train(tpm_params=bad)
        hist = t2.metrics_history
        assert all(m["val/num_skipped"] == 0.0 for m in hist), hist[-1]
        assert all(np.isfinite(m["loss/policy_avg"]) for m in hist)
