"""Preemption-safe training: request_stop()/SIGTERM -> checkpoint + clean
exit after the current update, resumable.

Beyond-reference robustness: the reference's torchrun loop has no signal
handling — a TPU-pod preemption (SIGTERM with a grace period) would lose
everything since the last save_steps boundary (reference:
src/train/rloo_trainer.py:598-600 saves only on should_save).
"""

import dataclasses
import os
import signal

import jax

from tpdm_tpu.train.rloo import RLOOTrainer

from test_rloo import _toy_world


class _StopAt:
    """Callback that requests a graceful stop at a given update."""

    def __init__(self, update, how="request"):
        self.update = update
        self.how = how

    def on_step_end(self, trainer, update, metrics, tpm_params):
        if update == self.update:
            if self.how == "request":
                trainer.request_stop()
            else:  # real signal, delivered to our own process
                os.kill(os.getpid(), signal.SIGTERM)


class TestGracefulStop:
    def test_request_stop_checkpoints_and_resumes(self, tmp_path):
        config, agent, reward_fn, dataset = _toy_world()
        config = dataclasses.replace(config, output_dir=str(tmp_path))
        trainer = RLOOTrainer(
            config, agent, reward_fn, dataset, callbacks=[_StopAt(1)]
        )
        trainer.train()
        assert trainer.stopped_early
        assert trainer.global_step == 1
        # checkpoint written even though save_steps is not set: that is the
        # whole point of the preemption path
        assert (tmp_path / "checkpoint-1").is_dir()

        resumed = RLOOTrainer(config, agent, reward_fn, dataset)
        resumed.train(resume_from_checkpoint=True)
        assert not resumed.stopped_early
        # resumed from update 2 and ran to the horizon (3 toy updates)
        assert resumed.global_step == 3

    def test_sigterm_saves_and_restores_handler(self, tmp_path):
        prev = signal.getsignal(signal.SIGTERM)
        config, agent, reward_fn, dataset = _toy_world()
        config = dataclasses.replace(config, output_dir=str(tmp_path))
        trainer = RLOOTrainer(
            config, agent, reward_fn, dataset,
            callbacks=[_StopAt(1, how="signal")],
        )
        trainer.train()
        assert trainer.stopped_early
        assert (tmp_path / "checkpoint-1").is_dir()
        # train() must restore whatever handler was installed before it
        assert signal.getsignal(signal.SIGTERM) is prev

    def test_no_duplicate_save_when_boundary_coincides(self, tmp_path):
        # stop at an update that is ALSO a save_steps boundary: exactly one
        # checkpoint dir for it, loop exits early
        config, agent, reward_fn, dataset = _toy_world()
        config = dataclasses.replace(
            config, output_dir=str(tmp_path), save_steps=1
        )
        trainer = RLOOTrainer(
            config, agent, reward_fn, dataset, callbacks=[_StopAt(2)]
        )
        trainer.train()
        assert trainer.stopped_early
        dirs = sorted(p.name for p in tmp_path.iterdir() if p.is_dir())
        assert dirs == ["checkpoint-1", "checkpoint-2"]


class TestTimeBudgetCallback:
    def test_expired_budget_stops_after_first_update(self, tmp_path):
        from tpdm_tpu.train.callbacks import TimeBudgetCallback

        config, agent, reward_fn, dataset = _toy_world()
        config = dataclasses.replace(config, output_dir=str(tmp_path))
        cb = TimeBudgetCallback(budget_seconds=0.0, margin_seconds=0.0)
        trainer = RLOOTrainer(config, agent, reward_fn, dataset, callbacks=[cb])
        trainer.train()
        assert trainer.stopped_early
        assert trainer.global_step == 1
        assert (tmp_path / "checkpoint-1").is_dir()

    def test_generous_budget_never_fires(self):
        from tpdm_tpu.train.callbacks import TimeBudgetCallback

        config, agent, reward_fn, dataset = _toy_world()
        cb = TimeBudgetCallback(budget_seconds=3600.0)
        trainer = RLOOTrainer(config, agent, reward_fn, dataset, callbacks=[cb])
        trainer.train()
        assert not trainer.stopped_early
        assert trainer.global_step == 3
