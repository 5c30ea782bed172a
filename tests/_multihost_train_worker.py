"""Worker for the 2-process multi-controller TRAINING test.

Spawned by tests/test_callbacks_multihost.py as two real processes joined
with jax.distributed (Gloo on CPU), 2 virtual devices per process — a 4-way
(data=2, fsdp=2) mesh spanning process boundaries. Runs the REAL
RLOOTrainer.train() mesh-native for 2 updates: global batches built via
make_array_from_callback from identical host RNG, rewards computed on a
process_allgather'ed host view, checkpoint saved by process 0. The closest
offline analogue of the reference's torchrun launch
(reference: scripts/launch_sd3_train.sh:10).

Usage: python _multihost_train_worker.py <process_id> <port> <outdir>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=2"
    ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 local per process

    import numpy as np

    from tpdm_tpu.parallel.mesh import make_mesh
    from tpdm_tpu.train import RLOOConfig
    from tpdm_tpu.train.builders import (
        build_toy_agent,
        make_prompt_encoder,
    )
    from tpdm_tpu.train.rloo import RLOOTrainer

    mesh = make_mesh(jax.devices(), data=2, fsdp=2, tensor=1)
    cfg = RLOOConfig(
        per_device_train_batch_size=2,
        rloo_k=2,
        max_inference_steps=2,
        guidance_scale=7.0,
        learning_rate=1e-4,
        total_episodes=16,  # batch = 2*4 = 8 -> 2 updates
        save_steps=2,
        output_dir=os.path.join(outdir, "ckpt"),
    )
    agent = build_toy_agent(cfg).shard(mesh)
    dataset = [{"prompt": f"prompt {i}"} for i in range(8)]

    def reward_fn(prompts, outputs):
        # runs on the allgather'ed host view: final_latents must be plain
        # numpy-materializable on EVERY process
        lat = np.asarray(outputs.final_latents)
        s = np.tanh(lat.mean(axis=(1, 2, 3))).astype(np.float32)
        return s, s

    # optional one-sided preemption simulation: ONLY process TPDM_STOP_PID
    # requests a stop at update TPDM_STOP_AT; the trainer's cross-process
    # agreement (allgather) must make BOTH processes checkpoint and exit at
    # that same update instead of desyncing into hung collectives
    stop_at = int(os.environ.get("TPDM_STOP_AT", "0"))
    stop_pid = int(os.environ.get("TPDM_STOP_PID", "0"))

    class _OneSidedStop:
        def on_step_end(self, trainer, update, metrics, tpm_params):
            if update == stop_at and jax.process_index() == stop_pid:
                trainer.request_stop()

    # optional crash injection: TPDM_CRASH_PID hard-dies (os._exit(1),
    # simulating a killed host) right after TPDM_CRASH_AT — the OTHER
    # process then wedges in its next update's collectives, which is
    # exactly what the heartbeat watchdog must turn into exit 13
    crash_at = int(os.environ.get("TPDM_CRASH_AT", "0"))
    crash_pid = int(os.environ.get("TPDM_CRASH_PID", "0"))

    class _CrashInjection:
        def on_step_end(self, trainer, update, metrics, tpm_params):
            if update == crash_at and jax.process_index() == crash_pid:
                os._exit(1)

    # wedge injection: the process stays ALIVE (heartbeats + jax
    # coordination service happy) but stops participating — the hang mode
    # only progress-stall detection can catch
    wedge_at = int(os.environ.get("TPDM_WEDGE_AT", "0"))
    wedge_pid = int(os.environ.get("TPDM_WEDGE_PID", "0"))

    class _WedgeInjection:
        def on_step_end(self, trainer, update, metrics, tpm_params):
            if update == wedge_at and jax.process_index() == wedge_pid:
                import time as _time

                _time.sleep(3600)

    callbacks = []
    if stop_at:
        callbacks.append(_OneSidedStop())
    if crash_at:
        callbacks.append(_CrashInjection())
    if wedge_at:
        callbacks.append(_WedgeInjection())

    trainer = RLOOTrainer(
        cfg, agent, reward_fn, dataset,
        collate_fn=make_prompt_encoder(agent), mesh=mesh,
        callbacks=callbacks,
    )

    watchdog = None
    wd_port = os.environ.get("TPDM_WATCHDOG_PORT")
    if wd_port:
        from tpdm_tpu.parallel.watchdog import (
            HeartbeatWatchdog,
            attach_to_trainer,
        )

        stall = os.environ.get("TPDM_STALL")
        watchdog = HeartbeatWatchdog(
            f"127.0.0.1:{wd_port}", process_id=pid, num_processes=2,
            # generous liveness window: compile-heavy phases on a starved
            # CPU box can delay ping threads by seconds
            interval=float(os.environ.get("TPDM_WD_INTERVAL", "1.0")),
            timeout=float(os.environ.get("TPDM_WD_TIMEOUT", "10.0")),
            startup_grace=120.0,
            stall_timeout=float(stall) if stall else None,
        )
        attach_to_trainer(
            watchdog, trainer,
            hard_exit_after=float(os.environ.get("TPDM_HARD_EXIT", "5")),
        )
        watchdog.start()

    try:
        params, _ = trainer.train()
    finally:
        if watchdog is not None:
            watchdog.stop()
            timer = getattr(watchdog, "_hard_exit_timer", None)
            if timer is not None:
                timer.cancel()

    m = trainer.metrics_history[-1]
    assert all(
        np.isfinite(v) for v in m.values() if isinstance(v, float)
    ), m
    # every process writes a digest of its (replicated) final params; the
    # test asserts both digests agree -> one SPMD program, no divergence
    leaves = [np.asarray(x) for x in jax.tree.leaves(params)]
    digest = float(sum(np.abs(l).sum() for l in leaves))
    with open(os.path.join(outdir, f"summary_{pid}.json"), "w") as f:
        json.dump(
            {
                "digest": digest,
                "updates": len(trainer.metrics_history),
                "loss": m["loss/policy_avg"],
                "steps_avg": m["policy/steps_avg"],
                "stopped_early": trainer.stopped_early,
                "ckpt_exists": os.path.isdir(
                    os.path.join(outdir, "ckpt", "checkpoint-2")
                ),
                "checkpoints": sorted(
                    d for d in os.listdir(os.path.join(outdir, "ckpt"))
                    if d.startswith("checkpoint-")
                ) if os.path.isdir(os.path.join(outdir, "ckpt")) else [],
            },
            f,
        )


if __name__ == "__main__":
    main()
