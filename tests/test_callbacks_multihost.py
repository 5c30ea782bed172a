"""Multihost eval-callback wiring: rank split + gather to rank 0.

Parity target: the reference splits 10 eval prompts across ranks with
accelerate's `split_between_processes` and gathers images/rewards to rank 0
via NCCL `gather_object` (reference: src/train/callbacks.py:53,81-86). Here
the split/pad/gather logic gets unit tests, and a 2-process jax.distributed
(Gloo/CPU) integration test runs the real callback end to end.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

from tpdm_tpu.train.callbacks import shard_eval_batch


def _batch(n):
    return {
        "prompt": [f"p{i}" for i in range(n)],
        "prompt_embeds": np.arange(n, dtype=np.float32)[:, None] * np.ones((n, 4), np.float32),
    }


def test_shard_eval_batch_even():
    b, n_valid = shard_eval_batch(_batch(4), index=1, count=2)
    assert n_valid == 2
    assert b["prompt"] == ["p2", "p3"]
    np.testing.assert_array_equal(b["prompt_embeds"][:, 0], [2.0, 3.0])


def test_shard_eval_batch_padded_tail():
    b, n_valid = shard_eval_batch(_batch(3), index=1, count=2)
    assert n_valid == 1
    # the short tail pads by repeating row 0 so shapes match across ranks
    assert b["prompt"] == ["p2", "p0"]
    np.testing.assert_array_equal(b["prompt_embeds"][:, 0], [2.0, 0.0])


def test_shard_eval_batch_empty_rank():
    b, n_valid = shard_eval_batch(_batch(2), index=2, count=3)
    assert n_valid == 0
    assert b["prompt"] == ["p0"]  # pure padding, trimmed after gather


def _free_port(kind=socket.SOCK_STREAM) -> int:
    with socket.socket(socket.AF_INET, kind) as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_eval_callback(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_eval_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # workers use 1 local device each
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=480)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    with open(tmp_path / "summary.json") as f:
        summary = json.load(f)
    # 3 prompts split 2/1 across processes, gathered + trimmed back to 3
    assert summary["rows"] == 3
    assert summary["plot_exists"]
    # rank-encoded rewards prove rank 1's slice reached rank 0:
    # rows 0-1 scored by process 0 (reward 1), row 2 by process 1 (reward 2)
    assert summary["rewards"] == [1.0, 1.0, 2.0]


def test_two_process_mesh_trainer(tmp_path):
    """REAL multi-controller training: 2 processes x 2 local devices, one
    (data=2, fsdp=2) mesh spanning both, RLOOTrainer.train() for 2 updates
    with allgather'ed host rewards and a rank-0 checkpoint. Both processes
    must finish with identical replicated params (one SPMD program)."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_train_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=480)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    sums = []
    for i in range(2):
        with open(tmp_path / f"summary_{i}.json") as f:
            sums.append(json.load(f))
    assert sums[0]["updates"] == 2 and sums[1]["updates"] == 2
    assert sums[0]["digest"] == sums[1]["digest"]
    assert np.isfinite(sums[0]["loss"])
    assert sums[0]["ckpt_exists"]  # process 0 saved; process 1 skipped
    assert not sums[1]["ckpt_exists"] or sums[0]["ckpt_exists"]


def test_two_process_one_sided_preemption_stop(tmp_path):
    """One process gets the 'preemption' (request_stop at update 1); the
    trainer's cross-process agreement must stop BOTH processes at that same
    update with a checkpoint — not desync into hung collectives (the
    failure mode of per-process SIGTERM delivery on a preempted pod)."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_train_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["TPDM_STOP_AT"] = "1"
    env["TPDM_STOP_PID"] = "1"  # NOT the checkpoint-writing process
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=480)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    sums = []
    for i in range(2):
        with open(tmp_path / f"summary_{i}.json") as f:
            sums.append(json.load(f))
    # both stopped at update 1 (agreement), same replicated params
    assert sums[0]["updates"] == 1 and sums[1]["updates"] == 1
    assert sums[0]["stopped_early"] and sums[1]["stopped_early"]
    assert sums[0]["digest"] == sums[1]["digest"]
    # process 0 wrote the preemption checkpoint for update 1
    assert sums[0]["checkpoints"] == ["checkpoint-1"]


def test_two_process_peer_crash_watchdog_hard_exit(tmp_path):
    """End-to-end dead-peer handling: process 1 hard-dies after update 1
    (killed host); process 0 must TERMINATE promptly instead of hanging
    the reservation — either via the watchdog's exit-13 contract or via
    jax.distributed's own coordination-service abort, whichever wins the
    race (both are acceptable for a DEAD peer; the wedged-alive case
    below is the one only the watchdog catches)."""
    port = _free_port()
    wd_port = _free_port(socket.SOCK_DGRAM)
    worker = os.path.join(
        os.path.dirname(__file__), "_multihost_train_worker.py"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["TPDM_CRASH_AT"] = "1"
    env["TPDM_CRASH_PID"] = "1"
    env["TPDM_WATCHDOG_PORT"] = str(wd_port)
    env["TPDM_HARD_EXIT"] = "5"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    try:
        logs = [p.communicate(timeout=480)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert procs[1].returncode == 1, logs[1][-1500:]  # the injected crash
    # the survivor must NOT hang (communicate() above would have timed
    # out); the watchdog detected the dead peer even if jax's abort won
    assert procs[0].returncode != 0, logs[0][-1500:]
    assert procs[0].returncode == 13 or "watchdog" in logs[0] \
        or "Terminating process" in logs[0], logs[0][-1500:]


def test_two_process_wedged_peer_stall_detection(tmp_path):
    """The hang mode ONLY the watchdog catches: process 1 stays alive
    (OS heartbeats + jax coordination service satisfied) but stops
    participating after update 1; process 0 blocks inside update 2's
    collectives. The progress-stall detector must fire on process 0's
    server, relay the failure to every client, and hard-exit BOTH
    processes with code 13 so the launcher restarts from checkpoint."""
    port = _free_port()
    wd_port = _free_port(socket.SOCK_DGRAM)
    worker = os.path.join(
        os.path.dirname(__file__), "_multihost_train_worker.py"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["TPDM_WEDGE_AT"] = "1"
    env["TPDM_WEDGE_PID"] = "1"
    env["TPDM_WATCHDOG_PORT"] = str(wd_port)
    env["TPDM_STALL"] = "25"
    env["TPDM_HARD_EXIT"] = "2"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    try:
        logs = [p.communicate(timeout=480)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    # process 0 is blocked inside update 2's collectives: NOTHING but the
    # watchdog's hard exit can free it — this is the load-bearing assert
    assert procs[0].returncode == 13, logs[0][-1500:]
    assert "no progress anywhere" in logs[0], logs[0][-1500:]
    # the wedged process terminates promptly too, by whichever path wins
    # the race: the watchdog relay (13) or jax.distributed's fatal abort
    # once process 0 (the coordination-service host) is gone
    assert procs[1].returncode != 0, logs[1][-1500:]
    assert procs[1].returncode == 13 or "Terminating process" in logs[1], \
        logs[1][-1500:]
