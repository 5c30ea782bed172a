"""Out-of-band failure detection (parallel/watchdog.py).

The reference has NO failure detection (SURVEY §5): a dead torchrun rank
leaves the survivors hung in NCCL. The watchdog is the TPU answer:
detect out-of-band, stop gracefully, hard-exit if wedged so the launcher
restarts from checkpoint. These tests run the real UDP server/client
machinery on localhost with sub-second timeouts — no JAX involved.
"""

import os
import signal
import socket
import subprocess
import sys
import time

import pytest

from tpdm_tpu.parallel.watchdog import HeartbeatWatchdog, attach_to_trainer


def _free_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _wd(pid, port, n=2, **kw):
    args = dict(interval=0.1, timeout=0.6, startup_grace=2.0)
    args.update(kw)
    return HeartbeatWatchdog(
        f"127.0.0.1:{port}", process_id=pid, num_processes=n, **args
    )


def _wait_for(pred, timeout_s, what):
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if pred():
            return
        time.sleep(0.05)
    raise AssertionError(f"timed out waiting for {what}")


class TestHealthy:
    def test_no_fire_while_all_alive(self):
        port = _free_port()
        wd0 = _wd(0, port).start()
        wd1 = _wd(1, port).start()
        try:
            time.sleep(1.0)  # >> timeout: plenty of chances to misfire
            assert not wd0.fired and not wd1.fired
        finally:
            wd0.stop()
            wd1.stop()

    def test_timeout_must_exceed_interval(self):
        with pytest.raises(ValueError, match="exceed"):
            HeartbeatWatchdog(
                "127.0.0.1:1", 0, 1, interval=1.0, timeout=0.5
            )


class TestDetection:
    def test_server_detects_dead_peer(self):
        port = _free_port()
        fired = []
        wd0 = _wd(0, port, on_failure=fired.append).start()
        wd1 = _wd(1, port).start()
        try:
            time.sleep(0.4)  # let peer 1 register
            wd1.stop()  # "dies": stops pinging
            _wait_for(lambda: wd0.fired, 3.0, "peer-death detection")
            assert "[1]" in wd0.failure_reason
            assert fired == [wd0.failure_reason]  # fires exactly once
        finally:
            wd0.stop()

    def test_client_detects_dead_coordinator(self):
        port = _free_port()  # nothing ever listens here
        wd1 = _wd(1, port, startup_grace=0.5).start()
        try:
            _wait_for(lambda: wd1.fired, 3.0, "coordinator-death detection")
            assert "coordinator" in wd1.failure_reason
        finally:
            wd1.stop()

    def test_server_flags_noshow_after_startup_grace(self):
        port = _free_port()
        wd0 = _wd(0, port, startup_grace=0.5).start()
        try:
            _wait_for(lambda: wd0.fired, 3.0, "no-show detection")
            assert "never sent" in wd0.failure_reason
            assert "[1]" in wd0.failure_reason
        finally:
            wd0.stop()


class TestTrainerWiring:
    def test_graceful_stop_then_armed_hard_exit(self):
        class FakeTrainer:
            stopped = False

            def request_stop(self):
                self.stopped = True

        port = _free_port()
        trainer = FakeTrainer()
        wd = _wd(0, port, n=1)
        attach_to_trainer(wd, trainer, hard_exit_after=3600.0)
        wd._fire("synthetic failure")
        try:
            assert trainer.stopped  # cooperative path requested
            timer = wd._hard_exit_timer  # escalation armed...
            assert timer is not None
        finally:
            timer.cancel()  # ...and cancellable on clean exit


class TestStallDetection:
    """Progress-stall detection: the hang mode liveness can't see (every
    process alive and pinging, nobody advancing)."""

    def _pair(self, port, prog0, prog1, stall=0.5):
        kw = dict(timeout=5.0, stall_timeout=stall)  # liveness can't fire
        wd0 = _wd(0, port, progress_fn=prog0, **kw).start()
        wd1 = _wd(1, port, progress_fn=prog1, **kw).start()
        return wd0, wd1

    def test_fires_after_armed_freeze_and_relays_to_peers(self):
        port = _free_port()
        step = [0]
        wd0, wd1 = self._pair(port, lambda: step[0], lambda: step[0])
        try:
            time.sleep(0.3)  # both registered at progress 0
            step[0] = 1  # one real increase arms the detector...
            _wait_for(lambda: wd0.fired, 3.0, "stall detection")
            assert "no progress anywhere" in wd0.failure_reason
            assert "step 1" in wd0.failure_reason
            # ...and the server relays the reason so the PEER fires too
            # (in a real wedge the peer can only be saved by its own
            # hard-exit timer)
            _wait_for(lambda: wd1.fired, 3.0, "failure relay to peer")
            assert "no progress anywhere" in wd1.failure_reason
        finally:
            wd0.stop()
            wd1.stop()

    def test_unarmed_startup_freeze_does_not_fire(self):
        # progress never increases past the baseline: an unbounded first
        # compile must not false-fire
        port = _free_port()
        wd0, wd1 = self._pair(port, lambda: 0, lambda: 0)
        try:
            time.sleep(1.5)  # 3x the stall window
            assert not wd0.fired and not wd1.fired
        finally:
            wd0.stop()
            wd1.stop()

    def test_advancing_progress_never_fires(self):
        port = _free_port()
        t0 = time.monotonic()
        prog = lambda: int((time.monotonic() - t0) / 0.2)
        wd0, wd1 = self._pair(port, prog, prog)
        try:
            time.sleep(1.5)
            assert not wd0.fired and not wd1.fired
        finally:
            wd0.stop()
            wd1.stop()

    def test_resume_jump_does_not_arm(self):
        """attach_to_trainer must wire progress to updates_this_run, NOT
        global_step: a checkpoint restore jumps global_step by N in one
        tick, which would arm the detector BEFORE the cold first-update
        compile and hard-exit a healthy resume into a restart loop."""
        class ResumedTrainer:
            global_step = 120  # restored from checkpoint-120
            updates_this_run = 0  # nothing computed this process lifetime

            def request_stop(self):
                pass

        port = _free_port()
        wd0 = _wd(0, port, timeout=5.0, stall_timeout=0.5)
        attach_to_trainer(wd0, ResumedTrainer(), hard_exit_after=3600.0)
        assert wd0.progress_fn() == 0  # the restore jump is invisible
        wd1 = _wd(1, port, timeout=5.0, stall_timeout=0.5,
                  progress_fn=lambda: 0)
        wd0.start()
        wd1.start()
        try:
            time.sleep(1.5)  # 3x the stall window during the "compile"
            assert not wd0.fired and not wd1.fired
        finally:
            wd0.stop()
            wd1.stop()
            timer = getattr(wd0, "_hard_exit_timer", None)
            if timer is not None:  # pragma: no cover - only if misfired
                timer.cancel()

    def test_disabled_by_default(self):
        port = _free_port()
        step = [0]
        wd0 = _wd(0, port, timeout=5.0, progress_fn=lambda: step[0]).start()
        wd1 = _wd(1, port, timeout=5.0, progress_fn=lambda: step[0]).start()
        try:
            time.sleep(0.3)
            step[0] = 1  # would arm, but stall_timeout=None
            time.sleep(1.0)
            assert not wd0.fired and not wd1.fired
        finally:
            wd0.stop()
            wd1.stop()


WORKER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from tpdm_tpu.parallel.watchdog import HeartbeatWatchdog

pid, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
# os._exit: the handler runs on a watchdog thread, where sys.exit would
# only end the thread — same reason attach_to_trainer's hard path uses it
wd = HeartbeatWatchdog(
    "127.0.0.1:" + str(port), process_id=pid, num_processes=2,
    interval=0.1, timeout=0.8, startup_grace=5.0,
    on_failure=lambda reason: (
        open(out, "w").write(reason), os._exit(13)
    ),
)
wd.start()
print("started", flush=True)
time.sleep(60)
"""


class TestTwoProcessIntegration:
    def test_sigkilled_peer_is_detected_across_processes(self, tmp_path):
        """Two real OS processes; rank 1 is SIGKILLed mid-run; rank 0's
        watchdog writes the failure reason and exits 13 (the launcher-
        restart contract of attach_to_trainer's hard path)."""
        port = _free_port()
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = WORKER.format(repo=repo)
        out0 = tmp_path / "reason0.txt"
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", script, str(i), str(port),
                 str(tmp_path / f"reason{i}.txt")],
                stdout=subprocess.PIPE, text=True,
            )
            for i in (0, 1)
        ]
        try:
            for p in procs:
                assert p.stdout.readline().strip() == "started"
            time.sleep(0.5)  # both registered with the server
            procs[1].send_signal(signal.SIGKILL)
            assert procs[0].wait(timeout=10) == 13
            reason = out0.read_text()
            assert "[1]" in reason and "missed heartbeats" in reason
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                p.wait()
                p.stdout.close()
