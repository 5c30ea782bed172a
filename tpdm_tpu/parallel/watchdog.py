"""Peer-liveness failure detection for multi-controller runs.

JAX collectives have no timeout: when one process of a multi-controller
job dies or wedges, every surviving process blocks forever inside its
next psum/allgather, silently burning the whole reservation. The
reference has the same blind spot — torchrun `--standalone` with default
NCCL timeouts is a 30-minute hang, and recovery is "notice the stuck job
yourself" (SURVEY §5: no failure detection anywhere). Production TPU
training needs the detection to live OUTSIDE the collective path.

`HeartbeatWatchdog` is that out-of-band path: process 0 hosts a tiny UDP
heartbeat server on its own thread; every process (including 0) pings it
every `interval` seconds and the server acks. Detection is two-sided:

- process 0 flags any registered peer whose last ping is older than
  `timeout` (and, after `startup_grace`, peers that never arrived);
- every process flags a dead coordinator after `timeout` without an ack.

On detection the watchdog invokes `on_failure(reason)` once. The intended
wiring (see `attach_to_trainer`) is graceful-then-hard: request the
trainer's cooperative stop (checkpoint + drain, train/rloo.py
request_stop) and, if the process is still alive `hard_exit_after`
seconds later — i.e. it was already wedged inside a collective the
cooperative stop can never reach — `os._exit` so the launcher restarts
the job from the checkpoint instead of leaving a zombie reservation.

UDP is deliberate: heartbeats are idempotent and loss-tolerant (timeout
>> interval absorbs drops), there is no connection state to leak when
peers die, and one socket serves any process count.
"""

from __future__ import annotations

import logging
import os
import socket
import threading
import time
from typing import Callable, Optional

logger = logging.getLogger(__name__)

_ACK = b"ok"


class HeartbeatWatchdog:
    """Out-of-band liveness monitor for one process of a distributed job.

    Args:
        coordinator: "host:port" of the heartbeat server (NOT the
            jax.distributed coordinator port — pick a free one; every
            process must pass the same value).
        process_id / num_processes: this process's rank and the world
            size (jax.process_index()/process_count() in real runs).
        interval: seconds between pings.
        timeout: staleness threshold; must be comfortably > interval.
        startup_grace: how long process 0 waits for first contact from
            every peer before flagging no-shows.
        on_failure: called ONCE with a human-readable reason string from
            a watchdog thread. Default logs critical only.
        progress_fn: optional () -> int returning this process's progress
            counter (e.g. trainer.global_step). Pings carry it so the
            server can detect a WEDGED job — the failure liveness can't
            see: every process alive (heartbeats flowing, so
            jax.distributed's coordination service is happy too) but no
            one advancing because a peer hangs inside a collective.
        stall_timeout: fire when the MAX progress across peers hasn't
            advanced for this many seconds. Armed only after the first
            observed progress INCREASE, so unbounded startup compiles
            can't false-fire (the tradeoff: a wedge during the very first
            update is caught by nothing but the operator). None disables
            stall detection. SPMD training is lockstep — one wedged peer
            stalls everyone within an update — so global-progress stall
            is exactly "the job is hung". Size it to several updates'
            wall time.
    """

    def __init__(
        self,
        coordinator: str,
        process_id: int,
        num_processes: int,
        interval: float = 2.0,
        timeout: float = 10.0,
        startup_grace: float = 60.0,
        on_failure: Optional[Callable[[str], None]] = None,
        progress_fn: Optional[Callable[[], int]] = None,
        stall_timeout: Optional[float] = None,
    ):
        if timeout <= interval:
            raise ValueError("timeout must exceed the ping interval")
        host, port = coordinator.rsplit(":", 1)
        self._addr = (host, int(port))
        self.process_id = process_id
        self.num_processes = num_processes
        self.interval = interval
        self.timeout = timeout
        self.startup_grace = startup_grace
        self._on_failure = on_failure
        self.progress_fn = progress_fn
        self.stall_timeout = stall_timeout
        self._stop = threading.Event()
        self._fired = threading.Event()
        self._threads: list[threading.Thread] = []
        self._server_sock: Optional[socket.socket] = None
        self.failure_reason: Optional[str] = None

    # -- lifecycle --------------------------------------------------------

    def start(self) -> "HeartbeatWatchdog":
        if self.process_id == 0:
            self._server_sock = socket.socket(
                socket.AF_INET, socket.SOCK_DGRAM
            )
            # bind on all interfaces: peers may reach process 0 over DCN
            self._server_sock.bind(("", self._addr[1]))
            self._server_sock.settimeout(self.interval)
            t = threading.Thread(
                target=self._server_loop, name="hb-server", daemon=True
            )
            t.start()
            self._threads.append(t)
        t = threading.Thread(
            target=self._client_loop, name="hb-client", daemon=True
        )
        t.start()
        self._threads.append(t)
        return self

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2 * self.interval + 1)
        if self._server_sock is not None:
            self._server_sock.close()
            self._server_sock = None

    @property
    def fired(self) -> bool:
        return self._fired.is_set()

    def _fire(self, reason: str) -> None:
        if self._fired.is_set():
            return
        self._fired.set()
        self.failure_reason = reason
        logger.critical("watchdog: %s", reason)
        if self._on_failure is not None:
            try:
                self._on_failure(reason)
            except Exception:
                logger.exception("watchdog on_failure handler raised")

    # -- process-0 server ---------------------------------------------------

    def _server_loop(self) -> None:
        last_seen: dict[int, float] = {}
        reports: dict[int, int] = {}  # pings seen per peer
        max_progress = None  # first report sets the baseline
        armed = False  # stall detection arms on the first INCREASE
        progress_changed_at = time.monotonic()
        t0 = time.monotonic()
        while not self._stop.is_set():
            try:
                data, addr = self._server_sock.recvfrom(64)
                try:
                    pid_s, _, prog_s = data.partition(b":")
                    pid = int(pid_s)
                    progress = int(prog_s) if prog_s else 0
                except ValueError:
                    continue
                last_seen[pid] = time.monotonic()
                reports[pid] = reports.get(pid, 0) + 1
                if max_progress is None:
                    max_progress = progress
                elif progress > max_progress:
                    max_progress = progress
                    progress_changed_at = last_seen[pid]
                    armed = True
                # after a failure, keep answering with the reason so every
                # peer's client learns and runs ITS on_failure too (the
                # wedged ones can only be saved by their own hard-exit)
                self._server_sock.sendto(
                    _ACK if not self._fired.is_set()
                    else b"fail:" + self.failure_reason.encode()[:300],
                    addr,
                )
            except socket.timeout:
                pass
            except OSError:
                return  # socket closed by stop()
            if self._fired.is_set():
                continue  # already failed: only relay the reason
            now = time.monotonic()
            if (
                self.stall_timeout is not None
                and armed
                and len(reports) == self.num_processes
                and now - progress_changed_at > self.stall_timeout
            ):
                self._fire(
                    f"no progress anywhere for >{self.stall_timeout:.0f}s "
                    f"(stuck at step {max_progress}; every process alive "
                    "and pinging) — a peer is wedged inside a collective"
                )
                continue
            stale = [
                p for p, ts in last_seen.items() if now - ts > self.timeout
            ]
            if stale:
                self._fire(
                    f"process(es) {sorted(stale)} missed heartbeats for "
                    f">{self.timeout:.0f}s (last ping "
                    f"{now - max(last_seen[p] for p in stale):.0f}s ago); "
                    "surviving processes will wedge in their next "
                    "collective"
                )
                continue  # keep relaying the reason to surviving clients
            if (
                now - t0 > self.startup_grace
                and len(last_seen) < self.num_processes
            ):
                missing = sorted(
                    set(range(self.num_processes)) - set(last_seen)
                )
                self._fire(
                    f"process(es) {missing} never sent a heartbeat within "
                    f"the {self.startup_grace:.0f}s startup grace"
                )
                continue

    # -- every-process client --------------------------------------------

    def _client_loop(self) -> None:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.settimeout(self.interval)
        last_ok = time.monotonic()
        acked = False  # before first contact, allow the startup grace:
        # peers may come up long before process 0 binds its server
        try:
            while not self._stop.is_set():
                progress = 0
                if self.progress_fn is not None:
                    try:
                        progress = int(self.progress_fn())
                    except Exception:  # never let a racy read kill pings
                        pass
                payload = f"{self.process_id}:{progress}".encode()
                try:
                    sock.sendto(payload, self._addr)
                    data, _ = sock.recvfrom(512)
                    if data == _ACK:
                        last_ok = time.monotonic()
                        acked = True
                    elif data.startswith(b"fail:"):
                        self._fire(data[5:].decode(errors="replace"))
                        return
                except (socket.timeout, OSError):
                    pass
                allowed = (
                    self.timeout if acked
                    else max(self.timeout, self.startup_grace)
                )
                if time.monotonic() - last_ok > allowed:
                    self._fire(
                        f"coordinator {self._addr[0]}:{self._addr[1]} "
                        f"unreachable for >{self.timeout:.0f}s (process "
                        f"{self.process_id}); assuming the job is dead"
                    )
                    return
                self._stop.wait(self.interval)
        finally:
            sock.close()


def attach_to_trainer(
    watchdog: HeartbeatWatchdog,
    trainer,
    hard_exit_after: float = 300.0,
    exit_code: int = 13,
) -> HeartbeatWatchdog:
    """Wire a watchdog to a trainer: graceful stop, then hard exit.

    On failure: (1) `trainer.request_stop()` — if this process is between
    updates, it checkpoints and exits cleanly (train/rloo.py); (2) a timer
    thread `os._exit(exit_code)`s after `hard_exit_after` seconds in case
    the process is wedged inside a collective that the cooperative flag
    can never reach. The launcher then restarts from the checkpoint —
    detection-and-restart, the TPU answer to the reference's absent
    failure handling (SURVEY §5).
    """

    if watchdog.progress_fn is None:
        # pings carry the update counter so the server's stall detector
        # sees real training progress. Prefer updates_this_run: a
        # checkpoint restore jumps global_step by N in one tick, which
        # would arm the stall detector BEFORE the cold first-update
        # compile and false-fire into a restart loop; updates_this_run
        # starts at 0 every process lifetime and only counts real updates
        def _progress() -> int:
            p = getattr(trainer, "updates_this_run", None)
            return int(p if p is not None else getattr(trainer, "global_step", 0))

        watchdog.progress_fn = _progress

    def on_failure(reason: str) -> None:
        logger.critical(
            "watchdog failure (%s): requesting graceful stop; hard exit "
            "in %.0fs if wedged", reason, hard_exit_after,
        )
        trainer.request_stop()

        def _hard_exit():
            logger.critical(
                "watchdog: still alive %.0fs after failure — wedged in a "
                "collective; hard-exiting %d for the launcher to restart",
                hard_exit_after, exit_code,
            )
            os._exit(exit_code)

        t = threading.Timer(hard_exit_after, _hard_exit)
        t.daemon = True
        t.start()
        # keep a handle so tests (and a clean trainer exit) can cancel
        watchdog._hard_exit_timer = t

    watchdog._on_failure = on_failure
    return watchdog
