"""Preemption-safe training (beyond reference — it has neither resume nor
signal handling; a preempted torchrun job loses everything since its last
best-checkpoint, reference utils.py / drivers).

TPU pods (and most managed clusters) deliver SIGTERM with a short grace
window before teardown.  :class:`PreemptionGuard` flips a flag on the first
signal; train loops poll :meth:`should_stop` at batch boundaries, break out,
and the driver saves its resume checkpoint (cli/common.save_resume) and
exits cleanly — ``--resume`` then restarts the interrupted epoch.

Multi-process safety: under the global mesh every process must leave the
step loop on the SAME batch (a lone early exit deadlocks the gradient
collectives), so the local flag is OR-reduced across processes with a host
allgather every ``sync_every`` batches and only the synced decision stops
the loop.  Loader shards are equal-length (data/loader.shard_indices pads),
so every rank polls the same number of times.
"""

from __future__ import annotations

import signal
import threading

import numpy as np


class PreemptionGuard:
    """Install with ``PreemptionGuard()``; poll ``should_stop()`` per batch.

    ``triggered`` is True once a stop has been *decided* (signal seen in
    single-process mode, or the OR-reduce came back positive) — drivers use
    it after the epoch loop to decide whether to checkpoint-and-exit.
    """

    def __init__(self, sync_every: int = 8,
                 signals=(signal.SIGTERM, signal.SIGUSR1)):
        self._flag = False
        self._decided = False
        self._calls = 0
        self.sync_every = max(1, sync_every)
        self._lock = threading.Lock()
        self._prev = {}
        if threading.current_thread() is threading.main_thread():
            for sig in signals:
                self._prev[sig] = signal.signal(sig, self._on_signal)

    def _on_signal(self, signum, frame):
        self._flag = True
        prev = self._prev.get(signum)
        if callable(prev):
            prev(signum, frame)

    # test hook / programmatic stop (e.g. a wall-clock budget)
    def request_stop(self):
        self._flag = True

    def should_stop(self) -> bool:
        """Batch-boundary poll.  Single-process: immediate.  Multi-process:
        every rank must call this at the same batch index; the flag is
        OR-reduced every ``sync_every`` calls and the SYNCED decision is
        what stops the loop (identical on all ranks)."""
        if self._decided:
            return True
        from madtp_tpu.parallel import dist

        if dist.process_count() <= 1:
            self._decided = self._flag
            return self._decided
        with self._lock:
            self._calls += 1
            if self._calls % self.sync_every:
                return False
        flags = dist.host_allgather(
            np.asarray([1 if self._flag else 0], np.int32))
        self._decided = bool(np.asarray(flags).any())
        return self._decided

    def sync_now(self) -> bool:
        """Epoch-boundary check: force the OR-reduce so a signal that
        landed after the last in-loop sync still stops before the next
        epoch.  All ranks must call (collective in multi-process mode)."""
        if self._decided:
            return True
        from madtp_tpu.parallel import dist

        if dist.process_count() <= 1:
            self._decided = self._flag
            return self._decided
        flags = dist.host_allgather(
            np.asarray([1 if self._flag else 0], np.int32))
        self._decided = bool(np.asarray(flags).any())
        return self._decided

    @property
    def triggered(self) -> bool:
        return self._decided
