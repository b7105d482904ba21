"""Bounded dispatch-ahead pipelining for host<->device loops.

A premature readback (np.asarray / float()) syncs the host to the device —
a full round trip each on a remote/tunneled backend — while an UNBOUNDED
dispatch queue keeps every in-flight batch's input and output buffers live
in HBM (an OOM at real corpus scale on a 16G chip).  ``pipelined`` walks
the middle: at most ``depth`` dispatches in flight, consuming the oldest
as new ones enqueue.
"""

from __future__ import annotations

import collections

# max in-flight dispatches: deep enough to hide the per-readback round trip
# of a remote/tunneled device, small enough that in-flight buffers stay
# bounded at real corpus scale
PIPELINE_DEPTH = 4


def pipelined(dispatches, consume, depth: int = PIPELINE_DEPTH):
    """Drive ``dispatches`` (an iterable whose items hold device arrays,
    produced by non-blocking jit calls) through ``consume`` (the host-side
    readback) with at most ``depth`` items in flight."""
    pending = collections.deque()
    for item in dispatches:
        pending.append(item)
        if len(pending) >= depth:
            consume(pending.popleft())
    while pending:
        consume(pending.popleft())
