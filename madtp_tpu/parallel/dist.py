"""Distributed runtime shims (reference L0, SURVEY.md §1).

Replaces ``utils.init_distributed_mode`` / the linklink shim / the autograd
all-gather functions (reference ``utils.py:210-276``,
``models/linklink/__init__.py``, ``models/blip_retrieval.py:334-380``) with
JAX-native equivalents:

* process bring-up: ``jax.distributed.initialize`` (ICI/DCN handled by the
  runtime — no NCCL bootstrap);
* grad-connected all-gather: ``lax.all_gather`` IS differentiable, so the
  reference's 33-line custom autograd Function reduces to one call;
* no-grad all-gather: the same + ``stop_gradient``.

The collective wrappers are for use inside ``shard_map``-style per-device
code; pjit/GSPMD code normally never calls them explicitly.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up; single-process no-op fallback mirrors the
    reference's non-distributed mode (reference utils.py:233-242)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def init_from_args(args) -> bool:
    """Driver bring-up from CLI flags or environment — the torchrun-parity
    entry point (reference ``utils.init_distributed_mode``, utils.py:254-276,
    reads RANK/WORLD_SIZE/MASTER_ADDR from the env the same way).

    CLI: ``--num_processes N --process_id R --coordinator HOST:PORT``;
    env fallback: ``MADTP_NUM_PROCESSES`` / ``MADTP_PROCESS_ID`` /
    ``MADTP_COORDINATOR``.  Returns True when a multi-process cluster was
    initialized.  Must run before the first device query."""
    n = int(getattr(args, "num_processes", 0) or
            os.environ.get("MADTP_NUM_PROCESSES", 0))
    if n <= 1:
        return False
    pid = getattr(args, "process_id", None)
    if pid is None or pid < 0:
        pid = int(os.environ.get("MADTP_PROCESS_ID", 0))
    coord = (getattr(args, "coordinator", "") or
             os.environ.get("MADTP_COORDINATOR", "127.0.0.1:29500"))
    init_distributed(coord, n, pid)
    print(f"distributed: process {pid}/{n} via {coord} "
          f"({jax.local_device_count()} local / {jax.device_count()} global "
          f"devices)")
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """Reference ``utils.is_main_process`` (utils.py:244-246) — gates result
    merging and checkpoint writes to rank 0."""
    return jax.process_index() == 0


def reference_row_shard(n: int, num: int | None = None,
                        rank: int | None = None) -> tuple[int, int]:
    """The reference's eval row-sharding arithmetic
    (compress_retrieval_dtp.py:160-164, computed independently per score
    direction): ``step = n // world + 1; start = rank*step;
    end = min(n, start+step)``.  Defaults to this process's rank/world;
    callers with explicit shard tuples pass them (tasks/retrieval)."""
    num = process_count() if num is None else num
    rank = process_index() if rank is None else rank
    step = n // num + 1
    start = rank * step
    return start, min(n, start + step)


def barrier(name: str = "madtp_barrier") -> None:
    """Cross-process sync point (reference ``dist.barrier()`` between the
    per-rank result writes and the rank-0 merge, data/utils.py:56)."""
    if process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def host_allgather(x) -> np.ndarray:
    """Gather a host array from every process: returns ``[P, *x.shape]``.
    The building block for the reference's eval-time reductions (score-matrix
    all_reduce compress_retrieval_dtp.py:202-205, SmoothedValue sync
    utils.py:48-59) — per-process partials are combined on host, which is
    where the reference's eval data lives too."""
    if process_count() <= 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def host_sum(x) -> np.ndarray:
    """Cross-process elementwise SUM of a host array (reference
    ``dist.all_reduce(SUM)``)."""
    return host_allgather(x).sum(axis=0)


def merge_scores(x) -> np.ndarray:
    """Cross-process merge of -100-initialized row-sharded score matrices:
    sentinel-aware select (each entry written by at most one process) —
    preserves written values bit-exactly where the reference's SUM
    (compress_retrieval_dtp.py:202-205) shifts them and a plain max would
    clamp scores below -100 (see tasks/retrieval.merge_score_matrices)."""
    from madtp_tpu.tasks.retrieval import merge_score_matrices

    return merge_score_matrices(*host_allgather(x))


def all_gather_with_grad(x, axis_name: str = "data"):
    """Differentiable cross-device gather along the batch
    (reference models/blip_retrieval.py:348-380 GatherLayer)."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def concat_all_gather(x, axis_name: str = "data"):
    """Gradient-stopped gather (reference models/blip_retrieval.py:334-345)."""
    return jax.lax.stop_gradient(
        jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    )


def psum_scalar(x, axis_name: str = "data"):
    """Metric reduction (reference utils.py:48-59 SmoothedValue sync)."""
    return jax.lax.psum(x, axis_name)
