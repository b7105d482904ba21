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

import jax


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


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


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
