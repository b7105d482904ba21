"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data-parallel over NCCL
(reference ``compress_nlvr_dtp.py:148``, SURVEY.md §2.5).  The TPU rebuild is
SPMD over a named-axis ``jax.sharding.Mesh``:

* ``data`` — batch dimension (the DP replacement; gradients are reduced by
  XLA-inserted collectives over ICI instead of DDP hooks);
* ``model`` — optional tensor-parallel axis.  The reference's models fit on a
  single chip, but annotating the FFN/attention kernels over ``model`` keeps
  the door open (SURVEY.md §2.5 "leave room via a named-axis mesh") and is
  exercised by the multi-chip dry run.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def shard_batch(mesh: Mesh, tree):
    """Shard leading (batch) axis over 'data'."""
    s = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def batch_spec() -> P:
    return P("data")


def model_parallel_param_shardings(mesh: Mesh, params):
    """Tensor-parallel PartitionSpecs for a param tree: 2-D kernels whose
    output dim is the FFN expansion (fc1/c_fc/intermediate) shard the output
    over 'model'; their inverse projections shard the input; everything else
    replicates.  With GSPMD this is enough — XLA inserts the all-reduces."""

    def spec_for(path: str, x) -> P:
        nd = getattr(x, "ndim", 0)
        if nd < 2:
            return P()
        expand_out = any(k in path for k in ("fc1", "c_fc", "intermediate"))
        expand_in = any(k in path for k in ("fc2", "c_proj", ".output.dense",))
        if "kernel" in path and expand_out:
            return P(*([None] * (nd - 1)), "model")
        if "kernel" in path and expand_in:
            return P(*([None] * (nd - 2)), "model", None)
        return P()

    from madtp_tpu.core.tree import flatten_tree, unflatten_tree

    flat = flatten_tree(params)
    specs = {k: spec_for(k, v) for k, v in flat.items()}
    return unflatten_tree(
        {k: NamedSharding(mesh, s) for k, s in specs.items()}
    )
