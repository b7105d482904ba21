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


def data_mesh(enable: bool = True) -> Optional[Mesh]:
    """Default driver-level data-parallel mesh: 1-D 'data' axis over this
    process's LOCAL devices, or ``None`` when single-device / disabled.

    The reference runs every task driver 8-way DDP by default
    (``compress_nlvr_dtp.py:148``, ``utils.py:254-276``); this is the GSPMD
    equivalent every ``cli/compress_*`` driver builds at startup.  Local
    devices only: under multi-process execution each process computes its own
    data shard independently (the reference's per-rank model replica) and
    syncs at the torchrun-parity points — train-step gradients ride the
    GLOBAL mesh (:func:`global_data_mesh`), eval results merge on host
    (parallel/dist.host_sum / merge_scores / save_result)."""
    if not enable:
        return None
    devices = jax.local_devices()
    if len(devices) < 2:
        return None
    return Mesh(np.array(devices), ("data",))


def global_data_mesh(enable: bool = True) -> Optional[Mesh]:
    """Data-parallel mesh over ALL devices of ALL processes — the DDP
    gradient-sync replacement for multi-process training: jit over this mesh
    and XLA inserts the cross-process psum for gradients (the reference's
    DDP allreduce boundary, compress_nlvr_dtp.py:49-59).  Feed batches with
    :func:`shard_batch_padded`, which converts per-process host shards to a
    global array.  Single-process: identical to :func:`data_mesh`."""
    if not enable:
        return None
    devices = jax.devices()
    if len(devices) < 2:
        return None
    return Mesh(np.array(devices), ("data",))


def mesh_spans_processes(mesh: Optional[Mesh]) -> bool:
    return mesh is not None and any(
        d.process_index != jax.process_index() for d in mesh.devices.flat)


def shard_batch_padded(mesh: Optional[Mesh], *arrays):
    """Place ``arrays`` batch-sharded over 'data', padding the leading dim to
    a multiple of the axis size by REPEATING the final row.  Returns
    ``(*placed_arrays, n_valid)`` — callers slice outputs back to ``n_valid``.

    Repeating an existing row is exactly neutral for DTP's batch-coupled
    keep counts (``topk_num = max_b counts[b]``, prune/dtp.py:171): a
    duplicate contributes an already-present count, so the max — and hence
    every original row's pruning decision — is unchanged.  Sharded eval is
    therefore bit-identical to the unsharded run (tests/test_spmd.py).

    ``mesh=None``: plain ``jnp.asarray`` passthrough (single-device).

    Process-spanning mesh (:func:`global_data_mesh` under multi-process):
    ``arrays`` are this process's LOCAL batch shard (from
    ``data/loader.shard_indices(num_shards=process_count())``); they are
    padded to a multiple of the local device count and assembled into a
    global array whose per-process slices are the local data — the JAX
    equivalent of DistributedSampler + DDP feeding.  ``n_valid`` is then the
    LOCAL valid count."""
    import jax.numpy as jnp

    n = int(arrays[0].shape[0])
    if mesh is None:
        return (*(jnp.asarray(a) for a in arrays), n)
    spans = mesh_spans_processes(mesh)
    d = (mesh.local_mesh.shape["data"] if spans else mesh.shape["data"])
    pad = (-n) % d
    s = NamedSharding(mesh, P("data"))
    placed = []
    for a in arrays:
        a = np.asarray(a)
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
        if spans:
            placed.append(jax.make_array_from_process_local_data(s, a))
        else:
            placed.append(jax.device_put(a, s))
    return (*placed, n)


def shard_batch(mesh: Mesh, tree):
    """Shard leading (batch) axis over 'data'."""
    s = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = NamedSharding(mesh, P())
    if mesh_spans_processes(mesh):
        # every process holds the same full value (params/opt state); build
        # the fully-replicated global array from the local copy
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def batch_spec() -> P:
    return P("data")


def model_parallel_param_shardings(mesh: Mesh, params):
    """Tensor-parallel PartitionSpecs for a param tree:

    * FFN expansion kernels (fc1/c_fc/intermediate) shard the OUTPUT dim
      over 'model'; their inverse projections (fc2/c_proj/output.dense)
      shard the INPUT dim — Megatron-style column-then-row split.
    * MED/BERT attention q/k/v kernels shard the output dim too: the
      ``[.., D] -> [.., H, Dh]`` head reshape is head-major, so contiguous
      model-axis chunks of D are whole heads — head-parallel attention,
      with the attention output dense (``attention.output.dense``, matched
      by the expand_in pattern) closing the split.  The ViT tower's FUSED
      ``qkv`` kernel (and CLIP's ``in_proj``) stays replicated on purpose:
      its output is the ``[q|k|v]`` concat, so contiguous model chunks
      would straddle the three blocks (and the vision hot path is the
      per-device Pallas scoring kernel, which rides the 'data' axis).

    With GSPMD these specs are enough — XLA inserts the all-reduces
    (tests/test_spmd.py: TP == replicated for both towers)."""

    def spec_for(path: str, x) -> P:
        nd = getattr(x, "ndim", 0)
        if nd < 2:
            return P()
        expand_out = any(k in path for k in ("fc1", "c_fc", "intermediate"))
        head_out = any(k in path for k in
                       ("query.kernel", "key.kernel", "value.kernel"))
        expand_in = any(k in path for k in ("fc2", "c_proj", ".output.dense",))
        if "kernel" in path and (expand_out or head_out):
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
