"""Process-worker batched loader (the torch DataLoader-workers equivalent).

The threaded loader (``data/loader.batched_loader``) decodes images on a
ThreadPoolExecutor; PIL's C codecs release the GIL, so threads parallelize
plain decode well — but python-level transform work (RandAugment op
dispatch, numpy glue) serializes, and at training scale the reference uses
4 worker PROCESSES with prefetch_factor=4 (reference
``data/__init__.py:93-104``).  This module is that: fork-based worker
processes, a bounded task window, deterministic batch order, and a REUSED
ring of shared-memory slots for the big arrays.

Design notes:

* ``fork`` start method: the datasets hold transform closures (lambdas)
  that cannot pickle, and fork inherits them for free.  Workers never touch
  jax — they only run PIL/numpy — the same contract torch's fork-based
  DataLoader has with CUDA.
* Ordering: tasks carry sequence numbers; the consumer reorders, so batch
  order is identical to the threaded/sequential loaders for the same shard
  schedule (tested).
* Transport: each in-flight batch owns a SLOT; its big arrays live in
  named shared-memory segments created once and reused (a fresh mmap per
  batch costs ~90 ms in page faults for a 28 MB batch — reuse makes the
  hand-off two memcpys).  Small columns (labels, caption strings) ride the
  result queue via pickle.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue as queue_mod
from multiprocessing import shared_memory
from typing import Callable, Iterator

import numpy as np

from madtp_tpu.data.loader import default_collate, shard_indices

_SHM_MIN_BYTES = 1 << 16


class _SlotWriter:
    """Worker-side cache of slot segments (created on first use, reused;
    recreated bigger if a later batch outgrows one).  Segment names embed
    the WORKER pid, not just the slot: slots migrate between workers, and
    a name shared across workers would let worker A hold a stale mapping
    to a segment worker B unlinked and recreated larger — A would then
    write into the orphan while the consumer reads B's replacement."""

    def __init__(self, tag: str):
        self.tag = tag
        self.segs: dict = {}  # (slot, col) -> SharedMemory

    def write(self, slot: int, col: int, arr: np.ndarray) -> tuple:
        key = (slot, col)
        name = f"madtp{self.tag}_w{os.getpid()}_{slot}_{col}"
        seg = self.segs.get(key)
        if seg is not None and seg.size < arr.nbytes:
            seg.close()
            seg = None
            shared_memory.SharedMemory(name=name).unlink()
        if seg is None:
            size = max(int(arr.nbytes), 1)
            try:
                seg = shared_memory.SharedMemory(name=name, create=True,
                                                 size=size)
            except FileExistsError:
                seg = shared_memory.SharedMemory(name=name)
                if seg.size < arr.nbytes:
                    seg.close()
                    shared_memory.SharedMemory(name=name).unlink()
                    seg = shared_memory.SharedMemory(name=name, create=True,
                                                     size=size)
            # the CONSUMER owns unlinking; detach this worker's handle from
            # its resource tracker or it warns about the (already unlinked)
            # segment at exit
            try:
                from multiprocessing import resource_tracker

                resource_tracker.unregister(seg._name, "shared_memory")
            except Exception:
                pass
            self.segs[key] = seg
        np.ndarray(arr.shape, arr.dtype, buffer=seg.buf)[...] = arr
        return ("shm", name, arr.shape, arr.dtype.str)

    def close(self):
        for seg in self.segs.values():
            seg.close()


def _worker(dataset, collate, task_q, result_q, tag, worker_seed, epoch):
    # Reseed the GLOBAL rngs per worker: fork copies the parent's RNG state
    # into every worker, so without this all workers draw identical
    # augmentations and every epoch's fresh fork replays the same stream
    # (torch DataLoader reseeds workers for the same reason).  Transforms
    # built on PerSampleRng (the drivers') don't need it: the sample_ctx
    # below gives them a per-(seed, epoch, index) stream identical to the
    # threaded loader's.  Transforms that close over a plain PRIVATE
    # random.Random are forked copies and NOT reachable from here — those
    # replay per-fork; prefer PerSampleRng or module-level rngs.
    import random as _random

    from madtp_tpu.data.transforms import fetch_with_ctx

    _random.seed(worker_seed)
    np.random.seed(worker_seed % (2 ** 32))
    writer = _SlotWriter(tag)

    def fetch_item(i):
        return fetch_with_ctx(dataset, epoch, int(i))

    try:
        while True:
            item = task_q.get()
            if item is None:
                return
            seq, slot, idxs = item
            try:
                batch = collate([fetch_item(i) for i in idxs])
                out = []
                for ci, col in enumerate(batch):
                    if (isinstance(col, np.ndarray)
                            and col.nbytes >= _SHM_MIN_BYTES):
                        out.append(writer.write(slot, ci, col))
                    else:
                        out.append(("obj", col))
                result_q.put((seq, slot, tuple(out), None))
            except Exception as e:
                result_q.put((seq, slot, None, repr(e)))
    finally:
        writer.close()


class _SlotReader:
    """Consumer-side cache of slot attachments."""

    def __init__(self):
        self.segs: dict = {}  # name -> SharedMemory

    def read(self, item):
        if item[0] == "obj":
            return item[1]
        _, name, shape, dtype = item
        seg = self.segs.get(name)
        if seg is None or seg.size < np.dtype(dtype).itemsize * max(
                1, int(np.prod(shape))):
            if seg is not None:
                seg.close()
            seg = shared_memory.SharedMemory(name=name)
            self.segs[name] = seg
        return np.array(np.ndarray(shape, np.dtype(dtype), buffer=seg.buf))

    def close_and_unlink(self):
        for seg in self.segs.values():
            seg.close()
            try:
                seg.unlink()
            except FileNotFoundError:
                pass
        self.segs.clear()


def mp_batched_loader(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 42,
    epoch: int = 0,
    num_shards: int = 1,
    shard_id: int = 0,
    drop_last: bool = False,
    num_workers: int = 4,
    prefetch: int = 4,
    collate: Callable = default_collate,
    batch_range=None,
) -> Iterator:
    """Drop-in for ``batched_loader`` with PROCESS workers.  Yields collated
    batches in deterministic order; ``num_workers + prefetch`` batches are
    in flight, each owning a reused shared-memory slot.  ``batch_range``
    as in :func:`madtp_tpu.data.loader.batched_loader`."""
    idx = shard_indices(
        len(dataset), shuffle=shuffle, seed=seed, epoch=epoch,
        num_shards=num_shards, shard_id=shard_id, drop_last=drop_last,
    )
    batches = [idx[i: i + batch_size] for i in range(0, len(idx), batch_size)]
    if drop_last:
        batches = [b for b in batches if len(b) == batch_size]
    if batch_range is not None:
        batches = batches[batch_range[0] : batch_range[1]]
    if not batches:
        return
    if num_workers <= 0:
        from madtp_tpu.data.transforms import fetch_with_ctx

        for b in batches:
            yield collate([fetch_with_ctx(dataset, epoch, int(i))
                           for i in b])
        return

    ctx = mp.get_context("fork")
    task_q = ctx.Queue()
    result_q = ctx.Queue()
    tag = f"{os.getpid()}_{np.random.randint(1 << 30)}"
    procs = [
        ctx.Process(target=_worker,
                    args=(dataset, collate, task_q, result_q, tag,
                          # stable per-(seed, epoch, worker) mix — python's
                          # hash() is salted per process and would make
                          # augmentation streams non-reproducible
                          (seed * 1000003 + epoch * 9973 + w) & 0x7FFFFFFF,
                          epoch),
                    daemon=True)
        for w in range(num_workers)
    ]
    for p in procs:
        p.start()

    n_slots = num_workers + prefetch
    free_slots = list(range(n_slots))
    reader = _SlotReader()
    submitted = 0
    done: dict = {}  # seq -> (slot, packed)
    next_seq = 0
    try:
        while submitted < len(batches) and free_slots:
            task_q.put((submitted, free_slots.pop(), batches[submitted]))
            submitted += 1
        while next_seq < len(batches):
            while next_seq not in done:
                try:
                    seq, slot, packed, err = result_q.get(timeout=60.0)
                except queue_mod.Empty:
                    # liveness check: a worker killed mid-task (OOM,
                    # segfault in a codec) would otherwise hang the run
                    # forever on this get()
                    dead = [p.pid for p in procs if not p.is_alive()]
                    if dead:
                        raise RuntimeError(
                            f"loader worker(s) died: pids {dead}")
                    continue
                if err is not None:
                    raise RuntimeError(f"loader worker failed: {err}")
                done[seq] = (slot, packed)
            slot, packed = done.pop(next_seq)
            next_seq += 1
            batch = tuple(reader.read(item) for item in packed)
            # slot contents copied out -> safe to hand the slot back
            if submitted < len(batches):
                task_q.put((submitted, slot, batches[submitted]))
                submitted += 1
            else:
                free_slots.append(slot)
            yield batch
    finally:
        for _ in procs:
            try:
                task_q.put_nowait(None)
            except queue_mod.Full:
                pass
        # drain in-flight results, then tear down segments
        import time as _time

        deadline = _time.time() + 5.0
        pending = submitted - next_seq - len(done)
        while pending > 0 and _time.time() < deadline:
            try:
                result_q.get(timeout=0.5)
            except queue_mod.Empty:
                continue
            pending -= 1
        pids = [p.pid for p in procs]
        for p in procs:
            p.join(timeout=2.0)
            if p.is_alive():
                p.terminate()
        reader.close_and_unlink()
        # unlink any segments the reader never attached
        for pid in pids:
            for slot in range(n_slots):
                for col in range(16):
                    try:
                        shared_memory.SharedMemory(
                            name=f"madtp{tag}_w{pid}_{slot}_{col}").unlink()
                    except FileNotFoundError:
                        pass
