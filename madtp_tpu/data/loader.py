"""Batched loader with process sharding and threaded prefetch.

Replaces the reference's DataLoader + DistributedSampler stack
(reference ``data/__init__.py:75-104``): each JAX process reads its own
contiguous shard (the ``DistributedSampler`` analogue), worker threads decode
images ahead of the accelerator, and the final partial batch can be padded to
keep shapes static (XLA-friendly — the reference just ran a ragged last
batch)."""

from __future__ import annotations

import threading
import queue as queue_mod
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator

import numpy as np


def shard_indices(n: int, *, shuffle: bool, seed: int, epoch: int,
                  num_shards: int = 1, shard_id: int = 0,
                  drop_last: bool = False) -> np.ndarray:
    """DistributedSampler-equivalent index schedule: optional epoch-seeded
    shuffle, padded to a multiple of num_shards, strided assignment."""
    idx = np.arange(n)
    if shuffle:
        rng = np.random.RandomState(seed + epoch)
        rng.shuffle(idx)
    if drop_last:
        idx = idx[: (n // num_shards) * num_shards]
    else:
        pad = (-len(idx)) % num_shards
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
    return idx[shard_id::num_shards]


def num_batches(n: int, batch_size: int, *, num_shards: int = 1,
                drop_last: bool = False) -> int:
    """Per-shard batch count of :func:`batched_loader`'s schedule — the
    TPU-side ``len(data_loader)`` (used e.g. for the reference's epoch-0
    alpha warmup denominator, ``compress_retrieval_dtp.py:53``)."""
    if drop_last:
        return (n // num_shards) // batch_size
    per_shard = -(-n // num_shards)
    return -(-per_shard // batch_size)


def default_collate(batch):
    first = batch[0]
    out = []
    for i in range(len(first)):
        col = [b[i] for b in batch]
        if isinstance(col[0], np.ndarray):
            out.append(np.stack(col))
        elif isinstance(col[0], (int, np.integer)):
            out.append(np.asarray(col))
        elif isinstance(col[0], float):
            out.append(np.asarray(col, np.float32))
        else:
            out.append(col)
    return tuple(out)


def batched_loader(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 42,
    epoch: int = 0,
    num_shards: int = 1,
    shard_id: int = 0,
    drop_last: bool = False,
    num_workers: int = 8,
    collate: Callable = default_collate,
    prefetch: int = 4,
    batch_range=None,
) -> Iterator:
    """Yields collated batches; image decode runs on a thread pool with
    ``prefetch`` batches in flight.

    ``batch_range=(lo, hi)`` restricts to that slice of the BATCH schedule
    without decoding the skipped batches (multi-process corpus encode:
    each process pulls only its contiguous block — an ``islice`` over the
    full loader would decode everything before ``lo``).  Batch membership
    is identical to the unrestricted schedule.

    ``MADTP_MP_LOADER=1`` delegates to the PROCESS-worker loader
    (:mod:`madtp_tpu.data.mp_loader`) — same schedule, same batch order
    (tested).  PIL's codecs release the GIL, so threads parallelize plain
    decode; processes win when python-level transform work dominates AND
    cores are available (this build env has one core, so the threaded
    loader stays the default — see COVERAGE.md)."""
    import os

    if os.environ.get("MADTP_MP_LOADER") and num_workers > 0:
        from madtp_tpu.data.mp_loader import mp_batched_loader

        yield from mp_batched_loader(
            dataset, batch_size, shuffle=shuffle, seed=seed, epoch=epoch,
            num_shards=num_shards, shard_id=shard_id, drop_last=drop_last,
            num_workers=min(num_workers, os.cpu_count() or 1),
            prefetch=prefetch, collate=collate, batch_range=batch_range)
        return
    idx = shard_indices(
        len(dataset), shuffle=shuffle, seed=seed, epoch=epoch,
        num_shards=num_shards, shard_id=shard_id, drop_last=drop_last,
    )
    batches = [idx[i : i + batch_size] for i in range(0, len(idx), batch_size)]
    if drop_last:
        batches = [b for b in batches if len(b) == batch_size]
    if batch_range is not None:
        batches = batches[batch_range[0] : batch_range[1]]
    if not batches:
        return

    from madtp_tpu.data.transforms import fetch_with_ctx

    def fetch_item(i):
        # per-sample augmentation ctx: PerSampleRng transforms draw a
        # stream derived from (seed, epoch, index) — reproducible across
        # runs and worker counts (see data/transforms.py)
        return fetch_with_ctx(dataset, epoch, int(i))

    if num_workers <= 0:
        for b in batches:
            yield collate([fetch_item(i) for i in b])
        return

    pool = ThreadPoolExecutor(max_workers=num_workers)
    q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
    stop = threading.Event()
    err: list = [None]  # producer exception, re-raised in the consumer

    def fetch_batch(b):
        return collate(list(pool.map(fetch_item, b)))

    def producer():
        try:
            for b in batches:
                if stop.is_set():
                    return
                q.put(fetch_batch(b))
        except BaseException as e:  # noqa: BLE001 — decode/collate failure
            # must NOT look like a clean end-of-epoch (silent truncation);
            # stash it and re-raise on the consumer side
            err[0] = e
        finally:
            q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                if err[0] is not None:
                    raise err[0]
                break
            yield item
    finally:
        stop.set()
        # Drain until the producer thread EXITS — a one-shot drain is not
        # enough: the producer may be blocked in q.put() with an in-flight
        # batch, and its final q.put(None) needs a free slot of its own
        # (with prefetch=1 the freed slot is immediately re-filled by the
        # in-flight batch, so the sentinel put would block forever).
        # Bounded: a dataset fetch stuck on I/O (dead mount, hung codec)
        # must not freeze whatever finalizes this generator — past the
        # deadline we give up and leak the daemon thread (the old
        # behavior) rather than hang close/GC.
        import time as _time

        deadline = _time.monotonic() + 30.0
        while t.is_alive() and _time.monotonic() < deadline:
            try:
                q.get(timeout=0.1)
            except queue_mod.Empty:
                pass
            t.join(timeout=0.05)
        while True:
            try:
                q.get_nowait()
            except queue_mod.Empty:
                break
        pool.shutdown(wait=False)


def device_prefetch(iterator, *, size: int = 2, sharding=None):
    """Overlap host->device transfer with device compute: keep ``size``
    batches' arrays already on device ahead of the consumer (the jit'd step
    then never waits on PCIe/tunnel transfer).  ``sharding`` optionally
    places arrays (e.g. NamedSharding over the 'data' axis).

    The reference relies on torch DataLoader pin_memory+prefetch_factor
    (data/__init__.py:93-104) which prefetches to HOST only; this completes
    the pipeline to the device."""
    import collections

    import jax

    def put(batch):
        return tuple(
            jax.device_put(x, sharding) if isinstance(x, np.ndarray) else x
            for x in batch
        )

    buf = collections.deque()
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
