"""Small bounded LRU for compiled-step caches.

The jitted-step caches (``tasks/retrieval._STEP_CACHE``, the per-driver
``--fast_train`` ``step_cache`` dicts) key compiled executables by capacity
schedule.  Capacity bucketing keeps the key count small in practice, but a
long multi-epoch run with a shifting schedule could otherwise accumulate
host/HBM memory for every schedule ever seen — so the caches are bounded:
least-recently-used entries are dropped (dropping only costs a re-trace if
that schedule ever recurs)."""

from __future__ import annotations

from collections import OrderedDict


class BoundedCache(OrderedDict):
    """OrderedDict with LRU eviction at ``maxsize`` entries."""

    def __init__(self, maxsize: int = 8):
        super().__init__()
        self.maxsize = maxsize

    def __getitem__(self, key):
        value = super().__getitem__(key)
        self.move_to_end(key)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        self.move_to_end(key)
        while len(self) > self.maxsize:
            self.popitem(last=False)
