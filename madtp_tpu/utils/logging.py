"""Windowed metric meters + iteration logger (reference ``utils.py:30-179``).

``SmoothedValue``/``MetricLogger`` parity, minus torch: cross-process totals
sync through a pluggable reducer (``jax.lax.psum`` on host-aggregated scalars
or a no-op single process), and device-memory stats come from
``jax.local_devices()[0].memory_stats()`` instead of
``torch.cuda.max_memory_allocated``."""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Optional


class SmoothedValue:
    """Track a series of values and provide access to smoothed values over a
    window or the global series average (reference utils.py:30-89)."""

    def __init__(self, window_size: int = 20, fmt: Optional[str] = None):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt or "{median:.4f} ({global_avg:.4f})"

    def update(self, value, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self, reducer=None):
        """All-reduce count/total (reference utils.py:48-59); ``reducer`` maps
        a list of scalars to their global sums."""
        if reducer is None:
            return
        self.count, self.total = reducer([float(self.count), self.total])

    @property
    def median(self):
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self):
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "\t", print_fn=print):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print = print_fn

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def synchronize_between_processes(self, reducer=None):
        for meter in self.meters.values():
            meter.synchronize_between_processes(reducer)

    def global_avg(self):
        return self.delimiter.join(
            f"{name}: {meter.global_avg:.4f}" for name, meter in self.meters.items()
        )

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def log_every(self, iterable, print_freq: int, header: str = ""):
        """Iterate with periodic progress lines incl. ETA + per-iter timing
        (reference utils.py:135-179)."""
        i = 0
        start_time = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)
        except TypeError:
            total = None
        space = len(str(total)) if total else 6
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total and i == total - 1):
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    self.print(
                        f"{header} [{i:{space}d}/{total}] eta: {eta_str} "
                        f"{self} time: {iter_time} data: {data_time}"
                    )
                else:
                    self.print(f"{header} [{i}] {self} time: {iter_time}")
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        self.print(
            f"{header} Total time: "
            f"{str(datetime.timedelta(seconds=int(total_time)))} "
            f"({total_time / max(i, 1):.4f} s / it)"
        )
