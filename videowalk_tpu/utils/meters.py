"""Training meters: windowed smoothing + step logging.

Mirrors the reference's SmoothedValue / MetricLogger
(code/utils/__init__.py:47-197): same window semantics, same log line fields
(eta, meters, iter time, data time), with device memory reported from the JAX
backend instead of torch.cuda.
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque


class SmoothedValue:
    """Track a series of values; expose median/avg over a window plus the
    global average (reference code/utils/__init__.py:47-108)."""

    def __init__(self, window_size: int = 20, fmt: str | None = None):
        if fmt is None:
            fmt = "{median:.4f} ({global_avg:.4f})"
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self):
        d = sorted(self.deque)
        n = len(d)
        if n == 0:
            return 0.0
        # match torch.median: lower middle element for even counts
        return d[(n - 1) // 2]

    @property
    def avg(self):
        return sum(self.deque) / max(1, len(self.deque))

    @property
    def global_avg(self):
        return self.total / max(1, self.count)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value)


def _device_memory_mb() -> float | None:
    """Peak device memory in MB (JAX analogue of torch.cuda.max_memory_allocated)."""
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / (1024.0 * 1024.0)
    except Exception:
        pass
    return None


class MetricLogger:
    """Iterator wrapper printing eta/meters/time/data/max-mem every
    ``print_freq`` steps (reference code/utils/__init__.py:111-197)."""

    def __init__(self, delimiter: str = "\t"):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(
            f"'{type(self).__name__}' object has no attribute '{attr}'")

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def add_meter(self, name, meter):
        self.meters[name] = meter

    def log_every(self, iterable, print_freq, header=None, total=None):
        i = 0
        header = header or ""
        total = total if total is not None else len(iterable)
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        space_fmt = ":" + str(len(str(total))) + "d"
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                eta_seconds = iter_time.global_avg * (total - i)
                eta_string = str(datetime.timedelta(seconds=int(eta_seconds)))
                mem = _device_memory_mb()
                parts = [
                    header,
                    ("[{0" + space_fmt + "}/{1}]").format(i, total),
                    f"eta: {eta_string}",
                    str(self),
                    f"time: {iter_time}",
                    f"data: {data_time}",
                ]
                if mem is not None:
                    parts.append(f"max mem: {mem:.0f}")
                print(self.delimiter.join(parts), flush=True)
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        total_time_str = str(datetime.timedelta(seconds=int(total_time)))
        print(f"{header} Total time: {total_time_str}", flush=True)
