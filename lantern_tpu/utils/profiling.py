"""Tracing / profiling / observability utilities.

The reference's only instrumentation is a cuda-sync Timer and per-run latency
prints (SURVEY.md §5).  Here:

- ``DeviceTimer``: wall-clock bracketing with ``block_until_ready`` on an
  optional pytree (the TPU analog of the reference's cuda-synchronize Timer,
  utils.py:23-34).
- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory for kernel-level inspection.
- ``DecodeStats``: per-request accept-length histogram + throughput counters
  (step_compression is its mean), matching the statistics schema the
  reference emits per run.
- ``SmoothedValue`` / ``MetricLogger``: training-side meters (xllmx
  util/misc.py:21-152 equivalents; cross-host reduction via
  ``jax.experimental.multihost_utils`` when running distributed).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Optional

import numpy as np


class DeviceTimer:
    """with DeviceTimer("verify", result_tree): ... -> prints elapsed after
    forcing device completion of the given pytree."""

    def __init__(self, name: str, sync_tree=None, quiet: bool = False):
        self.name = name
        self.sync_tree = sync_tree
        self.quiet = quiet
        self.elapsed = 0.0

    def __enter__(self):
        if self.sync_tree is not None:
            # drain already-dispatched async work first, like the reference
            # Timer's entry cuda-sync (utils.py:23-34) — otherwise pending
            # dispatches get attributed to the timed region
            import jax

            jax.block_until_ready(self.sync_tree)
        self._t0 = time.perf_counter()
        return self

    def set_sync(self, tree):
        """Point the exit sync at output produced inside the block."""
        self.sync_tree = tree
        return tree

    def __exit__(self, *exc):
        if self.sync_tree is not None:
            import jax

            jax.block_until_ready(self.sync_tree)
        self.elapsed = time.perf_counter() - self._t0
        if not self.quiet:
            print(f"[{self.name}] {self.elapsed * 1e3:.2f} ms")


@contextlib.contextmanager
def trace(logdir: str = "/tmp/lantern_trace"):
    """Capture a jax.profiler trace (open with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class DecodeStats:
    """Accept-length histogram + throughput accounting for spec decoding."""

    def __init__(self):
        self.accept_hist = collections.Counter()
        self.steps = 0
        self.tokens = 0
        self.wall = 0.0

    def record_step(self, accepted: int, wall: float = 0.0):
        self.accept_hist[int(accepted)] += 1
        self.steps += 1
        self.tokens += int(accepted)
        self.wall += wall

    def record_run(self, steps: int, accept_sum: int, wall: float):
        self.steps += int(steps)
        self.tokens += int(accept_sum)
        self.wall += wall

    @property
    def step_compression(self) -> float:
        return self.tokens / max(self.steps, 1)

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / self.wall if self.wall else 0.0

    def summary(self) -> dict:
        return {
            "steps": self.steps,
            "tokens": self.tokens,
            "step_compression": round(self.step_compression, 4),
            "tokens_per_s": round(self.tokens_per_s, 2),
            "accept_hist": dict(sorted(self.accept_hist.items())),
        }


class SmoothedValue:
    """Windowed + global averages of a scalar series."""

    def __init__(self, window: int = 20):
        self.deque = collections.deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.deque.append(float(value))
        self.total += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters = collections.defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def synchronize_between_hosts(self):
        """All-reduce meter totals across hosts (no-op single-host)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        keys = sorted(self.meters)
        # hosts must agree on the meter set: silently summing mismatched
        # rows would corrupt every synced value
        key_sig = np.asarray(
            [np.frombuffer(
                __import__("hashlib").sha1("|".join(keys).encode()).digest()[:8],
                np.int64)[0]])
        sigs = multihost_utils.process_allgather(key_sig)
        if not (np.asarray(sigs) == key_sig[0]).all():
            raise ValueError(
                "MetricLogger.synchronize_between_hosts: hosts disagree on "
                f"meter keys (this host: {keys})")
        vals = np.asarray(
            [[self.meters[k].total, self.meters[k].count] for k in keys],
            np.float64,
        )
        summed = multihost_utils.process_allgather(vals).sum(axis=0)
        for i, k in enumerate(keys):
            self.meters[k].total = float(summed[i, 0])
            self.meters[k].count = int(summed[i, 1])

    def __str__(self):
        return self.delimiter.join(
            f"{k}: {m.avg:.4f} ({m.global_avg:.4f})" for k, m in self.meters.items()
        )
