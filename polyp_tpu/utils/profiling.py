"""Tracing / profiling / debug hooks (SURVEY §5 "Tracing" row).

The reference has no profiling at all (tqdm bars only); here:
* `trace(logdir)` — jax.profiler trace context (view with Perfetto/
  TensorBoard);
* `Throughput` — `block_until_ready`-bracketed samples/sec counter, the
  instrument behind bench.py;
* `enable_nan_checks` / `debug_nans` — jax_debug_nans toggling, the
  single-controller answer to the reference's absent sanitizers;
* `xla_dump(dir)` — dump XLA HLO for kernel inspection.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Wall-clock samples/sec with device-sync brackets.

    >>> tp = Throughput()
    >>> with tp.measure(n_samples=batch):  # blocks on the result inside
    ...     out = step(...)
    ...     tp.sync(out)
    >>> tp.samples_per_sec
    """

    def __init__(self):
        self.total_samples = 0
        self.total_seconds = 0.0
        self._t0 = None

    @contextlib.contextmanager
    def measure(self, n_samples: int) -> Iterator["Throughput"]:
        t0 = time.perf_counter()
        yield self
        self.total_seconds += time.perf_counter() - t0
        self.total_samples += n_samples

    @staticmethod
    def sync(tree) -> None:
        jax.block_until_ready(tree)

    @property
    def samples_per_sec(self) -> float:
        return self.total_samples / self.total_seconds if self.total_seconds else 0.0


def enable_nan_checks(enabled: bool = True) -> None:
    jax.config.update("jax_debug_nans", enabled)


@contextlib.contextmanager
def debug_nans() -> Iterator[None]:
    prev = jax.config.jax_debug_nans
    enable_nan_checks(True)
    try:
        yield
    finally:
        enable_nan_checks(prev)


def xla_dump(dump_dir: str) -> None:
    """Route XLA HLO dumps to `dump_dir` (set before first compile)."""
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = f"{flags} --xla_dump_to={dump_dir}".strip()
