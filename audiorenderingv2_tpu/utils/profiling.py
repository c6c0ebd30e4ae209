"""Profiling helpers.

Replaces the reference's ad-hoc std::chrono prints (AudioRenderer.cpp:495-518,
595-660) with structured timers and optional jax.profiler traces.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


def device_fence(out) -> float:
    """Reliable completion fence for timed device work.

    Materializes the first array leaf of ``out`` to host and returns its
    float sum. ``jax.block_until_ready`` was observed to return early
    through remote-dispatch backends (the axon tunnel; docs/ROUND4.md 1b),
    yielding physically impossible timings — a device->host copy cannot
    complete before the computation has, and the returned checksum lets
    callers assert the result is finite. The ONE shared implementation for
    bench.py, warmup.py, and the tune harnesses.
    """
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(leaf).sum())


def timed_median(fn, *args, n: int = 5, min_ms: float = 0.0):
    """THE timing contract for every bench/tune harness on this backend.

    Returns ``(median_ms, compile_first_s, checksum)``. Each timed call
    ends with :func:`device_fence` (host materialization — never
    ``block_until_ready``, which returned early twice through the axon
    tunnel, docs/ROUND4.md 1b/5b) and the checksum is asserted finite and
    positive, so a number can only be produced by a completed computation.
    ``min_ms`` adds a physical-plausibility floor (raise if the median is
    impossibly fast for the workload). Callers needing fresh inputs per
    call pass a callable taking the iteration index as its only argument
    and no ``args``.
    """
    import numpy as np

    def call(i):
        out = fn(i) if not args else fn(*args)
        s = device_fence(out)
        assert np.isfinite(s) and s > 0, f"bad checksum {s}"
        return s

    t0 = time.time()
    checksum = call(0)
    compile_first_s = time.time() - t0
    ts = []
    for i in range(1, n + 1):
        t0 = time.time()
        call(i)
        ts.append(time.time() - t0)
    median_ms = float(np.median(ts)) * 1000.0
    if median_ms < min_ms:
        raise RuntimeError(
            f"median {median_ms:.3f} ms below the physical floor {min_ms} "
            f"ms — the completion fence is being bypassed (see "
            f"docs/ROUND4.md 1b)")
    return median_ms, compile_first_s, checksum


@dataclass
class Timer:
    """Accumulating named wall-clock timer; call in a with-block."""

    name: str
    times: list = field(default_factory=list)

    @contextlib.contextmanager
    def measure(self, sync: jax.Array | None = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.times.append(time.perf_counter() - t0)

    @property
    def last_ms(self) -> float:
        return self.times[-1] * 1000.0 if self.times else 0.0

    @property
    def median_ms(self) -> float:
        if not self.times:
            return 0.0
        s = sorted(self.times)
        return s[len(s) // 2] * 1000.0


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context — inspect with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def rays_per_second(n_rays: int, seconds: float) -> float:
    return n_rays / seconds if seconds > 0 else 0.0
