"""Structured tracing: per-phase wall timing + optional device profiling.

The reference's observability is commented-out ReferenceCounter hooks
appending to text files (huggingface.py:279-341) and bare prints; this is the
first-class replacement (SURVEY.md §5): a phase timer the evaluator and
engine report into, and an optional ``jax.profiler`` trace capture around the
hot request loop.
"""

import contextlib
import json
import time
from collections import defaultdict
from typing import Optional


class Tracer:
    """Accumulates named phase timings and counters."""

    def __init__(self):
        self.times = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def add(self, name: str, n: int = 1):
        self.counts[name] += n

    def summary(self) -> dict:
        return {
            "phase_seconds": dict(sorted(self.times.items())),
            "counts": dict(sorted(self.counts.items())),
        }

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=2)
        if path:
            with open(path, "w", encoding="utf-8") as f:
                f.write(s)
        return s


# process-global default tracer (opt-in: evaluator writes into it when
# tracing is enabled via main.py --trace)
GLOBAL_TRACER: Optional[Tracer] = None


def enable() -> Tracer:
    global GLOBAL_TRACER
    GLOBAL_TRACER = Tracer()
    return GLOBAL_TRACER


@contextlib.contextmanager
def maybe_phase(name: str):
    if GLOBAL_TRACER is None:
        yield
    else:
        with GLOBAL_TRACER.phase(name):
            yield


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]):
    """Capture a jax.profiler trace (TensorBoard/XPlane) around a block."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ActivationStats:
    """Per-site activation statistics — the working replacement for the
    reference's commented ReferenceCounter profiling hooks.

    Wraps an ActQuantizer-compatible callable; records call counts and
    (host-side) mean/std per site when flushed.
    """

    def __init__(self, inner=None):
        self.inner = inner
        self.counts = defaultdict(int)
        self._sums = defaultdict(float)
        self._sqsums = defaultdict(float)
        self._n = defaultdict(int)

    def __call__(self, site: str, x):
        import jax.numpy as jnp
        import numpy as np

        self.counts[site] += 1
        # cheap device-side reductions; fetched lazily
        arr = np.asarray(jnp.asarray(x, jnp.float32))
        self._sums[site] += float(arr.sum())
        self._sqsums[site] += float((arr.astype("float64") ** 2).sum())
        self._n[site] += arr.size
        return self.inner(site, x) if self.inner is not None else x

    def summary(self) -> dict:
        out = {}
        for site in self.counts:
            n = max(1, self._n[site])
            mean = self._sums[site] / n
            var = max(0.0, self._sqsums[site] / n - mean**2)
            out[site] = {
                "calls": self.counts[site],
                "elements": self._n[site],
                "mean": mean,
                "std": var**0.5,
            }
        return out
