"""Profiling hooks (the reference's only tracing is a per-round print).

Thin wrappers over the JAX profiler plus a wall-clock round timer, so runs
can be traced with TensorBoard/Perfetto without touching explorer code
(SURVEY.md §5 lists tracing as an absent subsystem in the reference).
"""
import contextlib
import time
from typing import Dict, List


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace of the enclosed block.

    View with TensorBoard (`tensorboard --logdir <log_dir>`) or upload the
    .trace.json.gz to Perfetto.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def amortized_seconds_per_call(fn, *args, reps: int = 20) -> float:
    """Relay-safe device timing: amortized wall seconds per `fn(*args)`.

    Through the remote TPU relay `.block_until_ready()` does not actually
    block (async relay — see CLAUDE.md), so naive timings are mirages.
    This pipelines `reps` calls and fetches the last result with
    `np.asarray`, which DOES round-trip; the per-call time is the
    amortized wall clock.  One warmup call absorbs compilation.
    """
    import numpy as np

    out = fn(*args)
    np.asarray(jax_leaf(out))
    start = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax_leaf(out))
    return (time.perf_counter() - start) / reps


def jax_leaf(tree):
    """First array leaf of a pytree (the fetch target for timing)."""
    import jax

    return jax.tree.leaves(tree)[0]


class RoundTimer:
    """Accumulates per-round wall-clock spans for an experiment loop."""

    def __init__(self):
        self.spans: List[Dict] = []
        self._start = None
        self._label = None

    @contextlib.contextmanager
    def measure(self, label: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.spans.append(
                {"label": label, "seconds": time.perf_counter() - start}
            )

    def summary(self) -> Dict[str, float]:
        """Total seconds per label."""
        out: Dict[str, float] = {}
        for span in self.spans:
            out[span["label"]] = out.get(span["label"], 0.0) + span["seconds"]
        return out
