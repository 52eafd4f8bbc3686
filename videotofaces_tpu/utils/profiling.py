"""Tracing and per-stage timing.

The reference has no observability beyond tqdm bars (SURVEY §5). Here:

- ``StageTimer`` accumulates wall-time per pipeline stage (decode, detect,
  filter, write, encode, ...) with throughput summaries;
- ``trace(dir)`` context manager wraps ``jax.profiler`` so any pipeline run
  can emit a TensorBoard-loadable device trace;
- ``annotate(name)`` adds named spans (jax.profiler.TraceAnnotation) that show
  up inside the device trace.

Enable globally via env: V2F_PROFILE_DIR=/tmp/trace python -m videotofaces_tpu ...
"""

import contextlib
import os
import time
from collections import defaultdict


class StageTimer:
    """Accumulates per-stage wall time + item counts."""

    def __init__(self):
        self.total = defaultdict(float)
        self.items = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name, items=0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.items[name] += items

    def summary(self):
        lines = []
        for name in sorted(self.total, key=self.total.get, reverse=True):
            t = self.total[name]
            n = self.items[name]
            rate = f", {n / t:.1f} items/s" if (n and t > 0) else ""
            lines.append(f"  {name}: {t:.3f}s ({n} items{rate})")
        return "\n".join(lines)

    def report(self):
        if self.total:
            print("Stage timings:")
            print(self.summary())


@contextlib.contextmanager
def trace(log_dir=None):
    """jax.profiler device trace around a block; no-op if log_dir is falsy."""
    log_dir = log_dir or os.environ.get("V2F_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"Wrote device trace to {log_dir} (open with TensorBoard)")


def sync(out):
    """True device-completion barrier: materialize one output leaf.

    ``jax.block_until_ready`` returns early on the axon tunnel backend, so
    timing loops MUST end with this instead; the device stream is FIFO, so
    fetching the last result bounds everything queued before it. This is the
    one load-bearing measurement primitive — every profiling tool and
    bench.py import it from here.
    """
    import jax

    jax.device_get(jax.tree.leaves(out)[0])


def annotate(name):
    """Named span inside a device trace (and a cheap no-op without one)."""
    try:
        import jax

        return jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover
        return contextlib.nullcontext()
