"""Progress reporting: tqdm when present, a same-line printer otherwise.

Mirrors the reference's graceful degradation (utils/pbar.py:2-37) so pipeline
code can unconditionally wrap loops in ``tqdm(...)``.
"""

try:
    from tqdm.auto import tqdm  # type: ignore  # noqa: F401
except ImportError:  # pragma: no cover - depends on environment
    try:
        from tqdm import tqdm  # type: ignore  # noqa: F401
    except ImportError:

        class tqdm:  # noqa: N801 - match the real API name
            """Minimal same-line progress printer (iterations, or MB when unit='B')."""

            def __init__(self, total=None, unit=None, unit_scale=None, unit_divisor=None):
                self.n = 0
                self.as_bytes = unit == "B"
                self.total = total / 1024**2 if (total and self.as_bytes) else total

            def update(self, n):
                self.n += int(n / 1024**2) if self.as_bytes else n
                suffix = "MB" if self.as_bytes else ""
                if self.total is None:
                    print("\r%d%s" % (self.n, suffix), end="")
                else:
                    pct = int(100.0 * self.n / self.total + 0.5) if self.total else 100
                    print("\r%d/%d%s (%d%%)" % (self.n, self.total, suffix, pct), end="")

            def close(self):
                print("\r")

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                self.close()
