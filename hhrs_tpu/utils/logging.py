"""Structured logging + per-step metrics.

The reference only has ``logging.basicConfig(INFO)`` (train.py:18,
main.py:19). Here: same human-readable stream, plus an optional JSONL
metrics sink for per-step training metrics (loss, AUC, examples/s/chip)
and serve-path latency histograms — the observability contract from
SURVEY.md §5.
"""

from __future__ import annotations

import json
import logging
import time
from collections import deque


def setup_logging(level=logging.INFO) -> None:
    logging.basicConfig(
        level=level, format="%(asctime)s - %(levelname)s - %(name)s - %(message)s"
    )


def enable_compilation_cache(path: str = "/tmp/hhrs_jax_cache") -> None:
    """Persistent XLA compilation cache — compiles on this image's tunneled
    chip cost 40s-300s, and an HPO sweep re-compiles per configuration;
    the cache makes repeat configs (and repeat sweeps) near-free.

    CPU backends are excluded: XLA:CPU persists AOT machine code keyed by
    the *compile-time* machine-feature set, and reloading an entry whose
    features disagree with the host (observed: ``+prefer-no-scatter`` /
    ``+prefer-no-gather`` pseudo-features) logs SIGILL warnings and has
    hung mesh runs at the first cached step. CPU compiles are fast; the
    cache only pays for itself on the tunneled TPU."""
    import jax

    try:
        if jax.default_backend() == "cpu":
            return
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # noqa: BLE001 — older jax without the option
        pass


class MetricsLogger:
    """Append-only JSONL metrics sink; cheap enough for per-step use."""

    def __init__(self, path: str | None = None):
        self.path = path
        self._fh = open(path, "a") if path else None

    def log(self, **metrics) -> None:
        metrics.setdefault("ts", time.time())
        if self._fh:
            self._fh.write(json.dumps(metrics) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


class LatencyHistogram:
    """Rolling-window latency quantiles (serve path): bounded memory
    (last `window` samples), lifetime request counter, one sort per
    summary. Thread-safe: request-handler threads observe() while
    /metrics//healthz scrapes summary() concurrently (iterating a deque
    another thread appends to raises RuntimeError). Quantiles are None
    (JSON null) before any traffic — NaN is not valid strict JSON."""

    def __init__(self, window: int = 10_000):
        import threading

        self.samples = deque(maxlen=window)
        self.total = 0
        self._lock = threading.Lock()

    def observe(self, seconds: float) -> None:
        with self._lock:
            self.samples.append(seconds)
            self.total += 1

    def summary(self) -> dict:
        with self._lock:
            if not self.samples:
                return {"count": 0, "p50_ms": None, "p90_ms": None,
                        "p99_ms": None}
            # copy only — the O(n log n) sort happens OUTSIDE the lock so a
            # /metrics scrape never stalls request threads in observe()
            s = list(self.samples)
            total = self.total
        s.sort()

        def q(p):
            return s[min(int(len(s) * p / 100.0), len(s) - 1)] * 1e3

        return {"count": total, "p50_ms": q(50), "p90_ms": q(90), "p99_ms": q(99)}
