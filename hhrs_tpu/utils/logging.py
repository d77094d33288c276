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


def setup_logging(level=logging.INFO) -> None:
    logging.basicConfig(
        level=level, format="%(asctime)s - %(levelname)s - %(name)s - %(message)s"
    )


def enable_compilation_cache(path: str = "/tmp/hhrs_jax_cache") -> None:
    """Persistent XLA compilation cache — compiles on this image's tunneled
    chip cost 40s-300s, and an HPO sweep re-compiles per configuration;
    the cache makes repeat configs (and repeat sweeps) near-free."""
    import jax

    try:
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
    """Fixed-bucket latency histogram with p50/p99 estimates (serve path)."""

    def __init__(self):
        self.samples: list[float] = []

    def observe(self, seconds: float) -> None:
        self.samples.append(seconds)

    def percentile(self, p: float) -> float:
        if not self.samples:
            return float("nan")
        s = sorted(self.samples)
        idx = min(int(len(s) * p / 100.0), len(s) - 1)
        return s[idx]

    def summary(self) -> dict:
        return {
            "count": len(self.samples),
            "p50_ms": self.percentile(50) * 1e3,
            "p90_ms": self.percentile(90) * 1e3,
            "p99_ms": self.percentile(99) * 1e3,
        }
