"""Profiling/tracing hooks (SURVEY.md §5 — the reference has none).

  * ``trace(dir)`` — context manager around ``jax.profiler.trace``;
    produces a Perfetto/TensorBoard-compatible trace of everything inside.
  * ``start_server(port)`` — live ``jax.profiler`` server for on-demand
    capture against a running trainer/server.
  * ``StepTimer`` — cheap host-side per-step wall timing with an
    examples/s summary (the north-star throughput metric).
  * ``hlo_dump_env(dir)`` — the XLA_FLAGS needed to dump HLO for kernel
    inspection; returned (not set) so callers opt in per process.
"""

from __future__ import annotations

import time

import jax


# jax.profiler.trace is already a context manager — re-exported, not wrapped
trace = jax.profiler.trace


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


def hlo_dump_env(dump_dir: str) -> dict:
    return {"XLA_FLAGS": f"--xla_dump_to={dump_dir} --xla_dump_hlo_as_text"}


class StepTimer:
    """Accumulates per-step wall times; syncing is the caller's business.
    On this image's tunneled TPU backend, sync on a VALUE fetch
    (float(x)/np.asarray) — block_until_ready can return before the work
    completes (RESULTS.md), which silently fabricates step times."""

    def __init__(self):
        self._t0 = None
        self.times: list[float] = []

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        if self._t0 is None:
            raise RuntimeError("StepTimer.stop() without a prior start()")
        dt = time.perf_counter() - self._t0
        self._t0 = None  # a second stop() must not record a stale duration
        self.times.append(dt)
        return dt

    def summary(self, examples_per_step: int | None = None) -> dict:
        if not self.times:
            return {"steps": 0}
        mean = sum(self.times) / len(self.times)
        out = {
            "steps": len(self.times),
            "mean_ms": mean * 1e3,
            "min_ms": min(self.times) * 1e3,
        }
        if examples_per_step:
            out["examples_per_s"] = examples_per_step / mean
        return out
