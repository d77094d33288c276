"""Benchmark: DCN-R train throughput (examples/s/chip) on the flagship config.

Prints staged JSON lines, each a complete valid record; the LAST line on
stdout is the result: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no throughput numbers (BASELINE.md — no benchmarks/
directory exists), so ``vs_baseline`` is measured live against a faithful
PyTorch implementation of the same DCN-R running the reference's execution
mode (single-device torch, reference train.py:32 falls back to CPU when no
CUDA). Same batch size, same model dims, same optimizer — the ratio is
"our jitted TPU step vs. the reference stack on this host".

Outage hardening (round 3 lost its driver metric to a tunnel outage —
rc=124, nothing on stdout): the tunneled TPU backend can hang indefinitely
on ANY device op, and a blocked C call can't be interrupted by Python
signals. Defenses, all measured-state-first:

  * a watchdog DAEMON THREAD with a wall-clock budget
    (``HHRS_BENCH_BUDGET_S``, default 420): on expiry it prints a valid
    JSON line built from whatever was measured so far (``value: null`` if
    no window completed, median of completed windows otherwise, plus
    ``error``/``phase``/``windows_completed``) and ``os._exit(0)``;
  * a fast-fail probe — one tiny device op under a short sub-deadline
    (``HHRS_BENCH_PROBE_S``, default 90) — before committing to the
    multi-minute warmup/compile;
  * a JSON line is printed (and flushed) after EVERY measurement window,
    so even an external ``timeout`` kill leaves a parseable record;
  * the torch baseline runs AFTER the JAX number is already on stdout,
    in a time-boxed thread (``HHRS_BENCH_TORCH_S``, default 120).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np


# Flagship config: the reference's Optuna-best hyperparams (BASELINE.md),
# at production-ish table sizes so the bench isn't toy-bound.
N_USERS = 100_000
N_ITEMS = 20_000
CAT_DIMS = (("city", 64), ("hotel_type", 8))
N_NUM = 11
EMB_DIM = 16
HIDDEN = 128
N_CROSS = 2
N_RES = 1
OPTIMIZER, LR, WD = "adamw", 1e-3, 1e-4  # single source: tx, lazy rows, torch baseline
DROPOUT = 0.6
# Dispatch-amortizing batch: throughput rises ~3.5x from 4096 to 16384 and
# another ~20-25% to 32768; 32768 and 65536 are statistically tied in a
# back-to-back both-orders A/B (each won one order by <1%, RESULTS.md), so
# 32768 wins on half the memory and XLA compile time (~5 min at 65536 for
# the scatter-add table grads). Both stacks are measured at the same batch.
BATCH = int(os.environ.get("HHRS_BENCH_BATCH", "32768"))
WARMUP_STEPS = int(os.environ.get("HHRS_BENCH_WARMUP_STEPS", "20"))
MEASURE_STEPS = int(os.environ.get("HHRS_BENCH_MEASURE_STEPS", "200"))
TORCH_STEPS = int(os.environ.get("HHRS_BENCH_TORCH_STEPS", "4"))

# Adaptive window protocol (round 5; VERDICT r4 item 1). A 200-step window
# at B=32768 is only ~0.4-0.8s of wall clock, so ONE transient tunnel
# stall used to poison a whole window and median-of-3 had no defense —
# BENCH_r04 decoded to windows of 15.7/7.3/8.9M ex/s (>2x intra-run swing)
# and the judged median landed at less than half the healthy-tunnel rate.
# Now: run at least MIN_WINDOWS, keep adding windows while the relative
# spread (max-min)/median exceeds SPREAD_TARGET, up to MAX_WINDOWS or the
# measurement wall cap (whichever first), and report the median of ALL
# windows. Every record carries the per-window rates so dispersion is
# visible in BENCH_r*.json itself.
MIN_WINDOWS = int(os.environ.get("HHRS_BENCH_MIN_WINDOWS", "5"))
# Generous extension caps: the tunnel oscillates on the scale of MINUTES
# (same program measured 17.1M ex/s spread 0.30 and 5.9M spread 1.75 an
# hour apart, 2026-08-21), so when the spread trigger fires the loop
# should keep sampling across several minutes — the 420s budget minus
# setup/torch reserve bounds it anyway, and a tight-spread healthy run
# still exits after MIN_WINDOWS (~5s).
MAX_WINDOWS = int(os.environ.get("HHRS_BENCH_MAX_WINDOWS", "200"))
SPREAD_TARGET = float(os.environ.get("HHRS_BENCH_SPREAD_TARGET", "0.15"))
MEASURE_WALL_S = float(os.environ.get("HHRS_BENCH_MEASURE_WALL_S", "240"))
TORCH_RESERVE_S = float(os.environ.get("HHRS_BENCH_TORCH_RESERVE_S", "60"))

# Wall-clock budgets (seconds; env-overridable). The driver kills bench.py
# with an external timeout if it runs long — these keep a valid JSON line
# on stdout before anyone's deadline hits. A malformed override falls back
# to the default (a typo'd env var must not crash the metric run at import).


def _env_f(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        print(f"ignoring malformed {name}={os.environ[name]!r}", file=sys.stderr)
        return default


BUDGET_S = _env_f("HHRS_BENCH_BUDGET_S", 420.0)
PROBE_S = _env_f("HHRS_BENCH_PROBE_S", 90.0)
TORCH_S = _env_f("HHRS_BENCH_TORCH_S", 120.0)


class _Progress:
    """Shared measured-so-far state: the main flow appends to it, the
    watchdog thread reads it to emit a best-effort record on expiry.

    Everything under one lock; ``emit`` always prints a COMPLETE record
    (the driver parses the last JSON line on stdout, so every staged line
    must stand on its own)."""

    def __init__(self):
        self.lock = threading.Lock()
        self.t0 = time.monotonic()
        self.deadline = self.t0 + PROBE_S  # extended after the probe passes
        self.phase = "startup"
        self.windows: list[float] = []
        self.vs_baseline = None
        self.torch_error = None
        self.host_load = None
        self.done = False

    def set_phase(self, phase: str, deadline: float | None = None):
        with self.lock:
            self.phase = phase
            if deadline is not None:
                self.deadline = deadline

    def add_window(self, rate: float):
        with self.lock:
            self.windows.append(rate)

    def record(self, error: str | None = None) -> dict:
        """The result record from whatever has been measured so far."""
        with self.lock:
            windows = list(self.windows)
            import statistics

            spread = (
                round((max(windows) - min(windows)) / statistics.median(windows), 3)
                if windows else None
            )
            rec = {
                "metric": "dcnr_train_throughput",
                "value": round(statistics.median(windows), 1) if windows else None,
                "unit": "examples/s/chip",
                "vs_baseline": self.vs_baseline,
                # adopted 2026-08-19: hardware-RBG dropout bits (+28-30%,
                # benchmarks/prng_ab.py) — emitted so downstream comparisons
                # can tell pre/post-switch numbers apart (ADVICE r2)
                "rng_impl": "rbg",
                # adopted r3: bf16 activation storage (+2.6-3.2% both
                # orders, benchmarks/storage_ab.py)
                "storage_dtype": "bfloat16",
                "windows_completed": len(windows),
                # Per-window rates + relative spread (round 5): the r4
                # record hid a >2x intra-run swing behind a single median —
                # a reader of BENCH_r*.json alone must be able to see the
                # dispersion and judge whether the median reflects
                # capability or a degraded tunnel minute.
                "windows": [round(w, 1) for w in windows],
                "window_spread": spread,
                "phase": self.phase,
                "elapsed_s": round(time.monotonic() - self.t0, 1),
            }
            if error is not None:
                rec["error"] = error
            if self.torch_error is not None:
                rec["torch_error"] = self.torch_error
            if self.host_load is not None:
                rec["host_load"] = self.host_load
            return rec

    def emit(self, error: str | None = None):
        print(json.dumps(self.record(error)), flush=True)


_PROGRESS = _Progress()


def _watchdog():
    """Poll the shared deadline; on expiry print best-so-far and exit 0.

    A thread, not SIGALRM: a device op blocked inside the runtime never
    returns to the Python bytecode loop, so a signal handler would not run
    until the hang resolved — exactly the case this defends against."""
    while True:
        time.sleep(0.5)
        with _PROGRESS.lock:
            if _PROGRESS.done:
                return
            if time.monotonic() <= _PROGRESS.deadline:
                continue
            # CLAIM completion under the lock: main's final emit also
            # claims `done` before printing, so exactly one of the two can
            # write the last JSON line (a successful run finishing in the
            # same poll window must not be trailed by a budget_exceeded
            # record — the driver parses the LAST line).
            _PROGRESS.done = True
            phase = _PROGRESS.phase
        _PROGRESS.emit(error=f"budget_exceeded:{phase}")
        sys.stdout.flush()
        os._exit(0)


def _maybe_fake_hang(phase: str):
    """Test hook: HHRS_BENCH_FAKE_HANG=<phase> simulates a tunnel outage at
    that phase (the subprocess watchdog tests drive this — a real hang is a
    blocked C call, which a sleep models faithfully for the watchdog);
    HHRS_BENCH_FAKE_RAISE=<phase> simulates a raised backend error (e.g.
    XlaRuntimeError from a failed remote compile)."""
    if os.environ.get("HHRS_BENCH_FAKE_HANG") == phase:
        time.sleep(3600)
    if os.environ.get("HHRS_BENCH_FAKE_RAISE") == phase:
        raise RuntimeError(f"injected backend failure at {phase}")


def _probe_device():
    """One tiny device op + value fetch — fails fast (via the watchdog's
    probe deadline) when the tunnel is down, instead of hanging inside a
    multi-minute warmup compile with nothing on stdout."""
    import jax
    import jax.numpy as jnp

    _maybe_fake_hang("probe")
    val = float(jnp.sum(jnp.arange(8.0)))  # forces a real D2H round-trip
    assert val == 28.0, val
    return jax.devices()[0].platform


def _np_batch(rng, n):
    return {
        "user": rng.integers(0, N_USERS, n).astype(np.int32),
        "item": rng.integers(0, N_ITEMS, n).astype(np.int32),
        "cat": np.stack(
            [rng.integers(0, d, n) for _, d in CAT_DIMS], axis=1
        ).astype(np.int32),
        "num": rng.normal(size=(n, N_NUM)).astype(np.float32),
        "y": (rng.uniform(size=n) < 0.5).astype(np.float32),
    }


def flagship_setup():
    """(dims, cfg, tx) of the flagship bench config.

    Shared with the A/B harnesses in benchmarks/ (batch_ab, rng_ab,
    unroll_ab) so they measure the bench's ACTUAL program by construction
    instead of drifting copies.
    """
    from hhrs_tpu.config import ModelConfig
    from hhrs_tpu.models.dcn import ModelDims
    from hhrs_tpu.train.optimizers import make_optimizer
    from hhrs_tpu.utils.logging import enable_compilation_cache

    # gated: CPU backends must NOT share the persistent cache (stale CPU
    # AOT entries with mismatched machine features SIGILL-warn and have
    # hung mesh runs — utils/logging.py)
    enable_compilation_cache()

    dims = ModelDims(N_USERS, N_ITEMS, CAT_DIMS, N_NUM)
    # storage_dtype=bf16: activations stored bf16 (BN stats/logits/params
    # stay f32) — won BOTH orders of the flagship A/B (+2.6-3.2%,
    # benchmarks/storage_ab.py); the step is HBM-bound so activation bytes
    # are the binding resource (roofline).
    cfg = ModelConfig(
        emb_dim=EMB_DIM, hidden_dim=HIDDEN, n_cross_layers=N_CROSS,
        n_res_blocks=N_RES, dropout=DROPOUT, compute_dtype="bfloat16",
        storage_dtype="bfloat16",
    )
    tx = make_optimizer(OPTIMIZER, LR, WD)
    return dims, cfg, tx


def flagship_update(params, bn, opt, batch, rng, *, cfg, tx, remat: bool = False):
    """One un-jitted flagship train update (fwd/bwd + optimizer apply).

    remat=True wraps the forward in ``jax.checkpoint`` (recompute-all
    policy): the backward pass re-runs the forward instead of reading
    saved activations from HBM — a FLOPs-for-bytes trade the roofline
    says should be favorable here (the step uses ≤2% of any MXU but
    ~72% of v5e HBM bandwidth, RESULTS.md). A/B'd by
    benchmarks/remat_ab.py; numerics are bit-identical (same ops, same
    rng replayed)."""
    import jax

    from hhrs_tpu.models.dcn import apply_dcn
    from hhrs_tpu.train.metrics import bce_with_logits

    def loss_fn(p):
        logits, nbn = apply_dcn(
            p, bn, batch["user"], batch["item"], batch["cat"], batch["num"],
            cfg=cfg, train=True, rng=rng,
        )
        return bce_with_logits(logits, batch["y"]), nbn

    if remat:
        loss_fn = jax.checkpoint(loss_fn)
    (loss, nbn), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    up, no = tx.update(g, opt, params)
    return jax.tree.map(lambda a, u: a + u, params, up), nbn, no, loss


def make_flagship_step(cfg, tx, *, fold_rng: bool = False, remat: bool = False,
                       lazy: bool = False):
    """The jitted flagship step, donated params/opt buffers.

    The batch is a runtime ARGUMENT in both variants — load-bearing: a
    closed-over batch lowers as an HLO constant, letting XLA constant-fold
    data-dependent work out of the measured program (and the tunnel's
    remote compiler rejects large embedded constants outright, RESULTS.md).

    fold_rng=False → ``step(params, bn, opt, batch, rng)`` (per-step
    Python-side split — the bench default); fold_rng=True →
    ``step(params, bn, opt, batch, s, rng0)`` with an in-step
    ``fold_in(rng0, s)`` and a donated device-carried counter, returning
    ``(..., loss, s+1)`` (the production trainer's pattern).
    """
    from functools import partial

    import jax

    if lazy:
        # Sparse-row table updates (train/lazy.py): opt state must be a
        # LazyOptState (init via hhrs_tpu.train.lazy.init_lazy_opt). Only
        # the fold_rng variant is provided — the production trainer's
        # pattern. The table-row optimizer MUST mirror the dense tx
        # (OPTIMIZER/LR/WD are the shared source) or the lazy-vs-dense A/B
        # would compare two different optimizers.
        from hhrs_tpu.config import TrainConfig
        from hhrs_tpu.train.lazy import make_lazy_update

        assert fold_rng, "lazy flagship step is fold_rng-only"
        assert not remat, "lazy+remat is not a provided variant"
        update = make_lazy_update(
            cfg, TrainConfig(optimizer=OPTIMIZER, lr=LR, weight_decay=WD,
                             lazy_table_updates=True))

        @partial(jax.jit, donate_argnums=(0, 2, 4))
        def lazy_step(params, bn, opt, batch, s, rng0):
            p, nbn, no, loss = update(
                params, bn, opt, tx.update, batch, jax.random.fold_in(rng0, s))
            return p, nbn, no, loss, s + 1

        return lazy_step

    if fold_rng:
        @partial(jax.jit, donate_argnums=(0, 2, 4))
        def step(params, bn, opt, batch, s, rng0):
            p, nbn, no, loss = flagship_update(
                params, bn, opt, batch, jax.random.fold_in(rng0, s),
                cfg=cfg, tx=tx, remat=remat,
            )
            return p, nbn, no, loss, s + 1
    else:
        @partial(jax.jit, donate_argnums=(0, 2))
        def step(params, bn, opt, batch, rng):
            return flagship_update(params, bn, opt, batch, rng,
                                   cfg=cfg, tx=tx, remat=remat)

    return step


def measure_windows(step, params, bn, opt, batch, rng0, *,
                    steps: int = MEASURE_STEPS, warmup: int = WARMUP_STEPS,
                    windows: int = 3, batch_size: int | None = None) -> float:
    """The canonical fold-rng measurement protocol, shared with the A/B
    harnesses in benchmarks/ so their loops cannot drift from the bench's
    (they already had: warmup counts and rng impls diverged — r4 review).

    ``step(params, bn, opt, batch, s, rng0) -> (params, bn, opt, loss, s)``
    (bench.make_flagship_step's fold_rng form). Each window ends with a
    loss VALUE fetch — the only true sync on this backend (RESULTS.md).
    Returns the median window rate in examples/s.
    """
    import statistics

    import jax.numpy as jnp

    B = batch_size if batch_size is not None else batch["user"].shape[0]
    s = jnp.zeros((), jnp.int32)
    for _ in range(warmup):
        params, bn, opt, loss, s = step(params, bn, opt, batch, s, rng0)
    float(loss)
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            params, bn, opt, loss, s = step(params, bn, opt, batch, s, rng0)
        float(loss)
        rates.append(steps * B / (time.perf_counter() - t0))
    return statistics.median(rates)


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp

    from hhrs_tpu.models.dcn import init_dcn

    dims, cfg, tx = flagship_setup()
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    opt = tx.init(params)

    nb = _np_batch(np.random.default_rng(0), BATCH)
    batch = {k: jnp.asarray(v) for k, v in nb.items()}

    # Per-step dispatch — the production default (train.fused_epoch=False):
    # on this image's tunneled TPU backend device-side loop iterations carry
    # a ~4ms fixed cost, so per-step async dispatch is the fast path. The
    # in-step fold_in rng (device-carried counter, the production trainer's
    # pattern) beat the per-step Python split in BOTH orders of the
    # corrected intra-process A/B (+1.1–1.5%, benchmarks/rng_ab.py) — the
    # Python-side split serializes a tiny host program into every dispatch.
    step = make_flagship_step(cfg, tx, fold_rng=True)

    # Hardware RBG dropout bits: threefry generates the [B, H] dropout masks
    # with a long vector-ALU chain that competes with the fused elementwise
    # pipeline; impl='rbg' lowers to one XLA RngBitGenerator pass on the
    # TPU's hardware generator. Won BOTH orders of the intra-process A/B:
    # 18.2–18.5M vs 14.2M ex/s, +28–30% (benchmarks/prng_ab.py, artifact
    # benchmarks/results/pending_ab/). Statistically equivalent bits, not
    # bit-identical to threefry — a throughput knob, same as the trainer's
    # opt-in train.rng_impl=rbg.
    rng0 = jax.random.key(1, impl="rbg")
    s = jnp.zeros((), jnp.int32)
    _PROGRESS.set_phase("warmup")
    _maybe_fake_hang("warmup")
    for _ in range(WARMUP_STEPS):
        params, bn, opt, loss, s = step(params, bn, opt, batch, s, rng0)
    float(loss)

    # Adaptive median-of-N windows against tunnel load fluctuation (round
    # 5 protocol — see the constants block). Each window ends by fetching
    # the loss VALUE: on this backend block_until_ready can return before
    # execution completes (measured: it reported impossible >1 PFLOP/s at
    # large batch), so only a D2H value fetch is a true sync. Its ~30ms
    # cost is amortized over MEASURE_STEPS (and makes the number slightly
    # conservative). A staged JSON line lands after EVERY window so a
    # mid-run kill still leaves the best-so-far median on stdout.
    import statistics

    rates: list[float] = []
    measure_t0 = time.monotonic()
    w = 0
    while True:
        w += 1
        _PROGRESS.set_phase(f"measure_window_{w}")
        _maybe_fake_hang(f"measure_window_{w}")
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            params, bn, opt, loss, s = step(params, bn, opt, batch, s, rng0)
        float(loss)
        rate = MEASURE_STEPS * BATCH / (time.perf_counter() - t0)
        rates.append(rate)
        _PROGRESS.add_window(rate)
        _PROGRESS.emit()
        if w < MIN_WINDOWS:
            continue
        if w >= MAX_WINDOWS:
            break
        # Stop early once the spread is tight — more windows would only
        # confirm a stable reading. Otherwise keep extending through the
        # noise, bounded by the measurement wall cap and by the global
        # budget (leave room for the torch baseline + final emit).
        spread = (max(rates) - min(rates)) / statistics.median(rates)
        if spread <= SPREAD_TARGET:
            break
        now = time.monotonic()
        if now - measure_t0 > MEASURE_WALL_S:
            break
        with _PROGRESS.lock:
            budget_left = _PROGRESS.deadline - now
        if budget_left < TORCH_RESERVE_S:
            break
    return statistics.median(rates)


def bench_torch_reference() -> float:
    """The reference stack's step (torch, single device) on the same config.

    The model is the shared torch oracle (hhrs_tpu/compat/torch_ref.py —
    the faithful replica of the reference DCN-R, train.py:90-170) so the
    baseline under measurement and the parity oracle cannot drift apart.
    """
    import torch
    import torch.nn as nn

    from hhrs_tpu.compat.torch_ref import TorchDCN
    from hhrs_tpu.config import ModelConfig
    from hhrs_tpu.models.dcn import ModelDims

    torch.manual_seed(0)
    dev = torch.device("cuda" if torch.cuda.is_available() else "cpu")

    model = TorchDCN(
        ModelDims(N_USERS, N_ITEMS, CAT_DIMS, N_NUM),
        ModelConfig(emb_dim=EMB_DIM, hidden_dim=HIDDEN, n_cross_layers=N_CROSS,
                    n_res_blocks=N_RES, dropout=DROPOUT),
    ).to(dev)
    optim = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    lossf = nn.BCEWithLogitsLoss()
    nb = _np_batch(np.random.default_rng(0), BATCH)
    u = torch.from_numpy(nb["user"]).long().to(dev)
    i = torch.from_numpy(nb["item"]).long().to(dev)
    c = torch.from_numpy(nb["cat"]).long().to(dev)
    n = torch.from_numpy(nb["num"]).to(dev)
    y = torch.from_numpy(nb["y"]).to(dev)

    def step():
        optim.zero_grad()
        loss = lossf(model(u, i, c, n), y)
        loss.backward()
        optim.step()
        return loss

    float(step())  # warmup; .item() is the sync (matters on CUDA hosts)
    # Median of 3 windows: a single 4-step timing let transient host load
    # swing vs_baseline 35-119x across otherwise-identical runs (r5) —
    # the denominator deserves the same robustness as the numerator.
    import statistics

    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(TORCH_STEPS):
            loss = step()
        float(loss)  # value fetch synchronizes async CUDA queues too
        rates.append(TORCH_STEPS * BATCH / (time.perf_counter() - t0))
    return statistics.median(rates)


def _torch_baseline_timeboxed():
    """Run the torch baseline in a daemon thread with a join timeout.

    torch-CPU shouldn't hang, but the final record must not depend on that:
    the JAX number is already on stdout before this runs, and a stuck
    baseline degrades to ``vs_baseline: null`` + an error note instead of
    eating the global budget."""
    result: dict = {}

    def run():
        try:
            result["eps"] = bench_torch_reference()
        except Exception as e:  # noqa: BLE001
            result["error"] = repr(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=TORCH_S)
    if t.is_alive():
        return None, f"torch baseline exceeded {TORCH_S:.0f}s"
    if "error" in result:
        # null, NOT 1.0: a failed baseline must be distinguishable from a
        # measured exact tie
        return None, result["error"]
    return result["eps"], None


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    _PROGRESS.set_phase("probe")
    platform = _probe_device()
    # Probe passed — the backend answers; commit to the full budget.
    _PROGRESS.set_phase("setup", deadline=_PROGRESS.t0 + BUDGET_S)
    print(f"probe ok: platform={platform} "
          f"({time.monotonic() - _PROGRESS.t0:.1f}s)", file=sys.stderr)

    jax_eps = bench_jax()

    # The JAX median is on stdout (staged emits); the baseline only refines
    # vs_baseline from here.
    _PROGRESS.set_phase("torch_baseline")
    # vs_baseline's denominator is host-CPU torch, so it is the one number a
    # busy host can silently corrupt (measured: a concurrent pytest suite
    # inflated vs_baseline 96x -> 527x while the device-bound numerator moved
    # <2%). Emit the 1-min load per core at baseline time so a reader of the
    # record can tell a starved denominator from a genuine ratio.
    with _PROGRESS.lock:
        _PROGRESS.host_load = round(os.getloadavg()[0] / (os.cpu_count() or 1), 2)
    torch_eps, torch_err = _torch_baseline_timeboxed()
    with _PROGRESS.lock:
        if torch_eps is not None:
            _PROGRESS.vs_baseline = round(jax_eps / torch_eps, 2)
        else:
            _PROGRESS.torch_error = torch_err

    with _PROGRESS.lock:
        if _PROGRESS.done:
            return  # watchdog claimed completion first; it owns the last line
        _PROGRESS.phase = "complete"
        _PROGRESS.done = True
    _PROGRESS.emit()


def _main_guarded():
    """The outage hardening must also cover RAISED errors, not just hangs:
    a remote-compile failure (HTTP 413 / mid-compile disconnect raising
    XlaRuntimeError — failure modes RESULTS.md documents) would otherwise
    exit with a traceback and NOTHING parseable on stdout."""
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — last line must be valid JSON
        with _PROGRESS.lock:
            claimed = _PROGRESS.done
            _PROGRESS.done = True
        if not claimed:
            _PROGRESS.emit(error=f"exception:{e!r:.300}")
        sys.stdout.flush()
        print(f"bench.py failed: {e!r}", file=sys.stderr)


if __name__ == "__main__":
    _main_guarded()
