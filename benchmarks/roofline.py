"""Roofline / speed-of-light analysis of the flagship train step.

The north star demands hot paths at speed-of-light — this script shows
WHERE the light is for the bench.py flagship config (DCN-R emb16/h128,
B=32768, bf16): XLA's own cost model (flops + bytes accessed per compiled
step) combined with the measured examples/s gives achieved FLOP/s and
HBM traffic, their fraction of peak for known TPU generations, and the
arithmetic intensity vs. each generation's ridge point.

The reference has no analogue (no benchmarks/ at all — SURVEY.md §6);
this is our own honesty tool: it quantifies that the flagship step is a
LATENCY/BANDWIDTH workload (~359 KFLOP/example per the TPU compiler's
cost model, AI ≈ 5.6 FLOP/B — far under every ridge point), so the
right optimizations are the ones the trainer already does (donated
buffers, zero per-step transfers, async dispatch) rather than MXU work.

Usage:
  python benchmarks/roofline.py                # analyze; use RESULTS.md eps
  python benchmarks/roofline.py --eps 1.15e7   # supply a measured rate
  python benchmarks/roofline.py --measure      # time the step live first
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # the flagship config constants — shared so they cannot drift

# Public peak specs (bf16 matmul FLOP/s, HBM bytes/s) per TPU generation.
PEAKS = {
    "v4": (275e12, 1.23e12),
    "v5e": (197e12, 0.82e12),
    "v5p": (459e12, 2.77e12),
    "v6e": (918e12, 1.64e12),
}


def build_step():
    """The bench.py flagship train step — built via the SHARED factory
    (bench.flagship_setup/make_flagship_step, fold_rng like bench.py),
    so the analyzed program IS the headline program, not a drifted copy."""
    import jax
    import jax.numpy as jnp

    from hhrs_tpu.models.dcn import init_dcn

    dims, cfg, tx = bench.flagship_setup()
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    opt = tx.init(params)
    nb = bench._np_batch(np.random.default_rng(0), bench.BATCH)
    batch = {k: jnp.asarray(v) for k, v in nb.items()}
    step = bench.make_flagship_step(cfg, tx, fold_rng=True)
    s0 = jnp.zeros((), jnp.int32)
    # the flagship key IS rbg (bench.bench_jax) — a threefry key here
    # would analyze a program with the long dropout-bit chain the
    # headline step no longer runs (r4 review finding)
    return step, (params, bn, opt, batch, s0, jax.random.key(1, impl='rbg'))


def cost_analysis(step, args):
    # args already include the step counter and rng0
    lowered = step.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def measure_eps(step, args) -> float:
    """Median of 3 windows (the repo's timing protocol vs tunnel load
    fluctuation), value-forced syncs."""
    params, bn, opt, batch, s0, rng0 = args
    for _ in range(10):
        params, bn, opt, loss, s0 = step(params, bn, opt, batch, s0, rng0)
    float(loss)
    rates = []
    n = 50
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            params, bn, opt, loss, s0 = step(params, bn, opt, batch, s0, rng0)
        float(loss)  # value fetch — the only true sync on the tunneled backend
        rates.append(n * bench.BATCH / (time.perf_counter() - t0))
    return sorted(rates)[1]


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--eps", type=float, default=None,
                   help="measured examples/s (default: RESULTS.md headline)")
    p.add_argument("--measure", action="store_true",
                   help="time the step on the current backend first")
    args = p.parse_args()

    step, sargs = build_step()
    flops, bytes_acc = cost_analysis(step, sargs)
    B = bench.BATCH
    if args.measure and args.eps is not None:
        p.error("--measure and --eps are mutually exclusive")
    if args.measure:
        eps = measure_eps(step, sargs)
    else:
        eps = args.eps or 14.0e6  # RESULTS.md headline (real chip, B=32768)

    steps_per_s = eps / B
    out = {
        "batch": B,
        "flops_per_step": flops,
        "flops_per_example": flops / B,
        "bytes_per_step": bytes_acc,
        "arithmetic_intensity_flop_per_byte": flops / max(bytes_acc, 1.0),
        "examples_per_s": eps,
        "achieved_tflops": flops * steps_per_s / 1e12,
        "achieved_hbm_gbps": bytes_acc * steps_per_s / 1e9,
        "step_time_ms": 1e3 / steps_per_s,
    }
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))
    ai = out["arithmetic_intensity_flop_per_byte"]
    print(f"\nflagship step: {flops / B / 1e3:.1f} KFLOP/example, "
          f"{bytes_acc / B:.0f} B/example, AI = {ai:.2f} FLOP/B")
    for gen, (pf, pb) in PEAKS.items():
        ridge = pf / pb
        bound = "HBM-bound" if ai < ridge else "MXU-bound"
        sol_ms = max(flops / pf, bytes_acc / pb) * 1e3
        print(f"  {gen:4s}: {out['achieved_tflops'] / pf * 1e12 * 100:5.2f}% MXU, "
              f"{out['achieved_hbm_gbps'] / pb * 1e9 * 100:5.2f}% HBM "
              f"(ridge {ridge:.0f} FLOP/B → {bound}; "
              f"hardware speed-of-light step ≈ {sol_ms:.3f} ms "
              f"vs measured {out['step_time_ms']:.3f} ms)")


if __name__ == "__main__":
    main()
