"""Roofline / speed-of-light analysis of the flagship train step.

The north star demands hot paths at speed-of-light — this script shows
WHERE the light is for the bench.py flagship config (DCN-R emb16/h128,
B=16384, bf16): XLA's own cost model (flops + bytes accessed per compiled
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
from functools import partial
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
    """The bench.py flagship train step (same model/optimizer/batch)."""
    import jax
    import jax.numpy as jnp

    from hhrs_tpu.config import ModelConfig
    from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
    from hhrs_tpu.train.metrics import bce_with_logits
    from hhrs_tpu.train.optimizers import make_optimizer

    dims = ModelDims(bench.N_USERS, bench.N_ITEMS, bench.CAT_DIMS, bench.N_NUM)
    cfg = ModelConfig(
        emb_dim=bench.EMB_DIM, hidden_dim=bench.HIDDEN,
        n_cross_layers=bench.N_CROSS, n_res_blocks=bench.N_RES,
        dropout=0.6, compute_dtype="bfloat16",
    )
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    tx = make_optimizer("adamw", 1e-3, 1e-4)
    opt = tx.init(params)
    nb = bench._np_batch(np.random.default_rng(0), bench.BATCH)
    batch = {k: jnp.asarray(v) for k, v in nb.items()}

    @partial(jax.jit, donate_argnums=(0, 2))
    def step(params, bn, opt, batch, rng):
        def loss_fn(p):
            logits, nbn = apply_dcn(
                p, bn, batch["user"], batch["item"], batch["cat"], batch["num"],
                cfg=cfg, train=True, rng=rng,
            )
            return bce_with_logits(logits, batch["y"]), nbn

        (loss, nbn), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, no = tx.update(g, opt, params)
        return jax.tree.map(lambda a, u: a + u, params, up), nbn, no, loss

    return step, (params, bn, opt, batch)


def cost_analysis(step, args):
    import jax

    lowered = step.lower(*args, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def measure_eps(step, args) -> float:
    import jax

    params, bn, opt, batch = args
    rng = jax.random.PRNGKey(1)
    for _ in range(10):
        rng, k = jax.random.split(rng)
        params, bn, opt, loss = step(params, bn, opt, batch, k)
    float(loss)
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        rng, k = jax.random.split(rng)
        params, bn, opt, loss = step(params, bn, opt, batch, k)
    float(loss)  # value fetch — the only true sync on the tunneled backend
    return n * bench.BATCH / (time.perf_counter() - t0)


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
    eps = args.eps or 11.5e6  # RESULTS.md headline (real chip, B=16384)
    if args.measure:
        eps = measure_eps(step, sargs)

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
