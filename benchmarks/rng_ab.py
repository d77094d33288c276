"""A/B: per-step Python-side jax.random.split (the bench.py default) vs the
production trainer's in-step fold_in with a device-carried counter.

Both variants are built by ``bench.make_flagship_step`` (batch as a jit
ARGUMENT — the bench's documented measurement protocol), so this measures
the bench's actual program, not a drifted copy.

Run both orders ('sf' and 'fs'). History (RESULTS.md, artifact
benchmarks/results/tpu_measurements_r2_late.json): the FIRST version of
this harness closed over the batch (a protocol violation a review caught
— HLO-constant batches) and read pure order drift; under the corrected
batch-as-argument protocol fold wins BOTH orders (+1.1–1.5%), so bench.py
now uses the fold step — the production trainer's pattern."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import bench

STEPS = 200


def _fresh(dims, cfg, tx):
    import jax

    from hhrs_tpu.models.dcn import init_dcn

    params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    return params, bn, tx.init(params)


def _batch():
    import jax.numpy as jnp

    nb = bench._np_batch(np.random.default_rng(0), bench.BATCH)
    return {k: jnp.asarray(v) for k, v in nb.items()}


def run_split(dims, cfg, tx):
    import jax

    step = bench.make_flagship_step(cfg, tx)
    batch = _batch()
    params, bn, opt = _fresh(dims, cfg, tx)
    rng = jax.random.PRNGKey(1)
    for _ in range(20):
        rng, k = jax.random.split(rng)
        params, bn, opt, loss = step(params, bn, opt, batch, k)
    float(loss)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            rng, k = jax.random.split(rng)
            params, bn, opt, loss = step(params, bn, opt, batch, k)
        float(loss)
        rates.append(STEPS * bench.BATCH / (time.perf_counter() - t0))
    return sorted(rates)[1]


def run_fold(dims, cfg, tx):
    import jax
    import jax.numpy as jnp

    step = bench.make_flagship_step(cfg, tx, fold_rng=True)
    batch = _batch()
    params, bn, opt = _fresh(dims, cfg, tx)
    rng0 = jax.random.PRNGKey(1)
    s = jnp.zeros((), jnp.int32)
    for _ in range(20):
        params, bn, opt, loss, s = step(params, bn, opt, batch, s, rng0)
    float(loss)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            params, bn, opt, loss, s = step(params, bn, opt, batch, s, rng0)
        float(loss)
        rates.append(STEPS * bench.BATCH / (time.perf_counter() - t0))
    return sorted(rates)[1]


if __name__ == "__main__":
    order = sys.argv[1] if len(sys.argv) > 1 else "sf"
    dims, cfg, tx = bench.flagship_setup()
    for c in order:
        if c == "s":
            print("split: %.3fM ex/s" % (run_split(dims, cfg, tx) / 1e6))
        else:
            print("fold:  %.3fM ex/s" % (run_fold(dims, cfg, tx) / 1e6))
