"""A/B: threefry (JAX default) vs the TPU hardware RBG PRNG for the
flagship train step's in-step randomness (dropout masks + fold_in).

At the flagship config the step draws a fresh dropout mask over
[B=32768, H=128] per res block at rate 0.6 — threefry generates those
bits with a long ALU chain, while ``impl='rbg'`` uses the TPU's hardware
random-bit generator (one pass, XLA `RngBitGenerator`). The step is
HBM/dispatch-bound (RESULTS.md roofline), so the win is bounded, but
threefry's bits are pure vector-unit work that competes with the fused
elementwise pipeline.

Numerics: the two variants draw DIFFERENT (statistically equivalent)
dropout masks — this is a throughput knob like the batch size, not a
bit-parity one. Params init is threefry in both variants; only the
in-step key impl differs.

Protocol (RESULTS.md): both variants via ``bench.make_flagship_step``
(batch as a jit ARGUMENT, fold_in rng), back-to-back in one process,
value-forced syncs, median of 3 windows, BOTH orders:

    python benchmarks/prng_ab.py tr && python benchmarks/prng_ab.py rt
"""
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


def run(dims, cfg, tx, impl: str) -> float:
    import jax
    import jax.numpy as jnp

    step = bench.make_flagship_step(cfg, tx, fold_rng=True)
    batch = _batch()
    params, bn, opt = _fresh(dims, cfg, tx)
    rng0 = jax.random.key(1, impl=impl)  # typed key; fold_in/bernoulli dispatch on it
    return bench.measure_windows(step, params, bn, opt, batch, rng0,
                                 steps=STEPS, warmup=20)


if __name__ == "__main__":
    order = sys.argv[1] if len(sys.argv) > 1 else "tr"
    dims, cfg, tx = bench.flagship_setup()
    names = {"t": "threefry2x32", "r": "rbg"}
    for c in order:
        print("%s: %.3fM ex/s" % (names[c], run(dims, cfg, tx, names[c]) / 1e6))
