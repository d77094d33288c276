"""Back-to-back batch-size A/B of the bench.py flagship step in ONE process
(tunnel numbers are only comparable intra-process — RESULTS.md). Order is
passed as argv digits indexing BATCHES, e.g. '012' then '210' to cancel
drift. This is the measurement behind moving bench.py's default batch to
32768 (it clearly beats 16384 in both orders and is statistically tied
with 65536 at half the memory/compile; artifact
benchmarks/results/tpu_measurements_r2_late.json).

The step comes from ``bench.make_flagship_step`` — the bench's actual
program (batch as a jit argument), not a copy."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import bench

BATCHES = [16384, 32768, 65536]


def run(step, dims, cfg, tx, B, total_examples=200 * 16384):
    import jax
    import jax.numpy as jnp

    from hhrs_tpu.models.dcn import init_dcn

    nb = bench._np_batch(np.random.default_rng(0), B)
    batch = {k: jnp.asarray(v) for k, v in nb.items()}
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    opt = tx.init(params)
    # Match bench.py's ACTUAL flagship key impl (rbg since the prng A/B —
    # the batch trade-off is dispatch-vs-compute balance, which the 28-30%
    # faster rbg step shifts).
    rng0 = jax.random.key(1, impl="rbg")
    steps = max(50, total_examples // B)
    return bench.measure_windows(step, params, bn, opt, batch, rng0,
                                 steps=steps, warmup=20, batch_size=B)


if __name__ == "__main__":
    order = sys.argv[1] if len(sys.argv) > 1 else "012"
    dims, cfg, tx = bench.flagship_setup()
    step = bench.make_flagship_step(cfg, tx, fold_rng=True)  # bench's ACTUAL variant
    for c in order:
        B = BATCHES[int(c)]
        print(f"B={B}: {run(step, dims, cfg, tx, B) / 1e6:.3f}M ex/s", flush=True)
