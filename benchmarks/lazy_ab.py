"""A/B: dense vs lazy (sparse-row) embedding-table updates vs table size.

The dense optimizer's table traffic is O(n_rows · d) per step (the gather's
gradient is a dense scatter-add, then Adam rewrites every row + both
moments); lazy mode (train/lazy.py) touches only the batch's rows. At the
bench's stock 100k users the dense table update is ~2% of step bytes — the
point of this harness is the PRODUCTION table regime (millions of rows),
where dense table traffic dominates the whole step.

Protocol: both variants via ``bench.make_flagship_step`` (batch as a jit
argument, fold_in rng), back-to-back in one process, value-forced syncs,
median of 3 windows, BOTH orders:

    python benchmarks/lazy_ab.py dl --users 10000000
    python benchmarks/lazy_ab.py ld --users 10000000
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import bench

STEPS = 100


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("order", nargs="?", default="dl",
                   help="d=dense, l=lazy; e.g. 'dl' then 'ld'")
    p.add_argument("--users", type=int, default=10_000_000)
    p.add_argument("--items", type=int, default=20_000)
    p.add_argument("--steps", type=int, default=STEPS)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hhrs_tpu.models.dcn import init_dcn
    from hhrs_tpu.train.lazy import init_lazy_opt

    # flagship config, table sizes overridden
    bench.N_USERS, bench.N_ITEMS = args.users, args.items
    dims, cfg, tx = bench.flagship_setup()

    # bench.N_USERS/N_ITEMS were overridden above, so _np_batch already
    # draws ids spanning the big tables (no cache-toy id range)
    nb = bench._np_batch(np.random.default_rng(0), bench.BATCH)
    batch = {k: jnp.asarray(v) for k, v in nb.items()}

    def run(lazy: bool) -> float:
        step = bench.make_flagship_step(cfg, tx, fold_rng=True, lazy=lazy)
        params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
        opt = init_lazy_opt(tx, params) if lazy else tx.init(params)
        r0 = jax.random.key(1, impl="rbg")  # the flagship's key impl
        rate = bench.measure_windows(step, params, bn, opt, batch, r0,
                                     steps=args.steps, warmup=10)
        # measure_windows consumed its local references; the big tables are
        # freed when the jitted step's donated outputs go out of scope here
        return rate

    for c in args.order:
        lazy = c == "l"
        rate = run(lazy)
        print(json.dumps({"metric": "lazy_ab", "variant": "lazy" if lazy else "dense",
                          "users": args.users, "batch": bench.BATCH,
                          "ex_per_s": round(rate)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
