"""A/B: f32 vs bf16 first-moment (mu) storage for dense Adam at big tables.

At production table sizes the dense optimizer's O(n_rows · d) sweep
dominates step bytes (measured: benchmarks/lazy_ab.py, RESULTS.md) — per
step it reads+writes every table row's param, mu, and nu. Storing mu in
bf16 (``train.moment_dtype=bfloat16`` → optax ``mu_dtype``) halves one of
those three r+w streams: ~17% less table traffic, with the update math
still f32 (optax casts up, accumulates, casts back; nu deliberately stays
f32 — it feeds 1/sqrt).

Protocol: the canonical one — both variants through
``bench.make_flagship_step`` / ``bench.measure_windows`` (batch as a jit
argument, fold_in rng, value-forced syncs, median of 3 windows),
back-to-back in one process, BOTH orders:

    python benchmarks/moment_ab.py fb --users 10000000
    python benchmarks/moment_ab.py bf --users 10000000
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import bench


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("order", nargs="?", default="fb",
                   help="f=f32 moments, b=bf16 mu; e.g. 'fb' then 'bf'")
    p.add_argument("--users", type=int, default=10_000_000)
    p.add_argument("--items", type=int, default=20_000)
    p.add_argument("--steps", type=int, default=100)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hhrs_tpu.models.dcn import init_dcn
    from hhrs_tpu.train.optimizers import make_optimizer

    bench.N_USERS, bench.N_ITEMS = args.users, args.items
    dims, cfg, _ = bench.flagship_setup()

    nb = bench._np_batch(np.random.default_rng(0), bench.BATCH)
    batch = {k: jnp.asarray(v) for k, v in nb.items()}

    def run(moment_dtype: str) -> float:
        tx = make_optimizer(bench.OPTIMIZER, bench.LR, bench.WD,
                            moment_dtype=moment_dtype)
        step = bench.make_flagship_step(cfg, tx, fold_rng=True)
        params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
        opt = tx.init(params)
        r0 = jax.random.key(1, impl="rbg")
        return bench.measure_windows(step, params, bn, opt, batch, r0,
                                     steps=args.steps, warmup=10)

    for c in args.order:
        md = "bfloat16" if c == "b" else "float32"
        rate = run(md)
        print(json.dumps({"metric": "moment_ab", "moment_dtype": md,
                          "users": args.users, "batch": bench.BATCH,
                          "ex_per_s": round(rate)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
