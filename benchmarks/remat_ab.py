"""A/B: the bench flagship step with vs without jax.checkpoint (remat) on
the forward pass.

Motivation (RESULTS.md roofline): the step is HBM-bound — ≤2% of any MXU's
peak but ~72% of a v5e's HBM bandwidth at B=32768 — so recomputing the
forward in the backward pass (FLOPs are free) instead of writing+reading
saved activations (bytes are not) could beat the current headline.

Protocol: both variants built by ``bench.make_flagship_step`` (batch as a
jit ARGUMENT, fold_in rng — the bench's actual program), run back-to-back
in one process, value-forced syncs, median of 3 windows. Run BOTH orders:

    python benchmarks/remat_ab.py br   # baseline then remat
    python benchmarks/remat_ab.py rb   # remat then baseline

Also asserts bit-identical losses between the variants at a small shape
first (same ops, same rng replayed — remat must not change numerics).
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


def _batch(n=None):
    import jax.numpy as jnp

    nb = bench._np_batch(np.random.default_rng(0), n or bench.BATCH)
    return {k: jnp.asarray(v) for k, v in nb.items()}


def check_numerics(dims, cfg, tx):
    """Remat must be a pure performance knob: losses bit-equal for 5 steps."""
    import jax
    import jax.numpy as jnp

    batch = _batch(1024)
    losses = {}
    for remat in (False, True):
        step = bench.make_flagship_step(cfg, tx, fold_rng=True, remat=remat)
        params, bn, opt = _fresh(dims, cfg, tx)
        s = jnp.zeros((), jnp.int32)
        rng0 = jax.random.PRNGKey(1)
        ls = []
        for _ in range(5):
            params, bn, opt, loss, s = step(params, bn, opt, batch, s, rng0)
            ls.append(float(loss))
        losses[remat] = ls
    assert losses[False] == losses[True], (losses[False], losses[True])
    print("numerics: bit-identical over 5 steps ✓")


def run(dims, cfg, tx, remat):
    import jax
    import jax.numpy as jnp

    step = bench.make_flagship_step(cfg, tx, fold_rng=True, remat=remat)
    batch = _batch()
    params, bn, opt = _fresh(dims, cfg, tx)
    rng0 = jax.random.key(1, impl="rbg")  # the flagship's key impl
    return bench.measure_windows(step, params, bn, opt, batch, rng0,
                                 steps=STEPS, warmup=20)


if __name__ == "__main__":
    order = sys.argv[1] if len(sys.argv) > 1 else "br"
    dims, cfg, tx = bench.flagship_setup()
    check_numerics(dims, cfg, tx)
    for c in order:
        if c == "b":
            print("baseline: %.3fM ex/s" % (run(dims, cfg, tx, False) / 1e6))
        else:
            print("remat:    %.3fM ex/s" % (run(dims, cfg, tx, True) / 1e6))
