"""Multi-step-per-dispatch A/B: one jitted program running K statically
UNROLLED train steps (distinct dynamic_slice batches from a resident epoch
buffer, like the production trainer) vs K single-step dispatches.

Motivation: the roofline gap (measured 2.95ms/step at B=32768 vs ~2.1ms
v5e speed-of-light) is dispatch/latency, not compute — if per-dispatch
overhead were real, K steps per dispatch would amortize it. NOT lax.scan:
device loop iterations cost ~4ms each on this tunnel (RESULTS.md); a
static unroll is one straight-line executable.

Measured verdict (RESULTS.md): order-consistent gain only ~+1.3% — async
dispatch already pipelines single-step programs; REJECTED.

The inner update is ``bench.flagship_update`` — the bench's actual
program body. Run both orders ('1 4 8' then '8 4 1') in one process."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from functools import partial

import numpy as np

import bench

DIMS, CFG, TX = bench.flagship_setup()
B = bench.BATCH
N_RES_ROWS = 4 * B  # resident pool the unrolled steps slice from


def _pool():
    import jax.numpy as jnp

    nb = bench._np_batch(np.random.default_rng(0), N_RES_ROWS)
    return {k: jnp.asarray(v) for k, v in nb.items()}


def one_step(params, bn, opt, data, s, rng0):
    """One flagship update on rows [s*B, (s+1)*B) of the resident pool."""
    import jax

    off = (s % (N_RES_ROWS // B)) * B
    batch = {k: jax.lax.dynamic_slice_in_dim(v, off, B) for k, v in data.items()}
    return bench.flagship_update(
        params, bn, opt, batch, jax.random.fold_in(rng0, s), cfg=CFG, tx=TX
    )


def make_stepk(k):
    import jax

    @partial(jax.jit, donate_argnums=(0, 2, 3))
    def stepk(params, bn, opt, s, data, rng0):
        import jax.numpy as jnp

        loss = jnp.zeros((), jnp.float32)
        for _ in range(k):  # static unroll — one straight-line program
            params, bn, opt, loss = one_step(params, bn, opt, data, s, rng0)
            s = s + 1
        return params, bn, opt, s, loss

    return stepk


def run(k, total_steps=200):
    import jax
    import jax.numpy as jnp

    from hhrs_tpu.models.dcn import init_dcn

    pool = _pool()
    stepk = make_stepk(k)
    params, bn = init_dcn(jax.random.PRNGKey(0), DIMS, CFG)
    opt = TX.init(params)
    s = jnp.zeros((), jnp.int32)
    rng0 = jax.random.PRNGKey(1)
    for _ in range(max(2, 20 // k)):
        params, bn, opt, s, loss = stepk(params, bn, opt, s, pool, rng0)
    float(loss)
    rates = []
    n_disp = total_steps // k
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_disp):
            params, bn, opt, s, loss = stepk(params, bn, opt, s, pool, rng0)
        float(loss)
        rates.append(n_disp * k * B / (time.perf_counter() - t0))
    return sorted(rates)[1]


if __name__ == "__main__":
    ks = [int(a) for a in (sys.argv[1:] or ["1", "4", "8"])]
    for k in ks:
        print(f"K={k}: {run(k) / 1e6:.3f}M ex/s", flush=True)
