"""Multi-step-per-dispatch A/B: one jitted program running K statically
UNROLLED train steps (distinct dynamic_slice batches from a resident epoch
buffer, like the production trainer) vs K single-step dispatches.

Motivation: the roofline gap (measured 2.95ms/step at B=32768 vs ~2.1ms
v5e speed-of-light) is dispatch/latency, not compute — if per-dispatch
overhead is real, K steps per dispatch amortize it. NOT lax.scan: device
loop iterations cost ~4ms each on this tunnel (RESULTS.md); a static
unroll is one straight-line executable.

Run both orders ('u1 u4 u8' then reversed) in one process — tunnel
numbers are only comparable intra-process."""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import bench
from hhrs_tpu.config import ModelConfig
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
from hhrs_tpu.train.metrics import bce_with_logits
from hhrs_tpu.train.optimizers import make_optimizer

jax.config.update("jax_compilation_cache_dir", "/tmp/hhrs_jax_cache")

B = bench.BATCH
N_RES_ROWS = 4 * B  # resident pool the unrolled steps slice from
dims = ModelDims(bench.N_USERS, bench.N_ITEMS, bench.CAT_DIMS, bench.N_NUM)
cfg = ModelConfig(emb_dim=bench.EMB_DIM, hidden_dim=bench.HIDDEN,
                  n_cross_layers=bench.N_CROSS, n_res_blocks=bench.N_RES,
                  dropout=0.6, compute_dtype="bfloat16")
tx = make_optimizer("adamw", 1e-3, 1e-4)

pool_np = bench._np_batch(np.random.default_rng(0), N_RES_ROWS)
POOL = {k: jnp.asarray(v) for k, v in pool_np.items()}


def one_step(params, bn, opt, data, s, rng0):
    """One train step on rows [s*B, (s+1)*B) of the resident pool."""
    off = (s % (N_RES_ROWS // B)) * B
    batch = {k: jax.lax.dynamic_slice_in_dim(v, off, B) for k, v in data.items()}
    rng = jax.random.fold_in(rng0, s)

    def loss_fn(p):
        logits, nbn = apply_dcn(p, bn, batch["user"], batch["item"],
                                batch["cat"], batch["num"], cfg=cfg,
                                train=True, rng=rng)
        return bce_with_logits(logits, batch["y"]), nbn

    (loss, nbn), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    up, no = tx.update(g, opt, params)
    return jax.tree.map(lambda a, u: a + u, params, up), nbn, no, loss


def make_stepk(k):
    @partial(jax.jit, donate_argnums=(0, 2, 3), static_argnames=())
    def stepk(params, bn, opt, s, data, rng0):
        loss = jnp.zeros((), jnp.float32)
        for _ in range(k):  # static unroll — one straight-line program
            params, bn, opt, loss = one_step(params, bn, opt, data, s, rng0)
            s = s + 1
        return params, bn, opt, s, loss

    return stepk


def run(k, total_steps=200):
    stepk = make_stepk(k)
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    opt = tx.init(params)
    s = jnp.zeros((), jnp.int32)
    rng0 = jax.random.PRNGKey(1)
    for _ in range(max(2, 20 // k)):
        params, bn, opt, s, loss = stepk(params, bn, opt, s, POOL, rng0)
    float(loss)
    rates = []
    n_disp = total_steps // k
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_disp):
            params, bn, opt, s, loss = stepk(params, bn, opt, s, POOL, rng0)
        float(loss)
        rates.append(n_disp * k * B / (time.perf_counter() - t0))
    return sorted(rates)[1]


if __name__ == "__main__":
    ks = [int(a) for a in (sys.argv[1:] or ["1", "4", "8"])]
    for k in ks:
        print(f"K={k}: {run(k) / 1e6:.3f}M ex/s", flush=True)
