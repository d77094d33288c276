"""A/B: per-step Python-side jax.random.split (current bench.py) vs the
production trainer's in-step fold_in with a device-carried counter.

Run both orders ('sf' and 'fs'); measured result (RESULTS.md, artifact
benchmarks/results/tpu_measurements_r2_late.json): whichever variant runs
FIRST wins ~10% — drift, not mechanism — so bench.py keeps the split."""
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

dims = ModelDims(bench.N_USERS, bench.N_ITEMS, bench.CAT_DIMS, bench.N_NUM)
cfg = ModelConfig(emb_dim=bench.EMB_DIM, hidden_dim=bench.HIDDEN,
                  n_cross_layers=bench.N_CROSS, n_res_blocks=bench.N_RES,
                  dropout=0.6, compute_dtype="bfloat16")
tx = make_optimizer("adamw", 1e-3, 1e-4)
nb = bench._np_batch(np.random.default_rng(0), bench.BATCH)
batch = {k: jnp.asarray(v) for k, v in nb.items()}
STEPS = 200


def fresh():
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    return params, bn, tx.init(params)


def loss_and_updates(params, bn, opt, rng):
    def loss_fn(p):
        logits, nbn = apply_dcn(p, bn, batch["user"], batch["item"],
                                batch["cat"], batch["num"], cfg=cfg,
                                train=True, rng=rng)
        return bce_with_logits(logits, batch["y"]), nbn

    (loss, nbn), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    up, no = tx.update(g, opt, params)
    return jax.tree.map(lambda a, u: a + u, params, up), nbn, no, loss


@partial(jax.jit, donate_argnums=(0, 2))
def step_split(params, bn, opt, batch_, rng):
    return loss_and_updates(params, bn, opt, rng)


@partial(jax.jit, donate_argnums=(0, 2, 3))
def step_fold(params, bn, opt, s, rng0):
    p, nbn, no, loss = loss_and_updates(params, bn, opt,
                                        jax.random.fold_in(rng0, s))
    return p, nbn, no, loss, s + 1


def run_split():
    params, bn, opt = fresh()
    rng = jax.random.PRNGKey(1)
    for _ in range(20):
        rng, k = jax.random.split(rng)
        params, bn, opt, loss = step_split(params, bn, opt, batch, k)
    float(loss)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            rng, k = jax.random.split(rng)
            params, bn, opt, loss = step_split(params, bn, opt, batch, k)
        float(loss)
        rates.append(STEPS * bench.BATCH / (time.perf_counter() - t0))
    return sorted(rates)[1]


def run_fold():
    params, bn, opt = fresh()
    rng0 = jax.random.PRNGKey(1)
    s = jnp.zeros((), jnp.int32)
    for _ in range(20):
        params, bn, opt, loss, s = step_fold(params, bn, opt, s, rng0)
    float(loss)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            params, bn, opt, loss, s = step_fold(params, bn, opt, s, rng0)
        float(loss)
        rates.append(STEPS * bench.BATCH / (time.perf_counter() - t0))
    return sorted(rates)[1]


if __name__ == "__main__":
    order = sys.argv[1] if len(sys.argv) > 1 else "sf"
    for c in order:
        if c == "s":
            print("split: %.3fM ex/s" % (run_split() / 1e6))
        else:
            print("fold:  %.3fM ex/s" % (run_fold() / 1e6))
