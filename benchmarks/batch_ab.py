"""Back-to-back batch-size A/B of the bench.py flagship step in ONE process
(tunnel numbers are only comparable intra-process — RESULTS.md). Order is
passed as argv digits indexing BATCHES, e.g. '012' then '210' to cancel
drift. This is the measurement behind moving bench.py's default batch to
32768 (both-orders winner over 16384 and 65536; artifact
benchmarks/results/tpu_measurements_r2_late.json)."""
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

BATCHES = [16384, 32768, 65536]
dims = ModelDims(bench.N_USERS, bench.N_ITEMS, bench.CAT_DIMS, bench.N_NUM)
cfg = ModelConfig(emb_dim=bench.EMB_DIM, hidden_dim=bench.HIDDEN,
                  n_cross_layers=bench.N_CROSS, n_res_blocks=bench.N_RES,
                  dropout=0.6, compute_dtype="bfloat16")
tx = make_optimizer("adamw", 1e-3, 1e-4)


@partial(jax.jit, donate_argnums=(0, 2))
def step(params, bn, opt, batch, rng):
    def loss_fn(p):
        logits, nbn = apply_dcn(p, bn, batch["user"], batch["item"],
                                batch["cat"], batch["num"], cfg=cfg,
                                train=True, rng=rng)
        return bce_with_logits(logits, batch["y"]), nbn

    (loss, nbn), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    up, no = tx.update(g, opt, params)
    return jax.tree.map(lambda a, u: a + u, params, up), nbn, no, loss


def run(B, steps):
    nb = bench._np_batch(np.random.default_rng(0), B)
    batch = {k: jnp.asarray(v) for k, v in nb.items()}
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    opt = tx.init(params)
    rng = jax.random.PRNGKey(1)
    for _ in range(10):
        rng, k = jax.random.split(rng)
        params, bn, opt, loss = step(params, bn, opt, batch, k)
    float(loss)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            rng, k = jax.random.split(rng)
            params, bn, opt, loss = step(params, bn, opt, batch, k)
        float(loss)
        rates.append(steps * B / (time.perf_counter() - t0))
    return sorted(rates)[1]


if __name__ == "__main__":
    order = sys.argv[1] if len(sys.argv) > 1 else "012"
    for c in order:
        B = BATCHES[int(c)]
        steps = max(50, 200 * 16384 // B)
        print(f"B={B}: {run(B, steps) / 1e6:.3f}M ex/s", flush=True)
