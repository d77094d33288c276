"""A/B: f32 vs bf16 ACTIVATION STORAGE (model.storage_dtype) on the
flagship train step.

The roofline (benchmarks/roofline.py, RESULTS.md) puts the step at ~72%
of a v5e's HBM peak and ≤2% of any MXU: activation bytes — the [B, ·]
tensors XLA materializes between fusions plus the residuals autodiff
saves for the backward — are the binding resource. storage_dtype=bf16
halves those bytes (BN statistics and logits stay f32; params/opt
moments stay f32 throughout). Like rng_impl=rbg this is a throughput
knob, statistically equivalent but not bit-identical to f32 storage.

Protocol (RESULTS.md): both variants via ``bench.make_flagship_step``
(batch as a jit ARGUMENT, fold_in rng, rbg dropout bits — the bench's
actual program), back-to-back in one process, value-forced syncs,
median of 3 windows, BOTH orders:

    python benchmarks/storage_ab.py fb && python benchmarks/storage_ab.py bf
"""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import bench

STEPS = 200


def run(dims, cfg, tx, storage: str, hidden: int | None = None,
        n_res: int | None = None) -> float:
    import jax
    import jax.numpy as jnp

    from hhrs_tpu.models.dcn import init_dcn

    cfg = dataclasses.replace(cfg, storage_dtype=storage)
    if hidden is not None:
        cfg = dataclasses.replace(cfg, hidden_dim=hidden)
    if n_res is not None:
        cfg = dataclasses.replace(cfg, n_res_blocks=n_res)
    step = bench.make_flagship_step(cfg, tx, fold_rng=True)
    nb = bench._np_batch(np.random.default_rng(0), bench.BATCH)
    batch = {k: jnp.asarray(v) for k, v in nb.items()}
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    opt = tx.init(params)
    rng0 = jax.random.key(1, impl="rbg")
    return bench.measure_windows(step, params, bn, opt, batch, rng0,
                                 steps=STEPS, warmup=20)


if __name__ == "__main__":
    # usage: storage_ab.py [fb|bf] [--hidden H] [--res R]
    # --hidden/--res rescale the deep tower (the activations the knob
    # halves) to check how the win grows with width.
    order = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "fb"
    if not (order and set(order) <= {"f", "b"}):
        sys.exit(f"usage: storage_ab.py [fb|bf] [--hidden H] [--res R] (got {order!r})")
    hidden = int(sys.argv[sys.argv.index("--hidden") + 1]) if "--hidden" in sys.argv else None
    n_res = int(sys.argv[sys.argv.index("--res") + 1]) if "--res" in sys.argv else None
    dims, cfg, tx = bench.flagship_setup()
    names = {"f": "float32", "b": "bfloat16"}
    suffix = "" if hidden is None and n_res is None else (
        "  (hidden=%s res=%s)" % (hidden or cfg.hidden_dim, n_res or cfg.n_res_blocks))
    for c in order:
        print("storage %s: %.3fM ex/s%s"
              % (names[c], run(dims, cfg, tx, names[c], hidden, n_res) / 1e6, suffix))
