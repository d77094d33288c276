"""Pallas kernel microbenchmarks vs. the jnp/XLA reference ops.

Usage: python benchmarks/kernels.py [--batch 4096]
Prints one JSON line per kernel with the speedup over the fused-by-XLA path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(f, *a, n=50):
    """Times n calls; syncs by fetching a VALUE (block_until_ready can
    return early on the tunneled backend — see RESULTS.md). The single D2H
    (~30ms) is amortized across n and reported cost is thus conservative."""
    import numpy as np

    float(np.asarray(f(*a)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(*a)
    float(np.asarray(y).ravel()[0])
    return (time.perf_counter() - t0) / n


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    args = p.parse_args(argv)
    interpret = jax.default_backend() != "tpu"

    from hhrs_tpu.config import ModelConfig
    from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
    from hhrs_tpu.ops.cross import cross_stack_apply, cross_stack_init
    from hhrs_tpu.ops.pallas.cross_kernel import cross_stack_pallas
    from hhrs_tpu.ops.pallas.tower_kernel import (
        build_x0, dcnr_tower_eval_pallas, fold_eval_params,
    )

    B = args.batch
    # Cross stack at production-ish width.
    cp = cross_stack_init(jax.random.PRNGKey(0), 4, 128)
    xb = jax.random.normal(jax.random.PRNGKey(1), (B, 128))
    t_ref = timeit(jax.jit(lambda p, x: cross_stack_apply(p, x, "code")), cp, xb)
    t_pal = timeit(jax.jit(lambda p, x: cross_stack_pallas(p, x, "code", interpret)), cp, xb)
    print(json.dumps({"kernel": "cross_stack", "jnp_us": round(t_ref * 1e6, 1),
                      "pallas_us": round(t_pal * 1e6, 1),
                      "speedup": round(t_ref / t_pal, 2)}))

    # Full eval tower.
    dims = ModelDims(100_000, 20_000, (("city", 64), ("hotel_type", 8)), 11)
    cfg = ModelConfig(emb_dim=16, hidden_dim=128, n_cross_layers=2, n_res_blocks=1)
    params, state = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    user = jax.random.randint(ks[0], (B,), 0, dims.n_users)
    item = jax.random.randint(ks[1], (B,), 0, dims.n_items)
    cat = jnp.stack([jax.random.randint(ks[2], (B,), 0, 64),
                     jax.random.randint(ks[2], (B,), 0, 8)], axis=1)
    num = jax.random.normal(ks[3], (B, 11))
    folded = fold_eval_params(params, state, eps=cfg.bn_eps)
    x0 = build_x0(params, user, item, cat, num)

    # params/state as jit ARGUMENTS on both sides — a closed-over table
    # lowers as an HLO constant and changes the measured program
    # (the protocol violation RESULTS.md documents; kernels_scaled.py
    # measures the same way).
    t_ref = timeit(jax.jit(
        lambda p_, s_, u, i, c, n: apply_dcn(p_, s_, u, i, c, n, cfg=cfg, train=False)[0]
    ), params, state, user, item, cat, num)
    t_pal = timeit(jax.jit(
        lambda f, x: dcnr_tower_eval_pallas(f, x, interpret=interpret)
    ), folded, x0)
    print(json.dumps({"kernel": "eval_tower", "jnp_full_us": round(t_ref * 1e6, 1),
                      "pallas_tower_us": round(t_pal * 1e6, 1),
                      "speedup_vs_full": round(t_ref / t_pal, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
