"""Kernel honesty pass at SCALED serve shapes (VERDICT r1 item 8).

Round 1 measured the fused eval tower at reference scale (H=128, B=16k)
where it barely beat XLA (1.08x). This benchmark re-measures at the scaled
config the kernel was built for — catalog-sized candidate axes (100k rows)
and production widths (H>=512) — and also breaks out the gather+concat
front half (build_x0) so the SURVEY §7.7 "fused lookup+concat kernel" idea
can be judged from data: if the gathers are a small fraction of the tower,
fusing them can't pay.

One process, value-forced syncs (RESULTS.md tunnel caveat).
Usage: python benchmarks/kernels_scaled.py [--rows 98304] [--hidden 512]
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


from kernels import timeit  # noqa: E402 — one value-sync timing protocol


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=98304)  # candidate axis (384*256)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--emb", type=int, default=64)
    p.add_argument("--n-res", type=int, default=2)
    p.add_argument("--n-cross", type=int, default=4)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)
    interpret = jax.default_backend() != "tpu"

    from hhrs_tpu.config import ModelConfig
    from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
    from hhrs_tpu.ops.pallas.tower_kernel import (
        build_x0, dcnr_tower_eval_pallas, fold_eval_params,
    )
    from hhrs_tpu.utils.logging import enable_compilation_cache

    enable_compilation_cache()
    B = args.rows
    dims = ModelDims(1_000_000, 200_000, (("city", 64), ("hotel_type", 8)), 11)
    cfg = ModelConfig(emb_dim=args.emb, hidden_dim=args.hidden,
                      n_cross_layers=args.n_cross, n_res_blocks=args.n_res)
    params, state = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    user = jax.random.randint(ks[0], (B,), 0, dims.n_users)
    item = jax.random.randint(ks[1], (B,), 0, dims.n_items)
    cat = jnp.stack([jax.random.randint(ks[2], (B,), 0, 64),
                     jax.random.randint(ks[2], (B,), 0, 8)], axis=1)
    num = jax.random.normal(ks[3], (B, 11))
    folded = fold_eval_params(params, state, eps=cfg.bn_eps)
    x0 = build_x0(params, user, item, cat, num)
    d_in = x0.shape[1]

    n = args.iters
    # Params/folded pass as jit ARGUMENTS: a closed-over million-row table
    # becomes an HLO constant, which this tunnel's remote-compile endpoint
    # rejects (HTTP 413) — and constants skew compile time anyway.
    # 1. end-to-end: gathers + tower, XLA vs (XLA gathers + pallas tower)
    t_full = timeit(jax.jit(
        lambda p, s, u, i, c, m: apply_dcn(p, s, u, i, c, m, cfg=cfg, train=False)[0]
    ), params, state, user, item, cat, num, n=n)
    t_hybrid = timeit(jax.jit(
        lambda p, f, u, i, c, m: dcnr_tower_eval_pallas(
            f, build_x0(p, u, i, c, m), interpret=interpret)
    ), params, folded, user, item, cat, num, n=n)
    # 2. breakdown: gather+concat half alone; tower halves alone
    t_x0 = timeit(jax.jit(lambda p, u, i, c, m: build_x0(p, u, i, c, m)),
                  params, user, item, cat, num, n=n)
    t_tower_pal = timeit(jax.jit(
        lambda f, x: dcnr_tower_eval_pallas(f, x, interpret=interpret)), folded, x0, n=n)

    out = {
        "metric": "eval_tower_scaled",
        "rows": B, "hidden": args.hidden, "d_in": d_in,
        "n_res": args.n_res, "n_cross": args.n_cross,
        "xla_full_ms": round(t_full * 1e3, 3),
        "pallas_hybrid_ms": round(t_hybrid * 1e3, 3),
        "speedup_end_to_end": round(t_full / t_hybrid, 3),
        "x0_gathers_ms": round(t_x0 * 1e3, 3),
        "pallas_tower_only_ms": round(t_tower_pal * 1e3, 3),
        "gather_fraction_of_hybrid": round(t_x0 / (t_x0 + t_tower_pal), 3),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
