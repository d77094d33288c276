"""Data-parallel scaling-efficiency harness (BASELINE.md: ≥90% 1→N hosts).

Measures train-step throughput on meshes of 1, 2, 4, … devices (global
batch scaled with the mesh so per-device work is constant — weak scaling)
and reports efficiency vs. linear. On this image only one real TPU chip
exists, so `--cpu` runs the harness on a virtual 8-device CPU mesh — the
numbers then validate the *harness and shardings*, not silicon; on a real
pod slice the same script produces the BASELINE scaling metric.

Usage: python benchmarks/scaling.py --cpu [--per-device-batch 2048] [--steps 30]
       (or set JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
        with PYTHONPATH= to bypass the image's TPU sitecustomize)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=2048)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--cpu", action="store_true",
                   help="run on a virtual 8-device CPU mesh (validates the "
                        "harness/shardings; silicon numbers need a real pod)")
    args = p.parse_args(argv)

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hhrs_tpu.config import ModelConfig
    from hhrs_tpu.models.dcn import ModelDims, init_dcn
    from hhrs_tpu.parallel.mesh import make_mesh
    from hhrs_tpu.parallel.trainer import make_parallel_train_step, shard_train_state
    from hhrs_tpu.train.optimizers import make_optimizer

    n_dev = len(jax.devices())
    dims = ModelDims(100_000, 20_000, (("city", 64), ("hotel_type", 8)), 11)
    cfg = ModelConfig(emb_dim=16, hidden_dim=128, n_cross_layers=2, n_res_blocks=1,
                      dropout=0.6)
    tx = make_optimizer("adamw", 1e-3, 1e-4)
    rng0 = np.random.default_rng(0)

    def batch_of(B):
        return {
            "user": jnp.asarray(rng0.integers(0, dims.n_users, B).astype(np.int32)),
            "item": jnp.asarray(rng0.integers(0, dims.n_items, B).astype(np.int32)),
            "cat": jnp.asarray(np.stack(
                [rng0.integers(0, 64, B), rng0.integers(0, 8, B)], 1).astype(np.int32)),
            "num": jnp.asarray(rng0.normal(size=(B, 11)).astype(np.float32)),
            "y": jnp.asarray((rng0.uniform(size=B) < .5).astype(np.float32)),
        }

    results = []
    n = 1
    while n <= n_dev:
        mesh = make_mesh(n, 1, devices=jax.devices()[:n])
        params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
        opt = tx.init(params)
        state = shard_train_state(mesh, params, bn, opt, model_axis=None)
        B = args.per_device_batch * n
        batch = batch_of(B)
        step = make_parallel_train_step(mesh, cfg, tx.update, state, donate=False)(batch)
        rng = jax.random.PRNGKey(1)
        ps, bs, os_ = state.params, state.bn_state, state.opt_state
        for _ in range(max(args.warmup, 1)):  # ≥1 so compile is excluded
            rng, k = jax.random.split(rng)
            ps, bs, os_, loss = step(ps, bs, os_, batch, k)
        # Sync on the VALUE: block_until_ready can return before execution
        # completes on the tunneled TPU backend (RESULTS.md).
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            rng, k = jax.random.split(rng)
            ps, bs, os_, loss = step(ps, bs, os_, batch, k)
        float(loss)
        dt = time.perf_counter() - t0
        eps = args.steps * B / dt
        results.append({"devices": n, "examples_per_s": round(eps, 1)})
        n *= 2

    base = results[0]["examples_per_s"]
    for r in results:
        r["efficiency"] = round(r["examples_per_s"] / (base * r["devices"]), 3)
    print(json.dumps({"metric": "dp_scaling", "results": results,
                      "backend": jax.default_backend()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
