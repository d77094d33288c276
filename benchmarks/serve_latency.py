"""Serve-path latency benchmark: p50/p90/p99 of the full two-stage
recommend program (retrieval → DCN-R scoring → MMR) on the current backend.

Usage: python benchmarks/serve_latency.py [--requests 100]
Prints one JSON line. The p50 is a BASELINE.md target metric.
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
    # (--pallas removed: the fused serve tower was retired after the
    # round-2 kernel honesty pass — see RESULTS.md)
    p.add_argument("--requests", type=int, default=100)
    p.add_argument("--concurrency", type=int, default=1,
                   help=">1: concurrent clients through the dynamic batcher")
    p.add_argument("--batch-window-ms", type=float, default=3.0)
    p.add_argument("--users", type=int, default=2000)
    p.add_argument("--items", type=int, default=600)
    p.add_argument("--reviews", type=int, default=40000)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 catalog scoring (the serve CLI's --bf16)")
    p.add_argument("--quantize", action="store_true",
                   help="int8 embedding tables (the serve CLI's --quantize-tables)")
    p.add_argument("--cache-entries", type=int, default=0,
                   help=">0: wrap in the LRU response cache; with the default "
                        "request mix repeats appear once users*cities cycles, "
                        "so the p50 shows the cache-hit path")
    args = p.parse_args(argv)

    import tempfile

    from hhrs_tpu.config import ModelConfig, TrainConfig
    from hhrs_tpu.data.features import add_engineered_features
    from hhrs_tpu.data.ingest import noise_filter
    from hhrs_tpu.data.preprocess import Preprocessor
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset
    from hhrs_tpu.models.dcn import ModelDims
    from hhrs_tpu.serve.engine import RecommendationEngine
    from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
    from hhrs_tpu.train.trainer import train_dcn

    ds = generate_synthetic_dataset(
        n_users=args.users, n_items=args.items, n_reviews=args.reviews, seed=13
    )
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(noise_filter(main_df.copy()))
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig()
    result = train_dcn(splits, dims, mcfg, TrainConfig(n_epochs=2))
    with tempfile.TemporaryDirectory() as tmp:
        export_artifacts(tmp, result.params, result.bn_state, mcfg, dims, art,
                         result.final_metrics)
        bundle = load_artifact_bundle(tmp)

    engine = RecommendationEngine(bundle, main_df, ds.friendships, bf16=args.bf16,
                                  quantize_tables=args.quantize)
    engine.warmup()

    uni = engine.gen.universe
    users = uni.user_ids
    cities = uni.cities
    if args.cache_entries > 0:
        # cycle a small user pool so most requests are repeats (the
        # cache's target workload); first pass populates, the rest hit.
        # Working set = lcm(|users|, |cities|) keys — keep cache_entries
        # >= that or the LRU cycles at 0% hits (stats in the output
        # expose it either way).
        users = users[:8]

    def req_args(i):
        return int(users[i % len(users)]), cities[i % len(cities)], "friends", 0.7

    t_all = []
    wall = None
    cached = None
    if args.concurrency > 1:
        from concurrent.futures import ThreadPoolExecutor

        from hhrs_tpu.serve.batcher import BatchingEngine

        front = BatchingEngine(engine, max_batch=args.concurrency,
                               window_ms=args.batch_window_ms)
        if args.cache_entries > 0:
            # cache OUTSIDE the batcher (the serve CLI's stack order):
            # hits skip the batch window and the device entirely
            from hhrs_tpu.serve.cache import CachedEngine

            front = cached = CachedEngine(front, max_entries=args.cache_entries)
        # compile the single batched shape the batcher uses
        engine.recommend_many([req_args(0)], pad_to=args.concurrency)

        def hit(i):
            t0 = time.perf_counter()
            front.recommend(*req_args(i))
            return time.perf_counter() - t0

        t_wall = time.perf_counter()
        with ThreadPoolExecutor(max_workers=args.concurrency) as ex:
            t_all = list(ex.map(hit, range(args.requests)))
        wall = time.perf_counter() - t_wall
        (front._inner if cached is not None else front).close()
    else:
        serve = engine
        if args.cache_entries > 0:
            from hhrs_tpu.serve.cache import CachedEngine

            serve = cached = CachedEngine(engine, max_entries=args.cache_entries)
        t_wall = time.perf_counter()
        for i in range(args.requests):
            u, c, m, l = req_args(i)
            t0 = time.perf_counter()
            serve.recommend(u, c, m, l)
            t_all.append(time.perf_counter() - t0)
        wall = time.perf_counter() - t_wall

    t_all.sort()

    def q(p_):  # nearest-rank percentile: element ceil(n·p) (1-based)
        import math

        idx = max(math.ceil(len(t_all) * p_) - 1, 0)
        return t_all[min(idx, len(t_all) - 1)] * 1e3
    print(json.dumps({
        "metric": "serve_recommend_latency",
        "p50_ms": round(q(0.50), 2),
        "p90_ms": round(q(0.90), 2),
        "p99_ms": round(q(0.99), 2),
        "requests": args.requests,
        "throughput_rps": round(args.requests / wall, 1),
        "concurrency": args.concurrency,
        "bf16": args.bf16,
        "quantized_tables": args.quantize,
        "cache_entries": args.cache_entries,
        "cache": cached.cache_stats() if cached is not None else None,
        "unit": "ms",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
