"""A/B: f32 vs int8-quantized embedding tables on the serve request path,
at a production-scale catalog.

At the reference-scale catalog the request is pinned at the tunnel's D2H
floor and any scoring change is invisible; at ~100k items the full-universe
scoring dominates the request (measured p50 ≈ 130ms vs the ~27ms floor), so
table bytes finally matter. Both engines share ONE bundle (same params,
same kNN tables) in ONE process, measured back-to-back in BOTH orders:

    python benchmarks/quant_serve_ab.py fq [--items 100000]
    python benchmarks/quant_serve_ab.py qf [--items 100000]

Params are random-init (timing only — the request program's cost does not
depend on param values); the preprocessing artifacts are a real fit so the
engine sees production-shaped vocabularies.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("order", nargs="?", default="fq",
                   help="engine sequence: f=f32, q=int8 tables, b=bf16 "
                        "scoring, Q=bf16+int8, c=f32+candidate-cap-4096, "
                        "C=bf16+cap, u/U=f32/bf16 with city_bounded OFF "
                        "(full-universe) — e.g. 'ufbcC' then 'CcbfU' for "
                        "a both-orders sweep")
    p.add_argument("--items", type=int, default=100_000)
    p.add_argument("--users", type=int, default=50_000)
    p.add_argument("--reviews", type=int, default=500_000)
    p.add_argument("--requests", type=int, default=30)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from hhrs_tpu.utils.logging import enable_compilation_cache

    enable_compilation_cache()  # gated: never cache CPU AOT (SIGILL hazard)

    from hhrs_tpu.config import ModelConfig
    from hhrs_tpu.data import Preprocessor, add_engineered_features
    from hhrs_tpu.data.ingest import noise_filter
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset
    from hhrs_tpu.models.dcn import ModelDims, init_dcn
    from hhrs_tpu.serve.engine import RecommendationEngine
    from hhrs_tpu.train.artifacts import ArtifactBundle

    t0 = time.time()
    ds = generate_synthetic_dataset(
        n_users=args.users, n_items=args.items, n_reviews=args.reviews, seed=13
    )
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    _, art = Preprocessor().fit_transform(noise_filter(main_df.copy()))
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig()
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, mcfg)
    emb = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (dims.n_items, mcfg.emb_dim)),
        np.float32,
    )
    bundle = ArtifactBundle(params=params, bn_state=bn, model_cfg=mcfg, dims=dims,
                            preproc=art, item_embeddings=emb, metrics={})
    print(f"setup {time.time()-t0:.1f}s: {dims.n_items} items, "
          f"{dims.n_users} users", file=sys.stderr)

    def build(quant, bf16=False, cap=0, bounded=True):
        eng = RecommendationEngine(bundle, main_df, ds.friendships,
                                   quantize_tables=quant, bf16=bf16,
                                   candidate_cap=cap, city_bounded=bounded)
        eng.warmup()
        return eng

    def measure(eng, label):
        uni = eng.gen.universe
        users, cities = uni.user_ids, uni.cities

        def one(i):
            t = time.perf_counter()
            eng.recommend(int(users[i % len(users)]), cities[i % len(cities)],
                          "friends", 0.7)
            return time.perf_counter() - t

        for i in range(5):  # warm
            one(i)
        meds = []
        for _ in range(3):
            ts = sorted(one(i) for i in range(args.requests))
            meds.append(ts[len(ts) // 2])
        p50 = sorted(meds)[1] * 1e3
        print(json.dumps({"metric": "quant_serve_ab", "engine": label,
                          "items": args.items, "p50_ms": round(p50, 2),
                          "windows_ms": [round(m * 1e3, 2) for m in meds]}))
        return p50

    engines = {
        "f": ("f32", False, False, 0, True),
        "q": ("int8", True, False, 0, True),
        "b": ("bf16", False, True, 0, True),
        "Q": ("bf16+int8", True, True, 0, True),
        "c": ("f32+cap4096", False, False, 4096, True),
        "C": ("bf16+cap4096", False, True, 4096, True),
        "u": ("f32+nobound", False, False, 0, False),
        "U": ("bf16+nobound", False, True, 0, False),
    }
    for c in args.order:
        label, quant, bf16, cap, bounded = engines[c]
        measure(build(quant, bf16, cap, bounded), label)
    return 0


if __name__ == "__main__":
    sys.exit(main())
