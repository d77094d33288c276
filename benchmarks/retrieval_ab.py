"""A/B: candidate-set recall — ranker-embedding expansion (the reference
design, main.py:268-270) vs the two-tower learned retriever's vectors
(--retrieval-embeddings).

End-to-end stage-1 measurement through the REAL engine: for every held-out
positive (user, item, city), ask ``recommend(user, city, 'personal', 1.0)``
— λ=1.0 returns the FULL ranked candidate set (reference main.py:327-332),
so "the item is in the response" == "stage 1 retrieved it". Both engines
share the identical ranker artifact and data; only the similarity vectors
differ, so the delta is purely the expansion source.

Usage: python benchmarks/retrieval_ab.py [--cpu] [--users N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--users", type=int, default=400, help="evaluated val positives cap")
    p.add_argument("--items", type=int, default=4000)
    p.add_argument("--reviews", type=int, default=100_000)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from hhrs_tpu.config import ModelConfig, TrainConfig
    from hhrs_tpu.data import Preprocessor, add_engineered_features
    from hhrs_tpu.data.ingest import noise_filter
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset
    from hhrs_tpu.models.dcn import ModelDims
    from hhrs_tpu.retrieval.two_tower import (
        TwoTowerConfig, export_retrieval_embeddings, train_two_tower)
    from hhrs_tpu.serve.engine import RecommendationEngine
    from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
    from hhrs_tpu.train.trainer import train_dcn
    from hhrs_tpu.utils.logging import enable_compilation_cache

    enable_compilation_cache()
    ds = generate_synthetic_dataset(n_users=1500, n_items=args.items,
                                    n_reviews=args.reviews, seed=7)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id",
                                   "hotel_id": "item_id"})))
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)

    mcfg = ModelConfig(emb_dim=16, hidden_dim=64, n_cross_layers=2,
                       n_res_blocks=1, dropout=0.4)
    rank = train_dcn(splits, dims, mcfg,
                     TrainConfig(lr=3e-3, batch_size=512, n_epochs=6))
    import tempfile

    tmp = tempfile.mkdtemp(prefix="retrieval_ab_")
    export_artifacts(tmp, rank.params, rank.bn_state, mcfg, dims, art,
                     rank.final_metrics)
    bundle = load_artifact_bundle(tmp)

    tt = train_two_tower(splits, dims, TwoTowerConfig(), eval_recall=False)
    emb_path = export_retrieval_embeddings(tmp, tt.params, splits, dims)
    V = np.load(emb_path)

    engines = {
        "ranker_embeddings (reference design)": RecommendationEngine(
            bundle, df, ds.friendships),
        "two_tower (--retrieval-embeddings)": RecommendationEngine(
            bundle, df, ds.friendships, retrieval_embeddings=V),
    }

    # held-out positives with their cities (the serve request needs one)
    inv_user = {}
    for ext, internal in art.user_id_mapping.items():
        inv_user[internal] = ext
    inv_item = {v: k for k, v in art.item_id_mapping.items()}
    item_city = df.drop_duplicates("item_id").set_index("item_id")["city"]
    pos = np.asarray(splits.val_y) == 1.0
    vu = np.asarray(splits.val_user)[pos][: args.users]
    vi = np.asarray(splits.val_item)[pos][: args.users]

    results = {}
    for name, eng in engines.items():
        hits = total = 0
        for u_int, i_int in zip(vu.tolist(), vi.tolist()):
            ext_u, ext_i = inv_user[u_int], inv_item[i_int]
            city = item_city.get(ext_i)
            if city is None:
                continue
            resp = eng.recommend(int(ext_u), str(city), "personal", 1.0)
            got = {h["hotel_id"] for h in resp.get("ranked_hotels", [])}
            hits += int(ext_i in got)
            total += 1
        results[name] = {"candidate_recall": round(hits / max(total, 1), 4),
                         "evaluated": total}
        print(f"{name}: candidate recall {results[name]['candidate_recall']}"
              f" over {total} held-out positives", flush=True)

    rec = {"metric": "candidate_set_recall_ab", "results": results,
           "items": args.items, "reviews": args.reviews}
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
