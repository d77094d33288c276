"""Catalog-ranking recall@100 on DENSE synthetic data (VERDICT r1 item 4).

Generates a dense regime — thousands of catalog items, ≥50 rated items per
user on average — trains DCN-R, and measures catalog recall@100
(train/eval_retrieval.py) over several seeds. The point is an INFORMATIVE
number: meaningfully below 1.0 (the catalog dwarfs k) and stable across
seeds, replacing the round-1 saturated row-level metric.

Usage: python benchmarks/retrieval_quality.py --cpu --seeds 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--users", type=int, default=1500)
    p.add_argument("--items", type=int, default=4000)
    p.add_argument("--reviews", type=int, default=90_000)  # ~60 rated/user
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--json-out", default=None)
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from hhrs_tpu.config import ModelConfig, TrainConfig
    from hhrs_tpu.data.features import add_engineered_features
    from hhrs_tpu.data.ingest import noise_filter
    from hhrs_tpu.data.preprocess import Preprocessor
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset
    from hhrs_tpu.models.dcn import ModelDims
    from hhrs_tpu.train.trainer import train_dcn
    from hhrs_tpu.utils.logging import enable_compilation_cache

    enable_compilation_cache()
    mcfg = ModelConfig(emb_dim=16, hidden_dim=128, n_cross_layers=2,
                       n_res_blocks=1, dropout=0.6)

    rows = []
    for seed in range(args.seeds):
        ds = generate_synthetic_dataset(
            n_users=args.users, n_items=args.items, n_reviews=args.reviews,
            seed=1000 + seed,
        )
        df = add_engineered_features(noise_filter(
            ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
        ))
        splits, art = Preprocessor().fit_transform(df)
        dims = ModelDims.from_artifacts(art)
        per_user = splits.n_train / dims.n_users
        tcfg = TrainConfig(batch_size=2048, n_epochs=args.epochs, seed=seed,
                           eval_catalog_recall=True)
        res = train_dcn(splits, dims, mcfg, tcfg)
        rows.append({
            "seed": seed,
            "catalog_items": dims.n_items,
            "train_rows_per_user": round(per_user, 1),
            "catalog_recall_at_100": round(res.final_metrics["catalog_recall_at_100"], 4),
            "row_recall_at_100": round(res.final_metrics["val_recall_at_100"], 4),
            "val_auc": round(res.final_metrics["val_auc"], 4),
        })
        print(f"# seed {seed}: {rows[-1]}", file=sys.stderr)

    vals = np.array([r["catalog_recall_at_100"] for r in rows])
    out = {
        "metric": "catalog_recall_at_100",
        "per_seed": rows,
        "mean": round(float(vals.mean()), 4),
        "std": round(float(vals.std()), 4),
        "informative": bool(0.0 < vals.mean() < 0.99),
    }
    line = json.dumps(out)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
