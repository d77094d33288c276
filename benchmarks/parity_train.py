"""Head-to-head training-quality parity: reference torch loop vs train_dcn.

Runs a faithful torch replica of the reference training loop
(hhrs_tpu/compat/torch_ref.py; reference train.py:195-267) and our JAX
trainer on the IDENTICAL synthetic split with the reference's best
hyperparameters (Documentation.md:194: dropout 0.6, emb_dim 16,
n_res_blocks 1, batch 512), N seeds each, and compares the final val
LogLoss/AUC distributions — and, since r4, the catalog-ranking
recall@100 distributions (each trained model ranks the FULL catalog per
evaluated user through the SAME metric harness,
train/eval_retrieval.py::catalog_recall_from_scores, so only the stack
differs). Pass = the means differ by less than the combined seed spread —
the claim "our trainer reaches the same quality as the reference loop"
measured, not asserted.

Usage: python benchmarks/parity_train.py --cpu --seeds 3 --reviews 40000
(--cpu recommended: torch runs on CPU here, and quality metrics are
hardware-independent — this also frees the TPU for throughput work.)
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
    p.add_argument("--reviews", type=int, default=40_000)
    p.add_argument("--users", type=int, default=2_000)
    p.add_argument("--items", type=int, default=400)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--cpu", action="store_true", help="run the JAX side on CPU")
    p.add_argument("--recall-k", type=int, default=100)
    p.add_argument("--no-recall", action="store_true",
                   help="skip the catalog recall@k measurement")
    p.add_argument("--json-out", default=None)
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from hhrs_tpu.compat.torch_ref import catalog_recall_torch, train_reference_loop
    from hhrs_tpu.config import ModelConfig, TrainConfig
    from hhrs_tpu.data.features import add_engineered_features
    from hhrs_tpu.data.ingest import noise_filter
    from hhrs_tpu.data.preprocess import Preprocessor
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset
    from hhrs_tpu.models.dcn import ModelDims
    from hhrs_tpu.train.trainer import train_dcn
    from hhrs_tpu.utils.logging import enable_compilation_cache

    enable_compilation_cache()

    # ONE dataset + split for every run (the split seed is the data
    # contract's 42, independent of the training seed).
    ds = generate_synthetic_dataset(
        n_users=args.users, n_items=args.items, n_reviews=args.reviews, seed=123
    )
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    ))
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    print(f"# split: {splits.n_train} train / {len(splits.val_y)} val", file=sys.stderr)

    # Reference best hyperparams (Documentation.md:194,219-225); the rest
    # are the config defaults, which already encode the reference's choices.
    mcfg = ModelConfig(emb_dim=16, hidden_dim=128, n_cross_layers=2,
                       n_res_blocks=1, dropout=0.6)

    rows = {"torch": [], "jax": []}
    for seed in range(args.seeds):
        tcfg = TrainConfig(batch_size=512, n_epochs=args.epochs, seed=seed,
                           drop_remainder=True)
        t = train_reference_loop(splits, dims, mcfg, tcfg,
                                 return_model=not args.no_recall)
        tm = dict(t["final_metrics"])
        if not args.no_recall:
            tm["catalog_recall"] = catalog_recall_torch(
                t["model"], splits, k=args.recall_k)
        rows["torch"].append({**tm, "epochs": len(t["history"]), "seed": seed})
        print(f"# torch seed {seed}: {tm}", file=sys.stderr)

        j = train_dcn(splits, dims, mcfg, tcfg)
        jm = {k: v for k, v in j.final_metrics.items() if k != "val_recall_at_100"}
        if not args.no_recall:
            from hhrs_tpu.train.eval_retrieval import catalog_recall_at_k

            jm["catalog_recall"] = catalog_recall_at_k(
                j.params, j.bn_state, mcfg, splits, k=args.recall_k)
        rows["jax"].append({**jm, "epochs": len(j.history), "seed": seed})
        print(f"# jax   seed {seed}: {jm}", file=sys.stderr)

    def stats(fr, key):
        v = np.array([r[key] for r in rows[fr]])
        return {"mean": round(float(v.mean()), 5), "std": round(float(v.std()), 5)}

    keys = ["val_logloss", "val_auc", "val_rmse"]
    if not args.no_recall:
        keys.append("catalog_recall")
    summary = {fr: {k: stats(fr, k) for k in keys} for fr in rows}
    # Overlap verdict: means within the combined spread (3σ floor 2e-3 for
    # logloss / 5e-3 for AUC — single-digit-seed std underestimates).
    def within(key, floor):
        a, b = summary["torch"][key], summary["jax"][key]
        tol = max(3 * max(a["std"], b["std"]), floor)
        return abs(a["mean"] - b["mean"]) <= tol, round(abs(a["mean"] - b["mean"]), 5), tol

    ll_ok, ll_d, ll_tol = within("val_logloss", 2e-3)
    auc_ok, auc_d, auc_tol = within("val_auc", 5e-3)
    out = {
        "metric": "train_quality_parity",
        "per_seed": rows,
        "summary": summary,
        "logloss_delta": ll_d, "logloss_tol": round(ll_tol, 5), "logloss_parity": ll_ok,
        "auc_delta": auc_d, "auc_tol": round(auc_tol, 5), "auc_parity": auc_ok,
    }
    parity = bool(ll_ok and auc_ok)
    if not args.no_recall:
        # recall@k over a few seeds is noisier than AUC; floor 0.02
        rc_ok, rc_d, rc_tol = within("catalog_recall", 2e-2)
        out.update({"recall_k": args.recall_k, "recall_delta": rc_d,
                    "recall_tol": round(rc_tol, 5), "recall_parity": rc_ok})
        parity = parity and rc_ok
    out["parity"] = parity
    line = json.dumps(out)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    return 0 if out["parity"] else 1


if __name__ == "__main__":
    sys.exit(main())
