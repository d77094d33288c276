"""Quality check for bf16 activation storage: full training runs, f32 vs
bf16 storage, N seeds each — final val LogLoss/AUC must agree within seed
variance (the knob's claim is 'statistically equivalent training, not
bit-identical'; benchmarks/storage_ab.py measured the speed side).

Same protocol as the reference-parity study (benchmarks/parity_train.py):
identical dataset/split, each variant trains with its own seeds, compare
the metric distributions.

    python benchmarks/storage_quality.py [--seeds 3] [--epochs 12] [--cpu]
"""
import argparse
import json
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None, help="write a JSON artifact here")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from hhrs_tpu.config import ModelConfig, TrainConfig
    from hhrs_tpu.data import Preprocessor, add_engineered_features, noise_filter
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset
    from hhrs_tpu.models.dcn import ModelDims
    from hhrs_tpu.train.trainer import train_dcn
    from hhrs_tpu.utils.logging import enable_compilation_cache

    enable_compilation_cache()
    ds = generate_synthetic_dataset(n_users=2000, n_items=600, n_reviews=40000, seed=0)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})))
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)

    base = ModelConfig(compute_dtype="bfloat16")
    variants = {
        "f32_storage": base,
        "bf16_storage": dataclasses.replace(base, storage_dtype="bfloat16"),
    }
    results = {}
    for name, mcfg in variants.items():
        lls, aucs = [], []
        for seed in range(args.seeds):
            tcfg = TrainConfig(n_epochs=args.epochs, seed=42 + seed)
            r = train_dcn(splits, dims, mcfg, tcfg)
            lls.append(r.final_metrics["val_logloss"])
            aucs.append(r.final_metrics["val_auc"])
            print(f"{name} seed {seed}: logloss {lls[-1]:.5f} auc {aucs[-1]:.5f}",
                  flush=True)
        results[name] = {"logloss": lls, "auc": aucs}

    def stats(xs):
        return statistics.mean(xs), (statistics.stdev(xs) if len(xs) > 1 else 0.0)

    summary = {}
    for name, r in results.items():
        (llm, lls_), (am, as_) = stats(r["logloss"]), stats(r["auc"])
        summary[name] = {"logloss_mean": llm, "logloss_std": lls_,
                         "auc_mean": am, "auc_std": as_}
        print(f"{name}: logloss {llm:.5f}±{lls_:.5f}  auc {am:.5f}±{as_:.5f}")

    dll = abs(summary["f32_storage"]["logloss_mean"] - summary["bf16_storage"]["logloss_mean"])
    dauc = abs(summary["f32_storage"]["auc_mean"] - summary["bf16_storage"]["auc_mean"])
    tol_ll = 3 * max(summary["f32_storage"]["logloss_std"],
                     summary["bf16_storage"]["logloss_std"], 1e-4)
    tol_auc = 3 * max(summary["f32_storage"]["auc_std"],
                      summary["bf16_storage"]["auc_std"], 1e-4)
    ok = dll <= tol_ll and dauc <= tol_auc
    print(f"delta logloss {dll:.5f} (tol {tol_ll:.5f}), delta auc {dauc:.5f} "
          f"(tol {tol_auc:.5f}) -> {'PARITY' if ok else 'DIVERGED'}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"results": results, "summary": summary,
                       "delta": {"logloss": dll, "auc": dauc},
                       "parity": ok}, f, indent=2)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
