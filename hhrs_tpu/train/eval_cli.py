"""Standalone model evaluation: ``python -m hhrs_tpu.train.eval_cli``.

The reference evaluates only inline at the end of training
(train.py:365-387); production needs the inverse tool too — score an
EXISTING artifact dir (or the registry's active model) against a dataset,
e.g. yesterday's model on today's reviews. Preprocessing uses the SAVED
artifacts (vocab/scaler/medians — no refit; unseen ids get the serve-time
fallbacks), so the number measures the shipped model, not a new fit.

``--split val`` reproduces the training run's validation split
(same filter → same frame → same seed-42 sklearn split) and therefore the
manifest's metrics for the training dataset; the default scores ALL
filtered rows — the fresh-data mode.

Prints one JSON line: logloss / auc / rmse (+ row-level recall@100).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

log = logging.getLogger("hhrs_tpu.eval")


def main(argv=None) -> int:
    from hhrs_tpu.utils.logging import enable_compilation_cache, setup_logging

    setup_logging()
    enable_compilation_cache()
    p = argparse.ArgumentParser(description="Evaluate a trained model on a dataset")
    p.add_argument("--artifacts", default="artifacts",
                   help="artifact dir, or 'registry:<db>' for the active model")
    p.add_argument("--data", default="data", help="data dir with the reviews CSV")
    p.add_argument("--split", choices=["all", "val", "train"], default="all",
                   help="'val'/'train' reproduce the training run's seed-42 "
                        "split of this dataset; 'all' scores every filtered row")
    p.add_argument("--eval-batch", type=int, default=8192)
    p.add_argument("overrides", nargs="*", help="section.field=value config overrides")
    args = p.parse_args(argv)

    import os

    import jax.numpy as jnp
    import numpy as np

    from hhrs_tpu.config import Config, check_overrides
    from hhrs_tpu.data import add_engineered_features, load_reviews_csv
    from hhrs_tpu.data.ingest import noise_filter
    from hhrs_tpu.data.preprocess import transform_with_artifacts
    from hhrs_tpu.db.registry import resolve_artifacts_dir
    from hhrs_tpu.train.artifacts import load_artifact_bundle
    from hhrs_tpu.train.metrics import (
        auc_score,
        bce_with_logits,
        recall_at_k,
        rmse_of_probs,
    )
    from hhrs_tpu.train.trainer import make_eval_fn

    cfg = Config().apply_overrides(check_overrides(args.overrides))

    artifacts_dir = resolve_artifacts_dir(args.artifacts)
    bundle = load_artifact_bundle(artifacts_dir)
    df = add_engineered_features(
        load_reviews_csv(os.path.join(args.data, "hackathon_augmented_data.csv"))
    )
    # Same config-driven thresholds as training (train/cli.py): an override
    # like data.positive_rating=7 must reproduce the same row set here, or
    # --split val diverges from the manifest silently.
    df = noise_filter(df, cfg.data.positive_rating, cfg.data.negative_rating)
    arrays = transform_with_artifacts(bundle.preproc, df)
    if "y" not in arrays:
        from hhrs_tpu.data import schema

        log.critical("dataset has no '%s' column — nothing to evaluate against",
                     schema.TARGET_COL)
        return 1

    if args.split != "all":
        # The training run's exact split of THIS frame (Preprocessor._split:
        # sklearn shuffle, seed/test_size from config — reference train.py:67).
        from hhrs_tpu.data.preprocess import Preprocessor

        pre = Preprocessor(test_size=cfg.data.test_size, split_seed=cfg.data.split_seed)
        tr_idx, va_idx = pre._split(len(arrays["y"]), arrays["y"])
        keep = va_idx if args.split == "val" else tr_idx
        arrays = {k: v[keep] for k, v in arrays.items()}

    n = len(arrays["y"])
    if n == 0:
        log.critical("no rows to evaluate after filtering")
        return 1
    val = {k: jnp.asarray(v) for k, v in arrays.items()}
    eval_fn = make_eval_fn(bundle.model_cfg, args.eval_batch)
    logits = np.asarray(eval_fn(bundle.params, bundle.bn_state, val))
    y = arrays["y"]

    out = {
        "metric": "model_eval",
        "artifacts": artifacts_dir,
        "split": args.split,
        "rows": int(n),
        "logloss": float(np.asarray(bce_with_logits(jnp.asarray(logits), jnp.asarray(y)))),
        "auc": auc_score(y, logits),
        "rmse": rmse_of_probs(y, logits),
        "recall_at_100": recall_at_k(arrays["user"], y, logits, 100),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
