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
The evaluation core lives in train/evaluate.py (shared with the registry
promote gate's --eval-data mode).
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

    from hhrs_tpu.config import build_config
    from hhrs_tpu.db.registry import resolve_artifacts_dir
    from hhrs_tpu.train.evaluate import evaluate_artifacts

    cfg = build_config(args.overrides, log=log)
    artifacts_dir = resolve_artifacts_dir(args.artifacts)
    try:
        res = evaluate_artifacts(
            artifacts_dir, args.data, cfg=cfg, split=args.split,
            eval_batch=args.eval_batch,
        )
    except ValueError as e:
        log.critical("%s", e)
        return 1
    print(json.dumps({
        "metric": "model_eval",
        "artifacts": artifacts_dir,
        "split": args.split,
        **res,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
