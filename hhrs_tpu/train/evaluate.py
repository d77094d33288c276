"""Shared no-refit artifact evaluation (the eval_cli core, reusable).

Scores a shipped artifact dir against a dataset with the SAVED
preprocessing (vocab/scaler/medians — unseen ids get the serve-time
fallbacks, reference main.py:215-230). Used by train/eval_cli.py and the
registry promote gate's ``--eval-data`` mode (db/cli.py), which needs
candidate and incumbent scored on the SAME rows for an apples-to-apples
comparison.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)


def evaluate_artifacts(
    artifacts_dir: str,
    data_dir: str,
    cfg=None,
    split: str = "all",
    eval_batch: int = 8192,
) -> dict:
    """Evaluate one artifact dir on ``data_dir``'s reviews CSV.

    Returns {"rows", "logloss", "auc", "rmse", "recall_at_100"}.
    ``split`` ∈ {"all", "val", "train"} — val/train reproduce the seed-42
    training split of this frame. Raises ValueError when the dataset has
    no target column or no rows survive filtering.
    """
    import jax.numpy as jnp
    import numpy as np

    from hhrs_tpu.config import Config
    from hhrs_tpu.data import add_engineered_features, load_reviews_csv
    from hhrs_tpu.data.ingest import noise_filter
    from hhrs_tpu.data.preprocess import transform_with_artifacts
    from hhrs_tpu.train.artifacts import load_artifact_bundle
    from hhrs_tpu.train.metrics import (
        auc_score,
        bce_with_logits,
        recall_at_k,
        rmse_of_probs,
    )
    from hhrs_tpu.train.trainer import make_eval_fn

    cfg = cfg or Config()
    bundle = load_artifact_bundle(artifacts_dir)
    df = add_engineered_features(
        load_reviews_csv(os.path.join(data_dir, "hackathon_augmented_data.csv"))
    )
    # Same config-driven thresholds as training (train/cli.py): an override
    # like data.positive_rating=7 must reproduce the same row set here, or
    # --split val diverges from the manifest silently.
    df = noise_filter(df, cfg.data.positive_rating, cfg.data.negative_rating)
    arrays = transform_with_artifacts(bundle.preproc, df)
    if "y" not in arrays:
        from hhrs_tpu.data import schema

        raise ValueError(
            f"dataset has no {schema.TARGET_COL!r} column — nothing to evaluate against"
        )

    if split != "all":
        # The training run's exact split of THIS frame (Preprocessor._split:
        # sklearn shuffle, seed/test_size from config — reference train.py:67).
        from hhrs_tpu.data.preprocess import Preprocessor

        pre = Preprocessor(test_size=cfg.data.test_size, split_seed=cfg.data.split_seed)
        tr_idx, va_idx = pre._split(len(arrays["y"]), arrays["y"])
        keep = va_idx if split == "val" else tr_idx
        arrays = {k: v[keep] for k, v in arrays.items()}

    n = len(arrays["y"])
    if n == 0:
        raise ValueError("no rows to evaluate after filtering")
    val = {k: jnp.asarray(v) for k, v in arrays.items()}
    eval_fn = make_eval_fn(bundle.model_cfg, eval_batch)
    logits = np.asarray(eval_fn(bundle.params, bundle.bn_state, val))
    y = arrays["y"]
    return {
        "rows": int(n),
        "logloss": float(np.asarray(bce_with_logits(jnp.asarray(logits), jnp.asarray(y)))),
        "auc": auc_score(y, logits),
        "rmse": rmse_of_probs(y, logits),
        "recall_at_100": recall_at_k(arrays["user"], y, logits, 100),
    }
