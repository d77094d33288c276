"""Hyperparameter optimization.

The reference drives a 300-trial Optuna study (TPE sampler, MedianPruner,
resumable joblib journal — reference train.py:303-325). Optuna is not in
this image, so this package is a self-contained reimplementation of the
pieces the workload needs — same trial API (``suggest_categorical`` /
``suggest_int`` / ``suggest_float``), a univariate TPE sampler, a median
pruner, and a crash-safe append-only JSONL journal for resumability. When
optuna IS importable, ``create_study(..., backend="optuna")`` delegates to
it so the same objective runs unchanged on either engine.
"""

from hhrs_tpu.hpo.pruner import MedianPruner, NopPruner, SuccessiveHalvingPruner
from hhrs_tpu.hpo.sampler import RandomSampler, TPESampler
from hhrs_tpu.hpo.space import reference_search_space
from hhrs_tpu.hpo.study import Study, Trial, TrialPruned

__all__ = [
    "MedianPruner",
    "NopPruner",
    "SuccessiveHalvingPruner",
    "RandomSampler",
    "TPESampler",
    "reference_search_space",
    "Study",
    "Trial",
    "TrialPruned",
]
