"""Median pruner: optuna.MedianPruner semantics (the reference study's
pruner — train.py:236-238 calls trial.report + should_prune each epoch).

A running trial is pruned at step s if its intermediate value is worse
than the median of the intermediate values other completed trials reported
at the same step, after warmup allowances.
"""

from __future__ import annotations

import numpy as np


class MedianPruner:
    def __init__(self, n_startup_trials: int = 5, n_warmup_steps: int = 0):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps

    def should_prune(
        self,
        step: int,
        value: float,
        completed_intermediates: list,  # list of {step: value} for completed trials
    ) -> bool:
        if step < self.n_warmup_steps:
            return False
        if len(completed_intermediates) < self.n_startup_trials:
            return False
        # NaN-safe: a completed trial that posted a NaN at this step (e.g.
        # diverged then recovered) must not disable pruning forever —
        # optuna uses nanpercentile for the same reason.
        at_step = [
            im[step] for im in completed_intermediates
            if step in im and not np.isnan(im[step])
        ]
        if not at_step:
            return False
        return value > float(np.median(at_step))


class NopPruner:
    def should_prune(self, step, value, completed_intermediates) -> bool:
        return False
