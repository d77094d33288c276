"""HPO study visualization (reference train.py:337-350 exports Optuna's
optimization-history / param-importance / parallel-coordinate PNGs via
plotly+kaleido; neither is in this image, so these are matplotlib
equivalents over the journal records).

Importance is fANOVA-lite: per parameter, the R² of a rank-binned
group-mean predictor of the objective — cheap, monotonic-invariant, and
good enough to reproduce the reference's convergence analysis
(Documentation.md:219-225).
"""

from __future__ import annotations

import logging
import os

import numpy as np

log = logging.getLogger(__name__)


def _completed(trials: list[dict]) -> list[dict]:
    return [t for t in trials if t.get("state") == "complete" and t.get("value") is not None]


def param_importances(trials: list[dict], n_bins: int = 4) -> dict:
    """Parameter → R² of bin-mean objective predictor (higher = matters more)."""
    done = _completed(trials)
    if len(done) < 8:
        return {}
    values = np.asarray([t["value"] for t in done], dtype=np.float64)
    total_var = values.var()
    if total_var == 0:
        return {}
    out = {}
    names = sorted({k for t in done for k in t["params"]})
    for name in names:
        xs = [t["params"].get(name) for t in done]
        # rank-encode (handles categorical + log scales uniformly)
        uniq = {v: i for i, v in enumerate(sorted(set(xs), key=lambda v: (str(type(v)), v)))}
        ranks = np.asarray([uniq[v] for v in xs], dtype=np.float64)
        bins = np.minimum(
            (ranks / max(ranks.max(), 1) * (n_bins - 1)).round().astype(int), n_bins - 1
        )
        explained = 0.0
        for b in range(n_bins):
            m = bins == b
            if m.any():
                explained += m.sum() * (values[m].mean() - values.mean()) ** 2
        out[name] = float(explained / len(values) / total_var)
    return dict(sorted(out.items(), key=lambda kv: -kv[1]))


def save_study_plots(trials: list[dict], out_dir: str) -> list[str]:
    """Write optimization_history.png + param_importances.png; returns paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    done = _completed(trials)
    written = []

    if done:
        fig, ax = plt.subplots(figsize=(8, 4.5))
        nums = [t["number"] for t in done]
        vals = [t["value"] for t in done]
        best = np.minimum.accumulate(vals)
        ax.scatter(nums, vals, s=12, alpha=0.5, label="trial value")
        ax.plot(nums, best, lw=2, label="best so far")
        ax.set_xlabel("trial")
        ax.set_ylabel("val logloss")
        ax.set_title("Optimization history")
        ax.legend()
        path = os.path.join(out_dir, "optimization_history.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        written.append(path)

    imp = param_importances(trials)
    if imp:
        fig, ax = plt.subplots(figsize=(8, 4.5))
        names = list(imp)[::-1]
        ax.barh(names, [imp[n] for n in names])
        ax.set_xlabel("importance (R² of bin means)")
        ax.set_title("Hyperparameter importances")
        path = os.path.join(out_dir, "param_importances.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        written.append(path)

    log.info("study plots: %s", written)
    return written
