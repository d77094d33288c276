"""Evaluation metrics: BCE-with-logits, ROC AUC, RMSE.

The reference evaluates LogLoss (BCEWithLogitsLoss), roc_auc_score on raw
logits, and RMSE of sigmoid probabilities (reference train.py:376-383).
AUC here is the exact Mann-Whitney statistic with average ranks for ties —
identical to sklearn's roc_auc_score for binary labels — implemented both
host-side (numpy) and on-device (jnp, sort-based, fixed shapes) so the
eval loop never leaves the chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray, weights=None) -> jnp.ndarray:
    """Mean binary cross-entropy on logits; numerically stable form."""
    per_ex = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weights is None:
        return jnp.mean(per_ex)
    return jnp.sum(per_ex * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def auc_score(labels: np.ndarray, scores: np.ndarray) -> float:
    """Mann-Whitney AUC with tie-averaged ranks (== sklearn roc_auc_score)."""
    labels = np.asarray(labels)
    scores = np.asarray(scores, dtype=np.float64)
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    # tie-averaged ranks, vectorized: for each run of equal sorted scores,
    # every member gets the mean of its 1-based rank range
    sorted_scores = scores[order]
    n = len(sorted_scores)
    starts = np.flatnonzero(
        np.concatenate([[True], sorted_scores[1:] != sorted_scores[:-1]])
    )
    ends = np.append(starts[1:], n)  # exclusive
    avg = (starts + 1 + ends) / 2.0  # mean of ranks start+1 .. end
    ranks = np.empty(n, dtype=np.float64)
    ranks[order] = np.repeat(avg, ends - starts)
    sum_pos_ranks = ranks[labels > 0.5].sum()
    return float((sum_pos_ranks - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def auc_score_jnp(labels: jnp.ndarray, scores: jnp.ndarray, mask=None) -> jnp.ndarray:
    """On-device AUC (tie-averaged). Supports a validity mask for padded evals."""
    if mask is None:
        mask = jnp.ones_like(scores, dtype=jnp.float32)
    mask = mask.astype(jnp.float32)
    labels = labels.astype(jnp.float32) * mask
    n = scores.shape[0]
    # Push padded entries to the bottom so they get the lowest ranks and
    # contribute nothing (their label is zeroed and they are excluded below).
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(mask > 0, scores, neg_inf)
    order = jnp.argsort(s)
    # tie averaging: group equal scores via segment means over sorted runs
    s_sorted = s[order]
    new_group = jnp.concatenate([jnp.ones(1, jnp.int32), (s_sorted[1:] != s_sorted[:-1]).astype(jnp.int32)])
    group_id = jnp.cumsum(new_group) - 1
    group_sum = jax.ops.segment_sum(jnp.arange(1, n + 1, dtype=jnp.float32), group_id, num_segments=n)
    group_cnt = jax.ops.segment_sum(jnp.ones(n, jnp.float32), group_id, num_segments=n)
    avg_rank_sorted = group_sum[group_id] / jnp.maximum(group_cnt[group_id], 1.0)
    ranks = jnp.zeros(n).at[order].set(avg_rank_sorted)

    n_pos = jnp.sum(labels)
    n_valid = jnp.sum(mask)
    n_neg = n_valid - n_pos
    # padded entries occupy the lowest ranks 1..n_pad; shift valid ranks down
    n_pad = n - n_valid
    sum_pos = jnp.sum(ranks * labels) - n_pad * n_pos
    return (sum_pos - n_pos * (n_pos + 1) / 2.0) / jnp.maximum(n_pos * n_neg, 1.0)


def rmse_of_probs(labels: np.ndarray, logits: np.ndarray) -> float:
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, dtype=np.float64)))
    return float(np.sqrt(np.mean((np.asarray(labels) - probs) ** 2)))


def recall_at_k(
    user_ids: np.ndarray,
    labels: np.ndarray,
    scores: np.ndarray,
    k: int = 100,
) -> float:
    """Per-user recall@k averaged over users with ≥1 positive.

    For each user: fraction of their positive items that rank in their
    per-user top-k by score. The retrieval-quality half of the BASELINE
    target (recall@100 parity); the reference never computes it — this is
    the metric its candidate-generation stage implicitly optimizes.
    """
    user_ids = np.asarray(user_ids)
    labels = np.asarray(labels) > 0.5
    scores = np.asarray(scores, dtype=np.float64)

    order = np.lexsort((-scores, user_ids))  # group by user, scores desc
    u_sorted = user_ids[order]
    l_sorted = labels[order]
    # rank within each user group
    starts = np.r_[0, np.flatnonzero(u_sorted[1:] != u_sorted[:-1]) + 1]
    group_of = np.cumsum(np.isin(np.arange(len(u_sorted)), starts)) - 1
    rank_in_group = np.arange(len(u_sorted)) - starts[group_of]

    hits = l_sorted & (rank_in_group < k)
    pos_per_group = np.zeros(len(starts))
    hit_per_group = np.zeros(len(starts))
    np.add.at(pos_per_group, group_of, l_sorted)
    np.add.at(hit_per_group, group_of, hits)
    valid = pos_per_group > 0
    if not valid.any():
        return float("nan")
    return float(np.mean(hit_per_group[valid] / pos_per_group[valid]))
