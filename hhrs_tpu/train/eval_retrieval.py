"""Catalog-ranking retrieval quality: recall@k against the FULL item catalog.

The row-level ``recall_at_k`` (train/metrics.py) ranks only a user's own
val rows, so with the typical handful of val items per user it reads 1.0
trivially (RESULTS.md round-1 caveat). The informative retrieval metric —
what the reference's candidate-generation stage implicitly optimizes
(reference main.py:181-212) — scores every catalog item for each evaluated
user and asks what fraction of the user's held-out positives surface in the
top k of thousands. This is the standard retrieval recall@k.

The per-item feature matrix is reconstructed from the encoded split rows
(first occurrence per item — the same dedup rule the serve path applies to
the ranking frame, reference main.py:315).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hhrs_tpu.config import ModelConfig
from hhrs_tpu.models.dcn import apply_dcn


def _item_feature_table(splits):
    """[n_seen] item ids + their cat/num features, first occurrence wins."""
    all_item = np.concatenate([splits.train_item, splits.val_item])
    all_cat = np.concatenate([splits.train_cat, splits.val_cat])
    all_num = np.concatenate([splits.train_num, splits.val_num])
    first = {}
    for row, it in enumerate(all_item.tolist()):
        if it not in first:
            first[it] = row
    items = np.fromiter(first.keys(), np.int32)
    rows = np.fromiter(first.values(), np.int64)
    return items, all_cat[rows].astype(np.int32), all_num[rows].astype(np.float32)


def catalog_recall_from_scores(
    score_fn,
    items: np.ndarray,
    splits,
    k: int = 100,
    max_users: int = 512,
    exclude_train: bool = True,
    user_chunk: int = 64,
    seed: int = 0,
) -> float:
    """The metric harness, scorer-agnostic: mean over users (with ≥1 val
    positive) of |top-k catalog items ∩ val positives| / |val positives|.

    ``score_fn(user_ids: np.int32[C]) -> np.float[C, M]`` scores every
    catalog item for each user. Sharing the harness between the JAX engine
    and the torch oracle (compat/torch_ref.py) guarantees the two stacks
    are compared under the IDENTICAL protocol — same sampled users, same
    item table, same train-seen masking and denominator convention
    (VERDICT r3 item 3: recall@100 parity measured, not asserted).

    ``exclude_train`` masks items the user already interacted with in the
    train split (standard convention — recommending the training history is
    not retrieval).
    """
    M = len(items)
    if M <= k:
        return float("nan")  # catalog smaller than k → metric vacuous

    val_pos = {}
    for u, it, y in zip(splits.val_user.tolist(), splits.val_item.tolist(),
                        (np.asarray(splits.val_y) > 0.5).tolist()):
        if y:
            val_pos.setdefault(u, set()).add(it)
    users = np.array(sorted(val_pos.keys()), np.int32)
    if len(users) > max_users:
        users = np.random.default_rng(seed).choice(users, max_users, replace=False)

    train_seen = {}
    if exclude_train:
        for u, it in zip(splits.train_user.tolist(), splits.train_item.tolist()):
            train_seen.setdefault(u, set()).add(it)

    item_pos = {int(it): i for i, it in enumerate(items)}

    recalls = []
    for c0 in range(0, len(users), user_chunk):
        chunk = users[c0:c0 + user_chunk]
        scores = np.asarray(score_fn(chunk.astype(np.int32)))[: len(chunk)]
        for ui, u in enumerate(chunk.tolist()):
            s = scores[ui].astype(np.float64)
            pos_items = val_pos[u]
            if exclude_train:
                seen = train_seen.get(u, ())
                for it in seen:
                    pos = item_pos.get(it)
                    if pos is not None:
                        s[pos] = -np.inf
                # A val positive the user also rated in train is masked out
                # of the ranking above — it must leave the denominator too,
                # or a perfect model scores < 1.0 (standard convention:
                # train-seen items are removed from candidates AND targets).
                pos_items = pos_items - set(seen)
                if not pos_items:
                    continue
            top = np.argpartition(-s, k)[:k]
            top_items = set(items[top].tolist())
            recalls.append(len(pos_items & top_items) / len(pos_items))
    if not recalls:
        return float("nan")
    return float(np.mean(recalls))


def catalog_recall_at_k(
    params,
    bn_state,
    cfg: ModelConfig,
    splits,
    k: int = 100,
    max_users: int = 512,
    exclude_train: bool = True,
    user_chunk: int = 64,
    seed: int = 0,
) -> float:
    """JAX-engine catalog recall@k (see ``catalog_recall_from_scores``)."""
    items, X_cat, X_num = _item_feature_table(splits)
    M = len(items)
    d_item = jnp.asarray(items)
    d_cat = jnp.asarray(X_cat)
    d_num = jnp.asarray(X_num)

    # params / bn_state / the item tables are jit ARGUMENTS, not closures:
    # a closed-over table lowers as an HLO constant, which the tunneled
    # TPU's remote-compile endpoint rejects at production scale (HTTP 413 —
    # see benchmarks/kernels_scaled.py), and closed-over sharded params
    # would be gathered and embedded replicated on a mesh run.
    @jax.jit
    def score_users(p, bn, it_tab, cat_tab, num_tab, user_ids):
        def one(u):  # [C] -> [C, M] logits
            logits, _ = apply_dcn(
                p, bn, jnp.full((M,), u, jnp.int32), it_tab, cat_tab, num_tab,
                cfg=cfg, train=False,
            )
            return logits

        return jax.vmap(one)(user_ids)

    def score_fn(chunk: np.ndarray) -> np.ndarray:
        pad = user_chunk - len(chunk)
        return np.asarray(
            score_users(params, bn_state, d_item, d_cat, d_num,
                        jnp.asarray(np.r_[chunk, np.zeros(pad, np.int32)]))
        )[: len(chunk)]

    return catalog_recall_from_scores(
        score_fn, items, splits, k=k, max_users=max_users,
        exclude_train=exclude_train, user_chunk=user_chunk, seed=seed,
    )
