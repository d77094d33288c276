"""Catalog-ranking recall@k: oracle correctness + informativeness on a
denser-than-reference regime (VERDICT r1 item 4)."""

import numpy as np
import pytest

import jax

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data import Preprocessor, add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.preprocess import DatasetSplits
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
from hhrs_tpu.train.eval_retrieval import catalog_recall_at_k, _item_feature_table
from hhrs_tpu.train.trainer import train_dcn


def _mini_splits(n_users=30, n_items=40, rows=600, seed=0):
    rng = np.random.default_rng(seed)
    def part(n):
        return (
            rng.integers(0, n_users, n).astype(np.int32),
            rng.integers(0, n_items, n).astype(np.int32),
            rng.integers(0, 3, (n, 2)).astype(np.int32),
            rng.normal(size=(n, 11)).astype(np.float32),
            (rng.uniform(size=n) < 0.5).astype(np.float32),
        )
    return DatasetSplits(*part(rows), *part(rows // 3))


def test_item_feature_table_first_occurrence():
    splits = _mini_splits()
    items, cat, num = _item_feature_table(splits)
    assert len(items) == len(set(items.tolist()))
    # first occurrence of item items[0] in train+val rows carries its features
    all_item = np.concatenate([splits.train_item, splits.val_item])
    all_cat = np.concatenate([splits.train_cat, splits.val_cat])
    for i in (0, len(items) // 2, len(items) - 1):
        row = int(np.flatnonzero(all_item == items[i])[0])
        np.testing.assert_array_equal(cat[i], all_cat[row])


def test_catalog_recall_oracle_small():
    """Brute-force oracle on a tiny model: same number."""
    splits = _mini_splits(n_users=20, n_items=150, rows=800, seed=3)
    dims = ModelDims(20, 150, (("a", 3), ("b", 3)), 11)
    cfg = ModelConfig(emb_dim=4, hidden_dim=8, n_cross_layers=1, n_res_blocks=1, dropout=0.0)
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    k = 10

    got = catalog_recall_at_k(params, bn, cfg, splits, k=k, exclude_train=True)

    items, X_cat, X_num = _item_feature_table(splits)
    import jax.numpy as jnp

    val_pos = {}
    for u, it, y in zip(splits.val_user.tolist(), splits.val_item.tolist(),
                        (splits.val_y > 0.5).tolist()):
        if y:
            val_pos.setdefault(u, set()).add(it)
    train_seen = {}
    for u, it in zip(splits.train_user.tolist(), splits.train_item.tolist()):
        train_seen.setdefault(u, set()).add(it)

    recalls = []
    for u in sorted(val_pos):
        logits, _ = apply_dcn(
            params, bn, jnp.full((len(items),), u, jnp.int32), jnp.asarray(items),
            jnp.asarray(X_cat), jnp.asarray(X_num), cfg=cfg, train=False,
        )
        s = np.asarray(logits, np.float64)
        for it in train_seen.get(u, ()):
            hit = np.flatnonzero(items == it)
            if len(hit):
                s[hit[0]] = -np.inf
        top = set(items[np.argsort(-s)[:k]].tolist())
        # train-seen items leave both the candidate ranking AND the target
        # set (they are unreachable once masked to -inf)
        pos = val_pos[u] - train_seen.get(u, set())
        if not pos:
            continue
        recalls.append(len(top & pos) / len(pos))
    assert got == pytest.approx(float(np.mean(recalls)), abs=1e-9)


def test_catalog_recall_informative_on_dense_synthetic():
    """Dense regime: catalog ≫ k → metric lands strictly inside (0, 1)."""
    ds = generate_synthetic_dataset(n_users=300, n_items=800, n_reviews=15000, seed=5)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})))
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1,
                       dropout=0.2)
    tcfg = TrainConfig(batch_size=1024, n_epochs=3, eval_catalog_recall=True)
    res = train_dcn(splits, dims, mcfg, tcfg)
    r = res.final_metrics["catalog_recall_at_100"]
    assert 0.0 < r < 0.99, r
    # and above random chance (k / catalog; 3 quick epochs → modest margin)
    assert r > 1.1 * 100.0 / dims.n_items
