"""recall@k, flax adapter, and NaN-sanitizer tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
from hhrs_tpu.train.metrics import recall_at_k

DIMS = ModelDims(n_users=40, n_items=30, cat_dims=(("city", 5), ("hotel_type", 4)), n_num_features=11)


def oracle_recall_at_k(users, labels, scores, k):
    vals = []
    for u in np.unique(users):
        m = users == u
        if labels[m].sum() == 0:
            continue
        order = np.argsort(-scores[m], kind="stable")
        topk = set(order[:k])
        pos = np.flatnonzero(labels[m] > 0.5)
        vals.append(sum(1 for p in pos if p in topk) / len(pos))
    return float(np.mean(vals)) if vals else float("nan")


@pytest.mark.parametrize("k", [1, 3, 100])
def test_recall_at_k_matches_oracle(k):
    rng = np.random.default_rng(0)
    users = rng.integers(0, 25, 600)
    labels = (rng.uniform(size=600) < 0.3).astype(np.float32)
    scores = rng.normal(size=600)
    got = recall_at_k(users, labels, scores, k)
    want = oracle_recall_at_k(users, labels, scores, k)
    assert got == pytest.approx(want, abs=1e-12)


def test_recall_at_k_perfect_and_zero():
    users = np.zeros(10, int)
    labels = np.zeros(10)
    labels[:2] = 1
    scores = -np.arange(10, dtype=float)  # positives ranked first
    assert recall_at_k(users, labels, scores, 2) == 1.0
    assert recall_at_k(users, labels, -scores, 2) == 0.0
    assert np.isnan(recall_at_k(users, np.zeros(10), scores, 5))


def test_flax_adapter_matches_pure_fn():
    from hhrs_tpu.models.flax_module import DCNR, params_to_flax

    cfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1, dropout=0.0)
    params, state = init_dcn(jax.random.PRNGKey(0), DIMS, cfg)
    B = 16
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    user = jax.random.randint(ks[0], (B,), 0, DIMS.n_users)
    item = jax.random.randint(ks[1], (B,), 0, DIMS.n_items)
    cat = jnp.stack([jax.random.randint(ks[2], (B,), 0, 5),
                     jax.random.randint(ks[2], (B,), 0, 4)], axis=1)
    num = jax.random.normal(ks[3], (B, 11))

    ref, _ = apply_dcn(params, state, user, item, cat, num, cfg=cfg, train=False)

    module = DCNR(DIMS, cfg)
    variables = params_to_flax(params, state)
    out = module.apply(variables, user, item, cat, num, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    # init from scratch + train-mode mutation of batch_stats works
    v0 = module.init(jax.random.PRNGKey(3), user, item, cat, num)
    out2, mutated = module.apply(
        v0, user, item, cat, num, train=True,
        rngs={"dropout": jax.random.PRNGKey(4)}, mutable=["batch_stats"],
    )
    assert out2.shape == (B,)
    before = v0["batch_stats"]["dcn"]["res_blocks"][0]["bn1"]["mean"]
    after = mutated["batch_stats"]["dcn"]["res_blocks"][0]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_debug_nans_flags_poisoned_data():
    from hhrs_tpu.data.preprocess import DatasetSplits
    from hhrs_tpu.train.trainer import train_dcn

    rng = np.random.default_rng(0)
    n = 256
    num = rng.normal(size=(n, 11)).astype(np.float32)
    num[5, 3] = np.nan  # poisoned feature
    splits = DatasetSplits(
        train_user=rng.integers(0, 40, n).astype(np.int32),
        train_item=rng.integers(0, 30, n).astype(np.int32),
        train_cat=np.stack([rng.integers(0, 5, n), rng.integers(0, 4, n)], 1).astype(np.int32),
        train_num=num,
        train_y=(rng.uniform(size=n) < 0.5).astype(np.float32),
        val_user=rng.integers(0, 40, 64).astype(np.int32),
        val_item=rng.integers(0, 30, 64).astype(np.int32),
        val_cat=np.stack([rng.integers(0, 5, 64), rng.integers(0, 4, 64)], 1).astype(np.int32),
        val_num=rng.normal(size=(64, 11)).astype(np.float32),
        val_y=(rng.uniform(size=64) < 0.5).astype(np.float32),
    )
    mcfg = ModelConfig(emb_dim=8, hidden_dim=16, n_cross_layers=1, n_res_blocks=1)
    tcfg = TrainConfig(batch_size=256, n_epochs=1, debug_nans=True)
    try:
        with pytest.raises(FloatingPointError):
            train_dcn(splits, DIMS, mcfg, tcfg)
    finally:
        jax.config.update("jax_debug_nans", False)
