"""Training-LOOP parity vs the reference torch loop (matched mechanics).

The strongest form of the head-to-head: identical initial weights,
identical per-epoch batch orders, dropout off → the two training loops
must produce the SAME val-loss trajectory (optimizer math, plateau
scheduler, BN updates, loss reduction all agree step-for-step), not just
statistically-overlapping final numbers. benchmarks/parity_train.py runs
the statistical version with each framework's natural shuffling.
"""

import numpy as np
import pytest

import jax

from hhrs_tpu.compat.torch_ref import train_reference_loop
from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data.features import add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.preprocess import Preprocessor
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims, init_dcn
from hhrs_tpu.train.trainer import train_dcn


def _splits(n_reviews=6000, seed=11):
    ds = generate_synthetic_dataset(n_users=300, n_items=80, n_reviews=n_reviews, seed=seed)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})))
    return Preprocessor().fit_transform(df)


@pytest.mark.parametrize("optimizer", ["adamw", "adam"])
def test_matched_trajectories(optimizer):
    splits, art = _splits()
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=2, n_res_blocks=1,
                       dropout=0.0)
    tcfg = TrainConfig(batch_size=256, n_epochs=4, seed=3, optimizer=optimizer,
                       drop_remainder=True, eval_batch_size=1024,
                       lr_plateau_patience=1, lr_plateau_factor=0.5,
                       early_stop_patience=10)

    # Reproduce train_dcn's init + shuffle streams exactly so the torch
    # replica consumes identical weights and identical batches.
    init_rng = jax.random.split(jax.random.PRNGKey(tcfg.seed))[0]
    init_params, _ = init_dcn(init_rng, dims, mcfg)
    srng = np.random.default_rng(tcfg.seed)
    perms = [srng.permutation(splits.n_train) for _ in range(tcfg.n_epochs)]

    ref = train_reference_loop(splits, dims, mcfg, tcfg,
                               perms=perms, init_params=init_params)
    ours = train_dcn(splits, dims, mcfg, tcfg)

    ref_vl = np.array([h["val_loss"] for h in ref["history"]])
    our_vl = np.array([h["val_loss"] for h in ours.history])
    assert len(ref_vl) == len(our_vl)
    # fp32 drift accumulates over ~80 steps; trajectories must still agree
    # to ~1e-3 relative (framework-different reduction orders).
    np.testing.assert_allclose(our_vl, ref_vl, rtol=2e-3, atol=2e-4)

    # plateau scheduler decisions agree (same LR trace)
    assert [h["lr"] for h in ref["history"]] == pytest.approx(
        [h["lr"] for h in ours.history], rel=1e-9
    )

    assert ours.final_metrics["val_logloss"] == pytest.approx(
        ref["final_metrics"]["val_logloss"], rel=2e-3, abs=2e-4
    )
    assert ours.final_metrics["val_auc"] == pytest.approx(
        ref["final_metrics"]["val_auc"], abs=2e-3
    )


def test_catalog_recall_scorer_parity():
    """Identical weights through the JAX scorer and the torch-oracle scorer
    must yield (near-)identical catalog recall@k — the two sides of the
    recall-parity measurement (benchmarks/parity_train.py) share the metric
    harness, so any gap could only come from the scoring stacks."""
    from hhrs_tpu.compat.torch_ref import TorchDCN, catalog_recall_torch, copy_params_to_torch
    from hhrs_tpu.train.eval_retrieval import catalog_recall_at_k

    splits, art = _splits()
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=2, n_res_blocks=1,
                       dropout=0.0)
    params, _ = init_dcn(jax.random.PRNGKey(0), dims, mcfg)
    from hhrs_tpu.models.dcn import init_bn_state

    bn = init_bn_state(mcfg)

    tmodel = TorchDCN(dims, mcfg)
    copy_params_to_torch(params, tmodel)

    # k small vs the 80-item catalog so the metric has headroom
    r_jax = catalog_recall_at_k(params, bn, mcfg, splits, k=20)
    r_torch = catalog_recall_torch(tmodel, splits, k=20)
    assert np.isfinite(r_jax) and np.isfinite(r_torch)
    # same weights, same harness: only f32 vs f64 matmul rounding at the
    # top-k boundary can differ
    assert abs(r_jax - r_torch) <= 0.005, (r_jax, r_torch)
