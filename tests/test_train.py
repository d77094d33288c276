"""Trainer tests: metrics oracles, plateau parity, end-to-end learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data import add_engineered_features, Preprocessor
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.train.metrics import auc_score, auc_score_jnp, bce_with_logits, rmse_of_probs
from hhrs_tpu.train.optimizers import PlateauScheduler
from hhrs_tpu.train.trainer import train_dcn


def test_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(0)
    y = (rng.uniform(size=500) < 0.3).astype(np.float32)
    s = rng.normal(size=500) + y  # informative scores
    s[:50] = s[0]  # force ties
    assert abs(auc_score(y, s) - roc_auc_score(y, s)) < 1e-12

    # device AUC matches too, including with padding mask
    got = float(auc_score_jnp(jnp.asarray(y), jnp.asarray(s, jnp.float32)))
    assert abs(got - roc_auc_score(y, s)) < 1e-5

    mask = np.ones(520, np.float32)
    mask[500:] = 0
    yp = np.concatenate([y, np.zeros(20, np.float32)])
    sp = np.concatenate([s, rng.normal(size=20)]).astype(np.float32)
    got_masked = float(auc_score_jnp(jnp.asarray(yp), jnp.asarray(sp), jnp.asarray(mask)))
    assert abs(got_masked - roc_auc_score(y, s)) < 1e-5


def test_bce_matches_manual():
    logits = jnp.asarray([-2.0, 0.0, 3.0, 10.0])
    y = jnp.asarray([0.0, 1.0, 1.0, 0.0])
    ln, yn = np.asarray(logits, np.float64), np.asarray(y, np.float64)
    p = 1 / (1 + np.exp(-ln))
    expected = -np.mean(yn * np.log(p) + (1 - yn) * np.log(1 - p))
    assert abs(float(bce_with_logits(logits, y)) - expected) < 1e-3


def test_rmse_of_probs():
    y = np.array([0.0, 1.0])
    logits = np.array([0.0, 0.0])
    assert abs(rmse_of_probs(y, logits) - 0.5) < 1e-9


def test_plateau_scheduler_reduces_after_patience():
    sch = PlateauScheduler(lr=1.0, patience=2, factor=0.1)
    assert sch.step(1.0) == 1.0  # new best
    assert sch.step(1.0) == 1.0  # bad 1
    assert sch.step(1.0) == 1.0  # bad 2
    assert sch.step(1.0) == pytest.approx(0.1)  # bad 3 > patience → reduce
    assert sch.step(0.5) == pytest.approx(0.1)  # improvement, no change


@pytest.fixture(scope="module")
def trained():
    ds = generate_synthetic_dataset(n_users=400, n_items=150, n_reviews=12000, seed=5)
    df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=64, n_cross_layers=2, n_res_blocks=1, dropout=0.2)
    tcfg = TrainConfig(lr=3e-3, batch_size=512, n_epochs=8, weight_decay=1e-5)
    result = train_dcn(splits, dims, mcfg, tcfg)
    return splits, art, dims, mcfg, result


def test_training_learns_signal(trained):
    _, _, _, _, result = trained
    assert result.final_metrics["val_auc"] > 0.70, result.final_metrics
    assert result.final_metrics["val_logloss"] < 0.68
    assert len(result.history) >= 2
    # loss decreased over training
    assert result.history[-1]["val_loss"] < result.history[0]["val_loss"]


def test_best_checkpoint_is_best(trained):
    _, _, _, _, result = trained
    best = min(h["val_loss"] for h in result.history)
    assert result.best_val_loss == pytest.approx(best)


def test_pruning_hook_stops_training():
    ds = generate_synthetic_dataset(n_users=100, n_items=50, n_reviews=2000, seed=6)
    df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=4, hidden_dim=16, n_cross_layers=1, n_res_blocks=1)
    tcfg = TrainConfig(lr=1e-3, batch_size=256, n_epochs=10)
    result = train_dcn(splits, dims, mcfg, tcfg, report_fn=lambda e, v: e >= 1)
    assert result.pruned
    assert len(result.history) == 2


def test_rng_impl_rbg_trains_deterministically():
    """train.rng_impl=rbg (TPU hardware RBG dropout bits, +28-30% on the
    flagship step — benchmarks/prng_ab.py) runs the full loop, is
    deterministic for a fixed seed, and draws genuinely different masks
    than threefry (statistically equivalent, not bit-equal)."""
    ds = generate_synthetic_dataset(n_users=100, n_items=50, n_reviews=2000, seed=7)
    df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=4, hidden_dim=16, n_cross_layers=1, n_res_blocks=1,
                       dropout=0.5)

    def run(impl):
        tcfg = TrainConfig(lr=1e-3, batch_size=256, n_epochs=2, rng_impl=impl)
        return [h["train_loss"] for h in
                train_dcn(splits, dims, mcfg, tcfg).history]

    a, b = run("rbg"), run("rbg")
    assert all(np.isfinite(a))
    assert a == b  # fixed seed → bit-identical rerun
    assert a != run("threefry2x32")  # different impl → different masks

    with pytest.raises(ValueError, match="rng_impl"):
        run("philox")


def test_rng_impl_rbg_mesh_runs(eight_devices):
    """rbg composes with the mesh trainer (typed key through the streamed
    sharded step; GSPMD partitions RngBitGenerator). Bits are NOT asserted
    equal to single-device — only threefry guarantees sharding-invariant
    streams (config docstring)."""
    from jax.sharding import Mesh

    ds = generate_synthetic_dataset(n_users=100, n_items=50, n_reviews=4000, seed=7)
    df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=4, hidden_dim=16, n_cross_layers=1, n_res_blocks=1,
                       dropout=0.5)
    tcfg = TrainConfig(lr=1e-3, batch_size=256, n_epochs=1, rng_impl="rbg")
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    result = train_dcn(splits, dims, mcfg, tcfg, mesh=mesh)
    assert np.isfinite(result.history[0]["train_loss"])


def test_artifact_roundtrip(tmp_path, trained):
    from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
    from hhrs_tpu.models.dcn import apply_dcn

    splits, art, dims, mcfg, result = trained
    out = str(tmp_path / "artifacts")
    export_artifacts(out, result.params, result.bn_state, mcfg, dims, art, result.final_metrics)
    bundle = load_artifact_bundle(out)

    # identical logits from restored params
    B = 64
    a = {
        "user": jnp.asarray(splits.val_user[:B]),
        "item": jnp.asarray(splits.val_item[:B]),
        "cat": jnp.asarray(splits.val_cat[:B]),
        "num": jnp.asarray(splits.val_num[:B]),
    }
    l1, _ = apply_dcn(result.params, result.bn_state, a["user"], a["item"], a["cat"], a["num"], cfg=mcfg)
    l2, _ = apply_dcn(bundle.params, bundle.bn_state, a["user"], a["item"], a["cat"], a["num"], cfg=bundle.model_cfg)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)
    # item embeddings exported correctly
    np.testing.assert_allclose(
        bundle.item_embeddings, np.asarray(result.params["item_embedding"]), atol=1e-7
    )
    assert bundle.metrics["val_auc"] == pytest.approx(result.final_metrics["val_auc"])


def test_dp_mesh_training_runs(eight_devices):
    """DP over an 8-device mesh produces a finite loss trajectory."""
    from jax.sharding import Mesh

    ds = generate_synthetic_dataset(n_users=100, n_items=50, n_reviews=3000, seed=7)
    df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=4, hidden_dim=16, n_cross_layers=1, n_res_blocks=1)
    tcfg = TrainConfig(lr=1e-3, batch_size=256, n_epochs=2)
    mesh = Mesh(np.asarray(eight_devices), ("data",))
    result = train_dcn(splits, dims, mcfg, tcfg, mesh=mesh)
    assert np.isfinite(result.best_val_loss)


def test_plateau_lr_decay_never_recompiles():
    """The LR is an injected hyperparameter precisely so plateau decays
    never re-trace the donated step. Writing a python float into the
    hyperparams changed the leaf's aval and silently recompiled (r4 review
    finding, empirically cache 1 -> 2); pin the contract via the jit cache."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hhrs_tpu.train.optimizers import (
        get_learning_rate,
        make_optimizer,
        set_learning_rate,
    )

    tx = make_optimizer("adamw", 1e-3, 1e-4)
    params = {"w": jnp.ones((4, 4))}
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        g = jax.tree.map(jnp.ones_like, p)
        up, no = tx.update(g, o, p)
        return jax.tree.map(lambda a, u: a + u, p, up), no

    params, opt = step(params, opt)
    assert step._cache_size() == 1
    opt = set_learning_rate(opt, 5e-4)
    params, opt = step(params, opt)
    assert step._cache_size() == 1, "LR decay must not recompile the step"
    assert get_learning_rate(opt) == np.float32(5e-4)


def test_moment_dtype_bf16_trains_close_to_f32():
    """train.moment_dtype=bfloat16 stores Adam's mu in bf16 (the big-table
    traffic knob, benchmarks/moment_ab.py): the full loop runs, the state
    really holds bf16 mu leaves, results are deterministic, and quality
    lands within noise of f32 moments (statistically equivalent, not
    bit-identical — same contract as rng_impl=rbg)."""
    import jax
    import jax.numpy as jnp

    from hhrs_tpu.models.dcn import init_dcn
    from hhrs_tpu.train.optimizers import make_optimizer

    ds = generate_synthetic_dataset(n_users=100, n_items=50, n_reviews=2000, seed=8)
    df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=4, hidden_dim=16, n_cross_layers=1, n_res_blocks=1)

    def run(md):
        tcfg = TrainConfig(lr=1e-3, batch_size=256, n_epochs=2, moment_dtype=md)
        return train_dcn(splits, dims, mcfg, tcfg)

    rb = run("bfloat16")
    assert np.isfinite(rb.final_metrics["val_logloss"])
    # deterministic rerun
    assert run("bfloat16").final_metrics == rb.final_metrics
    # close to the f32-moment run, but NOT required to be identical
    rf = run("float32")
    assert abs(rb.final_metrics["val_logloss"] - rf.final_metrics["val_logloss"]) < 0.02

    # the optax state really carries bf16 mu (and f32 nu) for both optimizers
    for name in ("adamw", "adam"):
        tx = make_optimizer(name, 1e-3, 1e-4, moment_dtype="bfloat16")
        params, _ = init_dcn(jax.random.PRNGKey(0), dims, mcfg)
        st = tx.init(params)
        dtypes = {str(leaf.dtype) for leaf in jax.tree.leaves(st)
                  if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)}
        assert "bfloat16" in dtypes and "float32" in dtypes


def test_eval_every_skips_non_eval_epochs():
    """train.eval_every=2: only epochs 1, 3 (0-indexed) + the final epoch
    evaluate; train-step numerics are unchanged (same perms/rng), so the
    eval epochs' val losses equal the every-epoch run's at those epochs."""
    ds = generate_synthetic_dataset(n_users=200, n_items=60, n_reviews=4000,
                                    seed=11)
    df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id",
                                   "hotel_id": "item_id"}))
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1,
                       n_res_blocks=1, dropout=0.0)
    base = TrainConfig(batch_size=256, n_epochs=4, seed=3,
                       early_stop_patience=10, lr_plateau_patience=10)
    every = train_dcn(splits, dims, mcfg, base)
    import dataclasses
    sparse = train_dcn(splits, dims, mcfg,
                       dataclasses.replace(base, eval_every=2))
    assert [h["epoch"] for h in sparse.history] == [1, 3]
    by_epoch = {h["epoch"]: h["val_loss"] for h in every.history}
    for h in sparse.history:
        assert h["val_loss"] == pytest.approx(by_epoch[h["epoch"]], rel=1e-6)
    # final epoch always evaluates even when it's off-cadence
    sparse3 = train_dcn(splits, dims, mcfg,
                        dataclasses.replace(base, eval_every=3))
    assert [h["epoch"] for h in sparse3.history] == [2, 3]

    with pytest.raises(ValueError, match="eval_every"):
        train_dcn(splits, dims, mcfg, dataclasses.replace(base, eval_every=0))
