"""Lazy (sparse-row) embedding-table updates (train/lazy.py).

The contract: (1) when every table row is touched every step, lazy ==
dense optimizer BIT-EXACTLY for both 'adam' (torch L2-coupled) and
'adamw' (decoupled) — the formulas are the same, only the traffic
differs; (2) rows NOT touched by a batch keep their params and moments
frozen (the documented divergence, like torch.optim.SparseAdam);
(3) the production trainer runs end-to-end with the flag, converges with
the dense path, and checkpoint-resumes bit-exactly; (4) the mesh
(row-sharded-table) trainer supports it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
from hhrs_tpu.train.lazy import init_lazy_opt, make_lazy_update, split_params
from hhrs_tpu.train.metrics import bce_with_logits
from hhrs_tpu.train.optimizers import make_optimizer

CFG = ModelConfig(emb_dim=4, hidden_dim=16, n_cross_layers=1, n_res_blocks=1, dropout=0.0)
DIMS = ModelDims(n_users=8, n_items=6, cat_dims=(("c", 3),), n_num_features=5)


def _batch(full_coverage: bool, B=24, seed=0):
    rng = np.random.default_rng(seed)
    if full_coverage:  # every row of every table appears (duplicates too)
        user = np.concatenate([np.arange(8), rng.integers(0, 8, B - 8)])
        item = np.concatenate([np.arange(6), rng.integers(0, 6, B - 6)])
        cat = np.concatenate([np.arange(3), rng.integers(0, 3, B - 3)])
    else:  # rows {0,1} / {0} / {0} only
        user = rng.integers(0, 2, B)
        item = np.zeros(B, np.int64)
        cat = np.zeros(B, np.int64)
    return {
        "user": jnp.asarray(user.astype(np.int32)),
        "item": jnp.asarray(item.astype(np.int32)),
        "cat": jnp.asarray(cat.astype(np.int32))[:, None],
        "num": jnp.asarray(rng.normal(size=(B, 5)).astype(np.float32)),
        "y": jnp.asarray(rng.integers(0, 2, B).astype(np.float32)),
    }


def _dense_step(tx, batch, rng):
    def step(p, bn, o):
        def loss_fn(pp):
            logits, nbn = apply_dcn(pp, bn, batch["user"], batch["item"],
                                    batch["cat"], batch["num"], cfg=CFG,
                                    train=True, rng=rng)
            return bce_with_logits(logits, batch["y"]), nbn

        (l, nbn), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, no = tx.update(g, o, p)
        return jax.tree.map(lambda a, u: a + u, p, up), nbn, no, l

    return step


@pytest.mark.parametrize("optimizer", ["adamw", "adam"])
def test_lazy_equals_dense_under_full_coverage(optimizer):
    """Same formulas ⇒ same numbers when every row is touched every step.

    The equality probe uses ``cross_only``: with BatchNorm in the tower the
    res-block BIASES have a ~zero true gradient (BN's mean subtraction
    cancels them), and Adam amplifies each program's float-level gradient
    noise to m̂/√v̂ ≈ ±1 — two differently-fused grad programs then drift
    on those loss-irrelevant leaves by design, not by bug (observed 2e-3
    after 4 steps; losses identical to the last bit). cross_only has no BN,
    every gradient is real, and lazy == dense to float32 resolution on the
    whole tree.
    """
    cfg = ModelConfig(emb_dim=4, hidden_dim=16, n_cross_layers=2,
                      dropout=0.0, arch="cross_only")
    tcfg = TrainConfig(optimizer=optimizer, lr=1e-2, weight_decay=1e-2)
    tx = make_optimizer(optimizer, tcfg.lr, tcfg.weight_decay)
    params, bn = init_dcn(jax.random.PRNGKey(0), DIMS, cfg)
    batch = _batch(full_coverage=True)
    rng = jax.random.PRNGKey(1)

    def dense_step(p, b, o):
        def loss_fn(pp):
            logits, nbn = apply_dcn(pp, b, batch["user"], batch["item"],
                                    batch["cat"], batch["num"], cfg=cfg,
                                    train=True, rng=rng)
            return bce_with_logits(logits, batch["y"]), nbn

        (l, nbn), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, no = tx.update(g, o, p)
        return jax.tree.map(lambda a, u: a + u, p, up), nbn, no, l

    dp, dbn, dopt = params, bn, tx.init(params)
    lp, lbn, lopt = params, bn, init_lazy_opt(tx, params)
    dense = jax.jit(dense_step)
    lazy_update = make_lazy_update(cfg, tcfg)
    lazy = jax.jit(lambda p, b, o: lazy_update(p, b, o, tx.update, batch, rng))

    for step in range(4):
        dp, dbn, dopt, dl = dense(dp, dbn, dopt)
        lp, lbn, lopt, ll = lazy(lp, lbn, lopt)
        assert float(dl) == pytest.approx(float(ll), rel=1e-6), (optimizer, step)
    max_delta = jax.tree.reduce(
        max, jax.tree.map(lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))), dp, lp)
    )
    assert max_delta < 1e-6, (optimizer, max_delta)


@pytest.mark.parametrize("optimizer", ["adamw", "adam"])
def test_lazy_tables_match_dense_dcnr(optimizer):
    """Full dcnr arch: the TABLE updates (the thing lazy mode changes)
    match dense to float noise under full coverage; the BN-shadowed tower
    biases are excluded (see the zero-gradient note above)."""
    tcfg = TrainConfig(optimizer=optimizer, lr=1e-2, weight_decay=1e-2)
    tx = make_optimizer(optimizer, tcfg.lr, tcfg.weight_decay)
    params, bn = init_dcn(jax.random.PRNGKey(0), DIMS, CFG)
    batch = _batch(full_coverage=True)
    rng = jax.random.PRNGKey(1)
    dp, dbn, dopt = params, bn, tx.init(params)
    lp, lbn, lopt = params, bn, init_lazy_opt(tx, params)
    dense = jax.jit(_dense_step(tx, batch, rng))
    lazy_update = make_lazy_update(CFG, tcfg)
    lazy = jax.jit(lambda p, b, o: lazy_update(p, b, o, tx.update, batch, rng))
    for _ in range(4):
        dp, dbn, dopt, dl = dense(dp, dbn, dopt)
        lp, lbn, lopt, ll = lazy(lp, lbn, lopt)
        assert float(dl) == pytest.approx(float(ll), rel=1e-6)
    for key in ("user_embedding", "item_embedding"):
        np.testing.assert_allclose(np.asarray(dp[key]), np.asarray(lp[key]),
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp["cat_embeddings"][0]),
                               np.asarray(lp["cat_embeddings"][0]), atol=1e-6)


def test_lazy_untouched_rows_frozen():
    """Params AND moments of rows the batch never references stay put —
    the documented sparse semantics (dense adamw would decay them)."""
    tcfg = TrainConfig(optimizer="adamw", lr=1e-2, weight_decay=1e-1)
    tx = make_optimizer("adamw", tcfg.lr, tcfg.weight_decay)
    params, bn = init_dcn(jax.random.PRNGKey(0), DIMS, CFG)
    batch = _batch(full_coverage=False)
    lazy_update = make_lazy_update(CFG, tcfg)
    lp, lbn, lopt = params, bn, init_lazy_opt(tx, params)
    for _ in range(3):
        lp, lbn, lopt, _ = lazy_update(lp, lbn, lopt, tx.update, batch,
                                       jax.random.PRNGKey(1))
    u0, u1 = np.asarray(params["user_embedding"]), np.asarray(lp["user_embedding"])
    assert not np.allclose(u0[:2], u1[:2])  # touched rows moved
    np.testing.assert_array_equal(u0[2:], u1[2:])  # untouched rows frozen
    np.testing.assert_array_equal(
        np.asarray(lopt.m["user_embedding"][2:]), 0.0
    )
    # dense adamw moves untouched rows via decoupled decay — the divergence
    dense = _dense_step(tx, batch, jax.random.PRNGKey(1))
    dp, dbn, dopt = params, bn, tx.init(params)
    for _ in range(3):
        dp, dbn, dopt, _ = dense(dp, dbn, dopt)
    assert not np.allclose(np.asarray(dp["user_embedding"][2:]), u0[2:])


@pytest.fixture(scope="module")
def small_data():
    from hhrs_tpu.data import Preprocessor, add_engineered_features
    from hhrs_tpu.data.ingest import noise_filter
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset

    ds = generate_synthetic_dataset(n_users=150, n_items=60, n_reviews=3000, seed=5)
    df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(noise_filter(df))
    return splits, ModelDims.from_artifacts(art)


def test_trainer_lazy_converges_with_dense(small_data):
    from hhrs_tpu.train.trainer import train_dcn

    splits, dims = small_data
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1)
    lazy = train_dcn(splits, dims, mcfg,
                     TrainConfig(lr=3e-3, batch_size=256, n_epochs=3,
                                 lazy_table_updates=True))
    dense = train_dcn(splits, dims, mcfg,
                      TrainConfig(lr=3e-3, batch_size=256, n_epochs=3))
    assert lazy.history[-1]["val_loss"] < lazy.history[0]["val_loss"]
    assert lazy.final_metrics["val_logloss"] == pytest.approx(
        dense.final_metrics["val_logloss"], abs=5e-3
    )


def test_trainer_lazy_checkpoint_resume_bit_exact(small_data, tmp_path):
    from hhrs_tpu.train.trainer import train_dcn

    splits, dims = small_data
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1)

    def run(ckpt_dir, epochs):
        return train_dcn(
            splits, dims, mcfg,
            TrainConfig(lr=3e-3, batch_size=256, n_epochs=epochs,
                        lazy_table_updates=True),
            checkpoint_dir=ckpt_dir,
        )

    full = run(str(tmp_path / "full"), 4)
    _ = run(str(tmp_path / "split"), 2)  # saves epochs 1-2
    resumed = run(str(tmp_path / "split"), 4)  # resumes (incl. LazyOptState)
    assert resumed.final_metrics["val_logloss"] == pytest.approx(
        full.final_metrics["val_logloss"], rel=1e-6
    )
    for a, b in zip(jax.tree_util.tree_leaves(full.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_lazy_on_mesh(small_data):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from hhrs_tpu.parallel.mesh import make_mesh
    from hhrs_tpu.train.trainer import train_dcn

    splits, dims = small_data
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1)
    tc = TrainConfig(lr=3e-3, batch_size=256, n_epochs=2, lazy_table_updates=True)
    meshed = train_dcn(splits, dims, mcfg, tc, mesh=make_mesh(4, 2))
    single = train_dcn(splits, dims, mcfg, tc)
    assert meshed.final_metrics["val_logloss"] == pytest.approx(
        single.final_metrics["val_logloss"], rel=1e-3
    )
