"""Integrated mesh training: the FULL train_dcn loop (epochs, eval,
plateau, early stop, checkpointing) with tables row-sharded over 'model'
and the epoch streamed over 'data' must match the single-device resident
trainer numerically (VERDICT round-1 item 2).

The streamed epoch layout preserves batch composition AND row order, and
the dropout rng stream is identical, so the comparison is tight — not a
statistical overlap."""

import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data.features import add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.preprocess import Preprocessor
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.parallel.mesh import make_mesh
from hhrs_tpu.train.trainer import train_dcn


def _splits(n_reviews=5000, seed=21):
    ds = generate_synthetic_dataset(n_users=250, n_items=70, n_reviews=n_reviews, seed=seed)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})))
    return Preprocessor().fit_transform(df)


MCFG = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=2, n_res_blocks=1,
                   dropout=0.3)
TCFG = TrainConfig(batch_size=256, n_epochs=3, seed=7, drop_remainder=False,
                   eval_batch_size=512, early_stop_patience=10)


@pytest.fixture(scope="module")
def data():
    splits, art = _splits()
    return splits, ModelDims.from_artifacts(art)


@pytest.fixture(scope="module")
def single_run(data):
    splits, dims = data
    return train_dcn(splits, dims, MCFG, TCFG)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (8, 1), (2, 4)])
def test_mesh_full_run_matches_single_device(eight_devices, data, single_run, mesh_shape):
    splits, dims = data
    mesh = make_mesh(*mesh_shape)
    sharded = train_dcn(splits, dims, MCFG, TCFG, mesh=mesh)

    ref_vl = np.array([h["val_loss"] for h in single_run.history])
    sh_vl = np.array([h["val_loss"] for h in sharded.history])
    assert len(ref_vl) == len(sh_vl)
    np.testing.assert_allclose(sh_vl, ref_vl, rtol=1e-4, atol=1e-6)
    assert [h["lr"] for h in sharded.history] == [h["lr"] for h in single_run.history]
    assert sharded.final_metrics["val_logloss"] == pytest.approx(
        single_run.final_metrics["val_logloss"], rel=1e-4
    )
    assert sharded.final_metrics["val_auc"] == pytest.approx(
        single_run.final_metrics["val_auc"], abs=1e-4
    )


def test_mesh_tables_actually_sharded(eight_devices, data):
    """The run's best params come back with the row-sharded layout (not a
    silent replicate-everything fallback)."""
    splits, dims = data
    mesh = make_mesh(2, 4)
    res = train_dcn(splits, dims, MCFG, TCFG, mesh=mesh)
    ue = res.params["user_embedding"]
    spec = ue.sharding.spec
    if dims.n_users % 4 == 0:
        assert spec[0] == "model"
    else:  # non-divisible rows legitimately replicate (sharding.py rule)
        assert spec == () or spec[0] is None


def test_mesh_batch_not_divisible_raises(eight_devices, data):
    splits, dims = data
    mesh = make_mesh(8, 1)
    bad = TrainConfig(batch_size=252, n_epochs=1)
    with pytest.raises(ValueError, match="data axis"):
        train_dcn(splits, dims, MCFG, bad, mesh=mesh)


def test_mesh_checkpoint_resume_bit_exact(eight_devices, data, tmp_path):
    """Kill-and-resume under the mesh: epochs 0-1, restart, epochs 2-3 ==
    one uninterrupted 4-epoch mesh run."""
    splits, dims = data
    mesh = make_mesh(4, 2)
    tcfg4 = TrainConfig(batch_size=256, n_epochs=4, seed=7, drop_remainder=False,
                        eval_batch_size=512, early_stop_patience=10)
    full = train_dcn(splits, dims, MCFG, tcfg4, mesh=mesh)

    tcfg2 = TrainConfig(batch_size=256, n_epochs=2, seed=7, drop_remainder=False,
                        eval_batch_size=512, early_stop_patience=10)
    ckdir = str(tmp_path / "ck")
    train_dcn(splits, dims, MCFG, tcfg2, mesh=mesh, checkpoint_dir=ckdir)
    resumed = train_dcn(splits, dims, MCFG, tcfg4, mesh=mesh, checkpoint_dir=ckdir)

    full_vl = [h["val_loss"] for h in full.history]
    res_vl = [h["val_loss"] for h in resumed.history]
    np.testing.assert_allclose(res_vl, full_vl, rtol=1e-6)


@pytest.mark.parametrize("exchange", ["psum", "all_to_all"])
def test_mesh_full_run_explicit_exchange_matches(eight_devices, exchange):
    """The FULL streamed trainer with mesh.explicit_exchange routes its
    table lookups through the hand-written shard_map exchange kernels
    (parallel/embedding.py) and must reproduce the GSPMD-lowered run.
    Table sizes here divide the model axis so the exchange actually
    engages (non-divisible tables legitimately fall back to local gathers).
    """
    ds = generate_synthetic_dataset(n_users=256, n_items=64, n_reviews=5000, seed=3)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})))
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mesh = make_mesh(4, 2)

    base = train_dcn(splits, dims, MCFG, TCFG, mesh=mesh)
    ex = train_dcn(splits, dims, MCFG, TCFG, mesh=mesh, explicit_exchange=exchange)

    base_vl = np.array([h["val_loss"] for h in base.history])
    ex_vl = np.array([h["val_loss"] for h in ex.history])
    assert len(base_vl) == len(ex_vl)
    # psum is bit-equivalent to GSPMD's own lowering; all_to_all re-orders
    # the grad scatter-add reductions, which Adam amplifies slightly.
    tol = 1e-6 if exchange == "psum" else 2e-3
    np.testing.assert_allclose(ex_vl, base_vl, rtol=tol)
    assert ex.final_metrics["val_auc"] == pytest.approx(
        base.final_metrics["val_auc"], abs=5e-3 if exchange == "all_to_all" else 1e-5
    )


def test_slab_streaming_composes_with_explicit_exchange(eight_devices):
    """stream_slab_steps + mesh + explicit_exchange must route the slab
    step's lookups through the exchange too (the out-of-core branch was
    silently dropping the flag — r4 review finding)."""
    ds = generate_synthetic_dataset(n_users=256, n_items=64, n_reviews=4000, seed=9)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})))
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mesh = make_mesh(4, 2)
    tcfg2 = TrainConfig(batch_size=256, n_epochs=2, seed=7, drop_remainder=False,
                        eval_batch_size=512, early_stop_patience=10,
                        stream_slab_steps=2)

    base = train_dcn(splits, dims, MCFG, tcfg2, mesh=mesh)
    ex = train_dcn(splits, dims, MCFG, tcfg2, mesh=mesh,
                   explicit_exchange="psum")
    base_vl = [h["val_loss"] for h in base.history]
    ex_vl = [h["val_loss"] for h in ex.history]
    np.testing.assert_allclose(ex_vl, base_vl, rtol=1e-6)


def test_mesh_capped_exchange_factor_m_matches_all_to_all(eight_devices, data):
    """VERDICT r4 item 3: 'capped' is config-reachable from the trainer.
    At capacity_factor = m it recovers the exact exchange (same kept set —
    ZERO overflow; trajectories agree to fusion-level f32 rounding: the
    cap's select/clip ops change XLA's fusion grouping, so bit-equality
    across a multi-epoch run is not guaranteed)."""
    splits, dims = data
    mesh = make_mesh(4, 2)
    exact = train_dcn(splits, dims, MCFG, TCFG, mesh=mesh,
                      explicit_exchange="all_to_all")
    capped = train_dcn(splits, dims, MCFG, TCFG, mesh=mesh,
                       explicit_exchange="capped",
                       exchange_capacity_factor=2.0)
    np.testing.assert_allclose(
        [h["val_loss"] for h in capped.history],
        [h["val_loss"] for h in exact.history], rtol=1e-5, atol=1e-6)
    assert all(h["exchange_overflow"] == 0.0 for h in capped.history)


def test_mesh_capped_exchange_counts_overflow_and_converges(eight_devices, data):
    """Factor 1.25 on real (skewed) id traffic: overflow is measured and
    logged per epoch, and the run still converges (VERDICT r4 item 3's
    'counted overflow and sane convergence')."""
    splits, dims = data
    mesh = make_mesh(4, 2)
    res = train_dcn(splits, dims, MCFG, TCFG, mesh=mesh,
                    explicit_exchange="capped",
                    exchange_capacity_factor=1.25)
    rates = [h["exchange_overflow"] for h in res.history]
    assert all(0.0 <= r < 0.5 for r in rates)
    assert any(r > 0.0 for r in rates)  # synthetic ids are skewed enough
    # sane convergence: the loss moved meaningfully downward
    vls = [h["val_loss"] for h in res.history]
    assert vls[-1] < vls[0]
    assert res.final_metrics["val_auc"] > 0.6


def test_capped_exchange_requires_mesh(data):
    splits, dims = data
    import pytest as _pytest
    with _pytest.raises(ValueError, match="requires"):
        train_dcn(splits, dims, MCFG, TCFG, explicit_exchange="capped")
    with _pytest.raises(ValueError, match="unknown mesh.explicit_exchange"):
        train_dcn(splits, dims, MCFG, TCFG, mesh=make_mesh(4, 2),
                  explicit_exchange="bogus")


def test_mesh_resident_data_matches_streaming(eight_devices, data, single_run):
    """train.mesh_resident_data=True: the dataset stays device-resident
    and replicated on the mesh (uploaded once; per-epoch upload = one perm
    vector — 12x on a high-latency host link, RESULTS.md r5) with
    identical numerics to both the streamed mesh path and the
    single-device trainer; tables stay row-sharded."""
    import dataclasses

    splits, dims = data
    mesh = make_mesh(4, 2)
    res = train_dcn(splits, dims, MCFG,
                    dataclasses.replace(TCFG, mesh_resident_data=True),
                    mesh=mesh)
    np.testing.assert_allclose(
        [h["val_loss"] for h in res.history],
        [h["val_loss"] for h in single_run.history], rtol=1e-4, atol=1e-6)
    if dims.n_users % 4 == 0:
        assert res.params["user_embedding"].sharding.spec[0] == "model"
    # and the capped exchange composes with it
    res2 = train_dcn(splits, dims, MCFG,
                     dataclasses.replace(TCFG, mesh_resident_data=True),
                     mesh=mesh, explicit_exchange="capped",
                     exchange_capacity_factor=1.25)
    assert any(h["exchange_overflow"] >= 0 for h in res2.history)
    assert res2.history[-1]["val_loss"] < res2.history[0]["val_loss"]
