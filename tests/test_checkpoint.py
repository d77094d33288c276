"""Checkpoint/resume fault-injection tests (SURVEY.md §5: kill training
mid-run, assert resume continues identically to an uninterrupted run)."""

import dataclasses

import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data.features import add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.preprocess import Preprocessor
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.train.trainer import train_dcn

MCFG = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1, dropout=0.2)
TCFG = TrainConfig(lr=3e-3, batch_size=256, n_epochs=6, early_stop_patience=10,
                   eval_batch_size=1024)


@pytest.fixture(scope="module")
def small_splits():
    ds = generate_synthetic_dataset(n_users=200, n_items=80, n_reviews=4000, seed=11)
    df = add_engineered_features(noise_filter(ds.reviews.rename(
        columns={"guest_id": "user_id", "hotel_id": "item_id"})))
    return Preprocessor().fit_transform(df)


def test_resume_matches_uninterrupted(small_splits, tmp_path):
    splits, art = small_splits
    dims = ModelDims.from_artifacts(art)

    # Uninterrupted 6-epoch run.
    full = train_dcn(splits, dims, MCFG, TCFG)

    # Interrupted: 3 epochs with checkpointing, then "crash" and rerun to 6.
    ckpt_dir = str(tmp_path / "ckpt")
    part1 = train_dcn(
        splits, dims, MCFG, dataclasses.replace(TCFG, n_epochs=3), checkpoint_dir=ckpt_dir
    )
    assert len(part1.history) == 3

    part2 = train_dcn(splits, dims, MCFG, TCFG, checkpoint_dir=ckpt_dir)
    # Resumed run carries the prior history and continues from epoch 3.
    assert [h["epoch"] for h in part2.history] == list(range(6))

    for h_full, h_res in zip(full.history, part2.history):
        np.testing.assert_allclose(h_full["train_loss"], h_res["train_loss"], rtol=1e-5)
        np.testing.assert_allclose(h_full["val_loss"], h_res["val_loss"], rtol=1e-5)
        assert h_full["lr"] == pytest.approx(h_res["lr"])

    np.testing.assert_allclose(full.best_val_loss, part2.best_val_loss, rtol=1e-5)
    assert full.best_epoch == part2.best_epoch
    np.testing.assert_allclose(
        full.final_metrics["val_auc"], part2.final_metrics["val_auc"], rtol=1e-4
    )


def test_fused_epoch_matches_per_step(small_splits):
    """fused_epoch=True (whole-epoch lax.scan) must reproduce the per-step
    path's numerics when the rng stream is irrelevant (dropout=0)."""
    splits, art = small_splits
    dims = ModelDims.from_artifacts(art)
    mcfg = dataclasses.replace(MCFG, dropout=0.0)
    cfg3 = dataclasses.replace(TCFG, n_epochs=3)

    per_step = train_dcn(splits, dims, mcfg, dataclasses.replace(cfg3, fused_epoch=False))
    fused = train_dcn(splits, dims, mcfg, dataclasses.replace(cfg3, fused_epoch=True))
    for a, b in zip(per_step.history, fused.history):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"], rtol=1e-5)
        np.testing.assert_allclose(a["val_loss"], b["val_loss"], rtol=1e-5)


def test_fused_epoch_with_dropout_trains(small_splits):
    """Smoke: the fused path with dropout>0 (distinct rng stream) learns."""
    splits, art = small_splits
    dims = ModelDims.from_artifacts(art)
    cfg3 = dataclasses.replace(TCFG, n_epochs=3, fused_epoch=True)
    res = train_dcn(splits, dims, MCFG, cfg3)
    assert np.isfinite(res.best_val_loss)
    assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]


def test_resume_noop_when_complete(small_splits, tmp_path):
    """Resuming a finished run trains zero extra epochs, returns best state."""
    splits, art = small_splits
    dims = ModelDims.from_artifacts(art)
    ckpt_dir = str(tmp_path / "ckpt2")
    cfg3 = dataclasses.replace(TCFG, n_epochs=3)
    first = train_dcn(splits, dims, MCFG, cfg3, checkpoint_dir=ckpt_dir)
    again = train_dcn(splits, dims, MCFG, cfg3, checkpoint_dir=ckpt_dir)
    assert [h["epoch"] for h in again.history] == [0, 1, 2]
    np.testing.assert_allclose(first.best_val_loss, again.best_val_loss, rtol=1e-6)


def test_resume_after_early_stop_trains_no_extra_epochs(small_splits, tmp_path):
    """A resumed run whose checkpoint already satisfied early stopping must
    not train further (the loop's stop conditions are re-checked BEFORE
    entering, trainer.py) — re-invoking the same command after a crash
    during artifact export must be a no-op on the model."""
    splits, art = small_splits
    dims = ModelDims.from_artifacts(art)
    ckpt_dir = str(tmp_path / "ckpt_es")
    # patience 0: the first non-improving epoch stops the run
    cfg = dataclasses.replace(TCFG, early_stop_patience=0, n_epochs=6)
    first = train_dcn(splits, dims, MCFG, cfg, checkpoint_dir=ckpt_dir)
    stopped_at = len(first.history)
    assert stopped_at < 6  # early stop actually triggered

    second = train_dcn(splits, dims, MCFG, cfg, checkpoint_dir=ckpt_dir)
    assert [h["epoch"] for h in second.history] == [h["epoch"] for h in first.history]
    np.testing.assert_allclose(
        second.best_val_loss, first.best_val_loss, rtol=0, atol=0
    )


def test_resume_with_bf16_moments_matches_uninterrupted(small_splits, tmp_path):
    """train.moment_dtype=bfloat16 must round-trip through orbax: the
    restored mu keeps its bf16 dtype and the resumed run continues
    identically to an uninterrupted bf16-moment run."""
    splits, art = small_splits
    dims = ModelDims.from_artifacts(art)
    tcfg = dataclasses.replace(TCFG, moment_dtype="bfloat16")

    full = train_dcn(splits, dims, MCFG, tcfg)

    ckpt_dir = str(tmp_path / "ckpt_bf16mu")
    part1 = train_dcn(splits, dims, MCFG,
                      dataclasses.replace(tcfg, n_epochs=3),
                      checkpoint_dir=ckpt_dir)
    assert len(part1.history) == 3
    part2 = train_dcn(splits, dims, MCFG, tcfg, checkpoint_dir=ckpt_dir)
    assert [h["epoch"] for h in part2.history] == list(range(6))
    for h_full, h_res in zip(full.history, part2.history):
        np.testing.assert_allclose(h_full["train_loss"], h_res["train_loss"], rtol=1e-5)
        np.testing.assert_allclose(h_full["val_loss"], h_res["val_loss"], rtol=1e-5)
    np.testing.assert_allclose(full.best_val_loss, part2.best_val_loss, rtol=1e-5)


def test_resume_under_eval_every_and_mesh_resident(eight_devices, tmp_path):
    """Round-5 knobs compose with checkpoint/resume: a mesh_resident run
    with sparse validation (eval_every=2), killed after 2 epochs and
    resumed, reproduces the uninterrupted 4-epoch trajectory — the
    eval-cadence decisions are epoch-index-deterministic across resume."""
    import dataclasses

    from hhrs_tpu.parallel.mesh import make_mesh

    ds = generate_synthetic_dataset(n_users=200, n_items=60, n_reviews=4000,
                                    seed=13)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id",
                                   "hotel_id": "item_id"})))
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1,
                       n_res_blocks=1, dropout=0.2)
    base = TrainConfig(batch_size=256, n_epochs=4, seed=5,
                       drop_remainder=False, eval_batch_size=512,
                       early_stop_patience=10, eval_every=2,
                       mesh_resident_data=True)
    mesh = make_mesh(4, 2)

    full = train_dcn(splits, dims, mcfg, base, mesh=mesh)
    assert [h["epoch"] for h in full.history] == [1, 3]

    ck = str(tmp_path / "ck_r5")
    train_dcn(splits, dims, mcfg, dataclasses.replace(base, n_epochs=2),
              mesh=mesh, checkpoint_dir=ck)
    resumed = train_dcn(splits, dims, mcfg, base, mesh=mesh,
                        checkpoint_dir=ck)
    assert [h["epoch"] for h in resumed.history] == [1, 3]
    np.testing.assert_allclose(
        [h["val_loss"] for h in resumed.history],
        [h["val_loss"] for h in full.history], rtol=1e-6)
