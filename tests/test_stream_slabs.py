"""Out-of-core slab streaming (train.stream_slab_steps): the train split
stays host-side, double-buffered [K, B, ·] slabs upload per epoch — and
the run is numerically interchangeable with the resident-dataset path
(same permutation, same fold_in(epoch_rng, global_step) dropout stream)."""

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

MCFG = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=2, n_res_blocks=1,
                   dropout=0.3)
TCFG = TrainConfig(batch_size=256, n_epochs=3, seed=7, drop_remainder=False,
                   eval_batch_size=512, early_stop_patience=10)


@pytest.fixture(scope="module")
def data():
    ds = generate_synthetic_dataset(n_users=250, n_items=70, n_reviews=5000,
                                    seed=21)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})))
    splits, art = Preprocessor().fit_transform(df)
    return splits, ModelDims.from_artifacts(art)


@pytest.fixture(scope="module")
def resident_run(data):
    splits, dims = data
    return train_dcn(splits, dims, MCFG, TCFG)


def _assert_matches(slab_res, ref_res):
    ref_vl = np.array([h["val_loss"] for h in ref_res.history])
    sl_vl = np.array([h["val_loss"] for h in slab_res.history])
    assert len(ref_vl) == len(sl_vl)
    np.testing.assert_allclose(sl_vl, ref_vl, rtol=1e-6, atol=1e-8)
    assert [h["lr"] for h in slab_res.history] == [h["lr"] for h in ref_res.history]
    assert slab_res.final_metrics["val_logloss"] == pytest.approx(
        ref_res.final_metrics["val_logloss"], rel=1e-6)
    assert slab_res.final_metrics["val_auc"] == pytest.approx(
        ref_res.final_metrics["val_auc"], abs=1e-6)


def test_slab_streaming_matches_resident(data, resident_run):
    """K=4 with a ragged final slab (steps_per_epoch not divisible by K)."""
    splits, dims = data
    steps = -(-splits.n_train // TCFG.batch_size)
    cfg = dataclasses.replace(TCFG, stream_slab_steps=4)
    assert steps % 4 != 0  # the ragged-slab shape is actually exercised
    _assert_matches(train_dcn(splits, dims, MCFG, cfg), resident_run)


def test_slab_streaming_from_memmap(data, resident_run, tmp_path):
    """The split arrays may be np.memmap — datasets beyond host RAM: only
    the gathered slab rows ever materialize."""
    splits, dims = data
    mm = {}
    for f in ("train_user", "train_item", "train_cat", "train_num", "train_y"):
        p = tmp_path / f"{f}.npy"
        np.save(p, getattr(splits, f))
        mm[f] = np.load(p, mmap_mode="r")
    mm_splits = dataclasses.replace(splits, **mm)
    cfg = dataclasses.replace(TCFG, stream_slab_steps=4)
    _assert_matches(train_dcn(mm_splits, dims, MCFG, cfg), resident_run)


def test_slab_streaming_on_mesh(eight_devices, data, resident_run):
    """Composes with the mesh: slabs upload shard-aligned over 'data'."""
    from hhrs_tpu.parallel.mesh import make_mesh

    splits, dims = data
    cfg = dataclasses.replace(TCFG, stream_slab_steps=3)
    res = train_dcn(splits, dims, MCFG, cfg, mesh=make_mesh(4, 2))
    ref_vl = np.array([h["val_loss"] for h in resident_run.history])
    sl_vl = np.array([h["val_loss"] for h in res.history])
    np.testing.assert_allclose(sl_vl, ref_vl, rtol=1e-4, atol=1e-6)
    assert [h["lr"] for h in res.history] == \
        [h["lr"] for h in resident_run.history]
    # tables really sharded (no silent replicate-everything fallback)
    ue = res.params["user_embedding"]
    if dims.n_users % 2 == 0:
        assert ue.sharding.spec[0] == "model"


def test_slab_streaming_rejects_fused_epoch(data):
    splits, dims = data
    cfg = dataclasses.replace(TCFG, stream_slab_steps=2, fused_epoch=True)
    with pytest.raises(ValueError, match="mutually *exclusive|mutually"):
        train_dcn(splits, dims, MCFG, cfg)
