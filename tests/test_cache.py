"""Preprocessed-dataset cache: round trip, invalidation on CSV change,
corruption tolerance, CLI integration."""

import os
import time

import numpy as np

from hhrs_tpu.config import Config
from hhrs_tpu.data import cache
from hhrs_tpu.data.synthetic import write_synthetic_dataset


def _build(tmp_path, cache_dir=None):
    import argparse

    from hhrs_tpu.train.cli import build_dataset

    args = argparse.Namespace(
        synthetic=False, regen=False, data=str(tmp_path),
        synth_users=0, synth_items=0, synth_reviews=0,
        cache_dir=cache_dir,
    )
    return build_dataset(args, Config())


def test_cache_round_trip_and_invalidation(tmp_path):
    write_synthetic_dataset(str(tmp_path), n_users=100, n_items=40, n_reviews=1500, seed=1)
    cdir = str(tmp_path / "cache")

    s1, a1 = _build(tmp_path, cdir)
    assert len(os.listdir(cdir)) == 2  # npz + preproc.json

    s2, a2 = _build(tmp_path, cdir)  # hit
    np.testing.assert_array_equal(s1.train_user, s2.train_user)
    np.testing.assert_array_equal(s1.val_num, s2.val_num)
    assert a1.user_id_mapping == a2.user_id_mapping
    assert a1.scaler.data_min.tolist() == a2.scaler.data_min.tolist()

    # Changing the CSV invalidates the key (different mtime/size).
    time.sleep(0.01)
    write_synthetic_dataset(str(tmp_path), n_users=100, n_items=40, n_reviews=1600, seed=2)
    s3, _ = _build(tmp_path, cdir)
    assert s3.n_train != s1.n_train
    assert len(os.listdir(cdir)) == 4  # second entry


def test_cache_corruption_falls_back(tmp_path):
    write_synthetic_dataset(str(tmp_path), n_users=80, n_items=30, n_reviews=800, seed=3)
    cdir = str(tmp_path / "cache")
    s1, _ = _build(tmp_path, cdir)
    # corrupt the npz
    for f in os.listdir(cdir):
        if f.endswith(".npz"):
            (tmp_path / "cache" / f).write_bytes(b"garbage")
    s2, _ = _build(tmp_path, cdir)
    np.testing.assert_array_equal(s1.train_y, s2.train_y)
