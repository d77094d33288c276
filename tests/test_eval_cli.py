"""Standalone eval CLI: saved-artifact (no-refit) preprocessing + metrics.

--split val must reproduce the training run's manifest metrics bit-for-bit
(same rows via the same seed-42 sklearn split, same eval program); the
fresh-data mode must score rows with ids the model never saw (serve
fallbacks, reference main.py:215-230).
"""

import json

import numpy as np
import pandas as pd
import pytest

from hhrs_tpu.train.eval_cli import main as eval_main


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from hhrs_tpu.data.synthetic import write_synthetic_dataset
    from hhrs_tpu.train.cli import main as train_main

    tmp = tmp_path_factory.mktemp("evalcli")
    data, art = str(tmp / "data"), str(tmp / "artifacts")
    write_synthetic_dataset(data, n_users=150, n_items=60, n_reviews=3000, seed=9)
    rc = train_main(["--data", data, "--out", art, "--epochs", "1",
                     "train.batch_size=256", "train.eval_batch_size=512"])
    assert rc == 0
    return data, art


def test_eval_val_split_reproduces_manifest(trained, capsys):
    data, art = trained
    rc = eval_main(["--artifacts", art, "--data", data, "--split", "val",
                    "--eval-batch", "512"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    manifest = json.load(open(f"{art}/manifest.json"))["metrics"]
    assert out["logloss"] == pytest.approx(manifest["val_logloss"], rel=1e-6)
    assert out["auc"] == pytest.approx(manifest["val_auc"], rel=1e-6)
    assert out["rmse"] == pytest.approx(manifest["val_rmse"], rel=1e-6)


def test_eval_fresh_data_with_unseen_ids(trained, tmp_path, capsys):
    """Rows whose user/item/category never appeared in training score via
    the serve fallbacks instead of crashing — the production shape of
    'yesterday's model on today's reviews'."""
    data, art = trained
    df = pd.read_csv(f"{data}/hackathon_augmented_data.csv")
    fresh = df.sample(n=200, random_state=0).copy()
    fresh.iloc[:50, fresh.columns.get_loc("guest_id")] = np.arange(10_000, 10_050)
    fresh.iloc[:30, fresh.columns.get_loc("hotel_id")] = np.arange(20_000, 20_030)
    # keep labels/ratings that survive the noise filter
    fresh_dir = tmp_path / "fresh"
    fresh_dir.mkdir()
    fresh.to_csv(fresh_dir / "hackathon_augmented_data.csv", index=False)

    rc = eval_main(["--artifacts", art, "--data", str(fresh_dir), "--eval-batch", "256"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0
    assert np.isfinite(out["logloss"]) and np.isfinite(out["rmse"])
    assert 0.0 <= out["auc"] <= 1.0
