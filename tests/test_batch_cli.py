"""Offline batch inference (serve/batch_cli.py): JSONL output parity with
the online endpoint, home-city inference, and the chunked device path."""

import json

import pytest

from hhrs_tpu.serve.batch_cli import home_cities, main as batch_main


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from hhrs_tpu.data.synthetic import write_synthetic_dataset
    from hhrs_tpu.train.cli import main as train_main

    tmp = tmp_path_factory.mktemp("batchcli")
    data, art = str(tmp / "data"), str(tmp / "artifacts")
    write_synthetic_dataset(data, n_users=150, n_items=60, n_reviews=3000, seed=11)
    rc = train_main(["--data", data, "--out", art, "--epochs", "1",
                     "train.batch_size=256", "train.eval_batch_size=512"])
    assert rc == 0
    return data, art


def test_batch_matches_online(trained, tmp_path):
    from hhrs_tpu.serve.engine import RecommendationEngine

    data, art = trained
    out = str(tmp_path / "recs.jsonl")
    rc = batch_main(["--artifacts", art, "--data", data, "--out", out,
                     "--limit", "20", "--chunk", "8", "--lambda-param", "0.7"])
    assert rc == 0
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 20

    engine = RecommendationEngine.from_dirs(art, data)
    homes = home_cities(engine.main_df)
    nonempty = 0
    for rec in lines[:10]:
        assert rec["city"] == homes[rec["user_id"]]
        online = engine.recommend(rec["user_id"], rec["city"], "friends", 0.7)
        assert rec["hotels"] == online.get("ranked_hotels", []), rec["user_id"]
        nonempty += bool(rec["hotels"])
    assert nonempty > 0  # the parity check exercised real recommendations


def test_batch_fixed_city_and_users_file(trained, tmp_path):
    data, art = trained
    users_file = tmp_path / "users.txt"
    out = str(tmp_path / "recs2.jsonl")
    import pandas as pd

    df = pd.read_csv(f"{data}/hackathon_augmented_data.csv")
    city = df["city"].iloc[0]
    ids = df["guest_id"].unique()[:5]
    users_file.write_text("\n".join(str(u) for u in ids))
    rc = batch_main(["--artifacts", art, "--data", data, "--out", out,
                     "--users", str(users_file), "--city", city, "--chunk", "4"])
    assert rc == 0
    lines = [json.loads(l) for l in open(out)]
    assert [r["user_id"] for r in lines] == [int(u) for u in ids]
    assert all(r["city"] == city for r in lines)
    assert all(h["city"] == city for r in lines for h in r["hotels"])
