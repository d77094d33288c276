"""Regression tests for the full-package review findings."""

import dataclasses

import numpy as np
import pandas as pd
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data.features import add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.preprocess import Preprocessor
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.train.trainer import train_dcn


def _tiny_splits(n_reviews=900, seed=5):
    ds = generate_synthetic_dataset(n_users=80, n_items=40, n_reviews=n_reviews, seed=seed)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})))
    return Preprocessor().fit_transform(df), ds


def test_no_drop_remainder_small_dataset_trains():
    """n_train < batch_size with drop_remainder=False must train (wrap-pad),
    not crash or double-count silently."""
    (splits, art), _ = _tiny_splits()
    assert splits.n_train < 2048
    mcfg = ModelConfig(emb_dim=8, hidden_dim=16, n_cross_layers=1, n_res_blocks=1)
    tcfg = TrainConfig(batch_size=2048, n_epochs=2, drop_remainder=False,
                       eval_batch_size=1024)
    res = train_dcn(splits, ModelDims.from_artifacts(art), mcfg, tcfg)
    assert np.isfinite(res.best_val_loss)

    # drop_remainder=True with too-large batch still fails loudly.
    with pytest.raises(ValueError):
        train_dcn(splits, ModelDims.from_artifacts(art), mcfg,
                  dataclasses.replace(tcfg, drop_remainder=True))


def test_engine_covers_large_friend_lists():
    """A user with >256 friends keeps ALL of them as candidate sources
    (reference main.py:172-178 uses the full friend list)."""
    from hhrs_tpu.retrieval.candidates import ServeUniverse
    from hhrs_tpu.retrieval.graph import FriendGraph

    (splits, art), ds = _tiny_splits(n_reviews=2000)
    # hub user: friends with 300 synthetic users (ids beyond the CSV are
    # dropped from indices; use review users so they index)
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"}))
    uni = ServeUniverse.from_df(main_df)
    users = uni.user_ids
    hub = int(users[0])
    pairs = pd.DataFrame({
        "user_id_1": [hub] * (len(users) - 1),
        "user_id_2": [int(u) for u in users[1:]],
    })
    graph = FriendGraph.from_pairs(pairs, uni.user_index)
    deg = len(graph.friend_indices(hub))
    assert deg == len(users) - 1

    padded = graph.padded_friend_indices(hub, max(256, -(-deg // 64) * 64), dump=uni.n_users)
    assert (padded < uni.n_users).sum() == deg  # none truncated


def test_native_csv_string_column_with_empty_first_cell(tmp_path):
    from hhrs_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime not built")
    from hhrs_tpu.runtime.csv import read_csv_native

    p = tmp_path / "x.csv"
    p.write_text("id,city\n1,\n2,Sochi\n3,Moscow\n")
    df = read_csv_native(str(p))
    assert pd.isna(df["city"].iloc[0])
    assert df["city"].iloc[1] == "Sochi"  # NOT NaN — column stayed categorical


def test_synthetic_friendships_have_homophily():
    """Same-cluster friendship rate must exceed the random baseline."""
    import numpy as np

    from hhrs_tpu.data import synthetic as syn

    rng = np.random.default_rng(0)
    # regenerate with access to clusters: replicate generator internals
    ds = syn.generate_synthetic_dataset(n_users=500, n_items=100, n_reviews=2000,
                                        n_friendships=2000, seed=7)
    # reconstruct clusters the same way the generator does
    g = np.random.default_rng(7)
    n_clusters = 8
    user_cluster = g.integers(0, n_clusters, size=500)
    a = ds.friendships["user_id_1"].to_numpy() - 1
    b = ds.friendships["user_id_2"].to_numpy() - 1
    same = (user_cluster[a] == user_cluster[b]).mean()
    assert same > 0.4  # random baseline ≈ 1/8; homophily target ≈ 0.7


def test_hpo_space_steps_match_reference():
    from hhrs_tpu.hpo.sampler import RandomSampler
    from hhrs_tpu.hpo.space import reference_search_space

    space = reference_search_space()
    s = RandomSampler(seed=0)
    for _ in range(100):
        p = s.sample(space, [])
        # reference train.py:184 step=0.05; :192 step=0.1
        assert round((p["dropout"] - 0.1) / 0.05) == pytest.approx((p["dropout"] - 0.1) / 0.05)
        assert abs((p["dropout"] - 0.1) / 0.05 - round((p["dropout"] - 0.1) / 0.05)) < 1e-9
        assert abs((p["lr_plateau_factor"] - 0.1) / 0.1 - round((p["lr_plateau_factor"] - 0.1) / 0.1)) < 1e-9


def test_hpo_cfg_passthrough():
    from hhrs_tpu.hpo.cli import model_cfg_from_params, train_cfg_from_params

    base_m = ModelConfig(arch="cross_only", compute_dtype="bfloat16")
    params = {"emb_dim": 16, "hidden_dim": 64, "n_cross_layers": 2, "n_res_blocks": 1,
              "dropout": 0.3, "lr": 1e-3, "batch_size": 512, "weight_decay": 1e-4,
              "optimizer": "adam", "lr_plateau_patience": 2, "lr_plateau_factor": 0.3}
    m = model_cfg_from_params(params, base_m)
    assert m.arch == "cross_only" and m.compute_dtype == "bfloat16"
    base_t = TrainConfig(fused_epoch=True, debug_nans=True, n_epochs=7)
    t = train_cfg_from_params(params, base_t)
    assert t.fused_epoch and t.debug_nans and t.n_epochs == 7


def test_latency_histogram_bounded_and_counts():
    from hhrs_tpu.utils.logging import LatencyHistogram

    h = LatencyHistogram(window=100)
    for i in range(250):
        h.observe(i / 1000.0)
    s = h.summary()
    assert s["count"] == 250  # lifetime counter
    assert len(h.samples) == 100  # bounded window


def test_hpo_cli_synthetic_rerun_no_regen_attr(tmp_path):
    """hhrs-hpo --synthetic must survive a second run (args.regen absent)."""
    from hhrs_tpu.hpo.cli import main

    common = ["--trials", "1", "--journal", str(tmp_path / "j.jsonl"),
              "--data", str(tmp_path / "d"), "--out", str(tmp_path / "a"),
              "--synthetic", "--synth-users", "80", "--synth-items", "40",
              "--synth-reviews", "900", "--epochs", "1",
              "train.eval_batch_size=512"]
    assert main(common) == 0
    assert main([*common[:3], str(tmp_path / "j2.jsonl"), *common[4:]]) == 0  # CSV exists now


def test_native_csv_all_empty_column_numeric(tmp_path):
    from hhrs_tpu.runtime import native_available

    if not native_available():
        import pytest as _pytest

        _pytest.skip("native runtime not built")
    from hhrs_tpu.runtime.csv import read_csv_native

    p = tmp_path / "e.csv"
    p.write_text("id,gap\n1,\n2,\n3,\n")
    df = read_csv_native(str(p))
    assert df["gap"].dtype == np.float64  # pandas parity: empty column → float NaN
    assert df["gap"].isna().all()


def test_batcher_close_unblocks_waiters():
    import threading
    import time as _time

    from hhrs_tpu.serve.batcher import BatchingEngine

    class Slow:
        def recommend_many(self, reqs, pad_to=None):
            _time.sleep(0.3)
            return [{"ok": True} for _ in reqs]

    front = BatchingEngine(Slow(), max_batch=2, window_ms=1.0)
    results = {}

    def call(i):
        try:
            results[i] = front.recommend(i, "X", "friends", 0.7)
        except RuntimeError as e:
            results[i] = e

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    _time.sleep(0.05)
    front.close()
    for t in threads:
        t.join(timeout=10)
        assert not t.is_alive()  # nobody hangs
    assert len(results) == 3
    # post-close calls error immediately
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        front.recommend(9, "X", "friends", 0.7)
