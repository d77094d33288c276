"""Data layer tests: featurizer semantics, preprocessing parity, fallbacks."""

import numpy as np
import pandas as pd
import pytest

from hhrs_tpu.data import schema
from hhrs_tpu.data.features import add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.preprocess import (
    MinMaxStats,
    PreprocessArtifacts,
    Preprocessor,
    encode_items_for_ranking,
)
from hhrs_tpu.data.synthetic import generate_synthetic_dataset


def test_engineered_features_inf_nan_semantics():
    df = pd.DataFrame(
        {
            "price_rub": [100.0, 50.0, 10.0],
            "stars": [0.0, 5.0, 2.0],  # div-by-zero → inf → 0
            "rating_cleanliness": [8.0, 0.0, 6.0],
            "rating_service": [0.0, 0.0, 3.0],  # inf and nan cases
            "rating_overall": [9.0, 5.0, 7.0],
            "rating_location": [8.0, 6.0, 7.0],
        }
    )
    out = add_engineered_features(df.copy())
    assert out["price_per_star"].tolist() == [0.0, 10.0, 5.0]
    assert out["cleanliness_vs_service"].tolist() == [0.0, 0.0, 2.0]
    assert out["location_premium"].tolist() == [1.0, -1.0, 0.0]


def test_noise_filter_thresholds():
    df = pd.DataFrame({"rating_overall": [1, 4, 5, 7, 8, 10]})
    out = noise_filter(df)
    assert out["rating_overall"].tolist() == [1, 4, 8, 10]


def test_minmax_matches_sklearn():
    from sklearn.preprocessing import MinMaxScaler

    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 4))
    x[:, 3] = 7.0  # constant column → sklearn scale convention
    ours = MinMaxStats.fit(x).transform(x)
    theirs = MinMaxScaler().fit_transform(x)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def _tiny_df():
    ds = generate_synthetic_dataset(n_users=50, n_items=30, n_reviews=600, seed=1)
    df = ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    return add_engineered_features(df)


def test_preprocessor_end_to_end():
    df = _tiny_df()
    splits, art = Preprocessor().fit_transform(df)
    n = splits.n_train + splits.n_val
    assert n == len(df.dropna(subset=list(schema.CATEGORICAL_COLS)))
    assert abs(splits.n_val / n - 0.2) < 0.02
    # scaled numericals in [0, 1] (leakage-compat: scaler fit on full data)
    assert splits.train_num.min() >= -1e-9 and splits.train_num.max() <= 1 + 1e-9
    assert splits.val_num.min() >= -1e-9 and splits.val_num.max() <= 1 + 1e-9
    # vocab maps: contiguous 0..n-1, order of first appearance
    assert sorted(art.user_id_mapping.values()) == list(range(art.n_users))
    first_user = df["user_id"].iloc[0]
    assert art.user_id_mapping[first_user] == 0
    # cat encoders in sorted category order (pandas .cat.categories semantics)
    for col, enc in art.cat_encoders.items():
        cats = sorted(enc.keys())
        assert [enc[c] for c in cats] == list(range(len(cats)))


def test_split_matches_sklearn_reference_call():
    """Exact parity with reference train.py:67 split (seed 42, 20%)."""
    from sklearn.model_selection import train_test_split

    df = _tiny_df()
    splits, art = Preprocessor().fit_transform(df)
    y = df[schema.TARGET_COL].to_numpy(np.float32)
    idx = np.arange(len(df))
    tr, va, ytr, yva = train_test_split(idx, y, test_size=0.2, random_state=42)
    np.testing.assert_array_equal(splits.train_y, ytr)
    np.testing.assert_array_equal(splits.val_y, yva)


def test_serving_fallback_semantics():
    df = _tiny_df()
    _, art = Preprocessor().fit_transform(df)
    items = df.drop_duplicates(subset=["item_id"]).head(5).copy()
    # poison one row with an unknown item and category
    items.iloc[0, items.columns.get_loc("item_id")] = 10**9
    items.iloc[1, items.columns.get_loc("city")] = "Nowhere"
    unknown_user = 10**9
    users, item_idx, cats, nums = encode_items_for_ranking(art, items, unknown_user)
    assert (users == art.n_users // 2).all()  # unknown user → len//2
    assert item_idx[0] == 0  # unknown item → 0
    assert cats[1, 0] == 0  # unknown category → 0
    assert nums.shape == (5, len(art.numerical_cols))


def test_artifacts_roundtrip(tmp_path):
    df = _tiny_df()
    _, art = Preprocessor().fit_transform(df)
    p = str(tmp_path / "preproc.json")
    art.save(p)
    art2 = PreprocessArtifacts.load(p)
    assert art2.user_id_mapping == art.user_id_mapping
    assert art2.item_id_mapping == art.item_id_mapping
    assert art2.cat_encoders == art.cat_encoders
    np.testing.assert_allclose(art2.scaler.data_min, art.scaler.data_min)
    assert art2.unknown_user_id == art.unknown_user_id


def test_leakage_compat_flag_changes_scaler():
    """leakage_compat=True fits on ALL rows; False fits on train rows only."""
    from sklearn.model_selection import train_test_split

    df = _tiny_df()
    splits_clean, art_clean = Preprocessor(leakage_compat=False).fit_transform(df)
    _, art_leak = Preprocessor(leakage_compat=True).fit_transform(df)

    # recompute the raw (pre-scaling) numericals after fillna/dropna
    medians = df[list(schema.NUMERICAL_COLS)].median()
    dff = df.copy()
    dff[list(schema.NUMERICAL_COLS)] = dff[list(schema.NUMERICAL_COLS)].fillna(medians)
    dff = dff.dropna(subset=list(schema.CATEGORICAL_COLS))
    raw = dff[list(schema.NUMERICAL_COLS)].to_numpy(np.float64)
    y = dff[schema.TARGET_COL].to_numpy(np.float32)
    tr, va, _, _ = train_test_split(np.arange(len(dff)), y, test_size=0.2, random_state=42)

    np.testing.assert_allclose(art_leak.scaler.data_min, raw.min(0))
    np.testing.assert_allclose(art_leak.scaler.data_max, raw.max(0))
    np.testing.assert_allclose(art_clean.scaler.data_min, raw[tr].min(0))
    np.testing.assert_allclose(art_clean.scaler.data_max, raw[tr].max(0))


def test_artifacts_roundtrip_preserves_key_types(tmp_path):
    """Non-string mapping keys must survive the JSON round-trip: a NaN in
    the raw id column upcasts ids to float64 (keys like 7.0 — int("7.0")
    raises, so the old string-keyed format silently dropped every lookup
    after load), and a numeric categorical column keys its encoder by
    floats. Saved artifacts must behave identically to in-memory ones."""
    import numpy as np

    from hhrs_tpu.data.preprocess import PreprocessArtifacts, MinMaxStats

    art = PreprocessArtifacts(
        user_id_mapping={7.0: 0, 8.0: 1},
        item_id_mapping={100: 0, 101: 1},
        cat_encoders={"stars": {1.0: 0, 4.5: 1}, "city": {"Sochi": 0}},
        scaler=MinMaxStats(data_min=np.zeros(2), data_max=np.ones(2)),
        numerical_cols=["a", "b"],
        categorical_cols=["stars", "city"],
        medians={"a": 0.5, "b": 1.0},
    )
    path = str(tmp_path / "preproc.json")
    art.save(path)
    back = PreprocessArtifacts.load(path)
    assert back.user_id_mapping == {7.0: 0, 8.0: 1}
    assert back.item_id_mapping == {100: 0, 101: 1}
    assert back.cat_encoders["stars"] == {1.0: 0, 4.5: 1}
    assert back.cat_encoders["city"] == {"Sochi": 0}
