"""Property tests for the serve-time encoder fallback semantics (SURVEY.md
§4 plan; reference main.py:215-230): for ANY request-side inputs —

  * unknown user → internal id n_users//2 (reference main.py:217),
  * unknown item → 0, unknown category → 0,
  * known ids → their exact train-vocab codes,
  * scaled numericals respect the train min/max transform (including the
    zero-range column convention scale=1).
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from hhrs_tpu.data.preprocess import MinMaxStats, PreprocessArtifacts, encode_items_for_ranking

NUM_COLS = ["price_rub", "stars"]


def make_artifacts(n_users=10, n_items=7):
    return PreprocessArtifacts(
        user_id_mapping={100 + i: i for i in range(n_users)},
        item_id_mapping={200 + i: i for i in range(n_items)},
        cat_encoders={"city": {"A": 0, "B": 1, "C": 2}, "hotel_type": {"h": 0, "r": 1}},
        scaler=MinMaxStats(
            data_min=np.array([100.0, 1.0]), data_max=np.array([900.0, 1.0])
        ),  # stars has zero range → scale 1
        numerical_cols=NUM_COLS,
        categorical_cols=["city", "hotel_type"],
        medians={"price_rub": 500.0, "stars": 3.0},
    )


def items_frame(item_ids, cities, types, prices, stars):
    return pd.DataFrame({
        "item_id": item_ids,
        "city": cities,
        "hotel_type": types,
        "price_rub": prices,
        "stars": stars,
    })


@settings(max_examples=60, deadline=None)
@given(
    user_id=st.integers(min_value=-10_000, max_value=10_000),
    item_ids=st.lists(st.integers(min_value=-500, max_value=500), min_size=1, max_size=12),
    data=st.data(),
)
def test_fallback_properties(user_id, item_ids, data):
    art = make_artifacts()
    n = len(item_ids)
    cities = data.draw(st.lists(
        st.sampled_from(["A", "B", "C", "Zzz", "???"]), min_size=n, max_size=n))
    types = data.draw(st.lists(
        st.sampled_from(["h", "r", "unknown"]), min_size=n, max_size=n))
    prices = data.draw(st.lists(
        st.one_of(st.floats(0, 5000, allow_nan=False), st.just(np.nan)),
        min_size=n, max_size=n))
    stars = data.draw(st.lists(st.floats(1, 5, allow_nan=False), min_size=n, max_size=n))

    df = items_frame(item_ids, cities, types, prices, stars)
    users, items, X_cat, X_num = encode_items_for_ranking(art, df, user_id)

    # user fallback
    expected_user = art.user_id_mapping.get(user_id, art.n_users // 2)
    assert (users == expected_user).all()

    for i, ext in enumerate(item_ids):
        assert items[i] == art.item_id_mapping.get(ext, 0)
        assert X_cat[i, 0] == art.cat_encoders["city"].get(cities[i], 0)
        assert X_cat[i, 1] == art.cat_encoders["hotel_type"].get(types[i], 0)

    # numericals: NaN → median, then exact train transform
    filled = np.where(np.isnan(prices), art.medians["price_rub"], prices)
    np.testing.assert_allclose(X_num[:, 0], (filled - 100.0) / 800.0, rtol=1e-6)
    # zero-range column: sklearn convention scale=1 → x - min
    np.testing.assert_allclose(X_num[:, 1], np.asarray(stars) - 1.0, rtol=1e-6)

    assert np.isfinite(X_num).all()
