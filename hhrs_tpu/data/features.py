"""Shared feature engineering — ONE implementation for train and serve.

The reference duplicates this logic in two files (train.py:284-287 and
main.py:248-253); here both paths call :func:`add_engineered_features`.
Semantics preserved exactly: division by zero → ±inf → 0, NaN → 0 for the
two ratio features; ``location_premium`` is a plain difference (NaNs kept,
later median-filled by the preprocessor, matching the reference order of
operations).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _safe_ratio(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        out = num / den
    out = np.where(np.isinf(out), 0.0, out)
    out = np.where(np.isnan(out), 0.0, out)
    return out


def add_engineered_features(df: pd.DataFrame) -> pd.DataFrame:
    """Add price_per_star, cleanliness_vs_service, location_premium in place."""
    df["price_per_star"] = _safe_ratio(
        df["price_rub"].to_numpy(dtype=np.float64),
        df["stars"].to_numpy(dtype=np.float64),
    )
    df["cleanliness_vs_service"] = _safe_ratio(
        df["rating_cleanliness"].to_numpy(dtype=np.float64),
        df["rating_service"].to_numpy(dtype=np.float64),
    )
    df["location_premium"] = df["rating_overall"] - df["rating_location"]
    return df
