"""Host-side CSV ingest: load, rename, noise-filter.

Mirrors the reference prologue (train.py:273-281; serve-side main.py:242-245):
rename guest_id→user_id / hotel_id→item_id and keep only strongly-labelled
rows (rating_overall >= 8 or <= 4) on the training path. If the native
runtime library (hhrs_tpu/runtime) is built, its C++ CSV reader is used for
the hot ingest; pandas is the always-available fallback.
"""

from __future__ import annotations

import logging
import os

import pandas as pd

from hhrs_tpu.data import schema

log = logging.getLogger(__name__)


def _read_csv(path: str, engine: str = "auto") -> pd.DataFrame:
    """native (C++ mmap reader) when built, pandas otherwise.

    'auto' is strict: if the native parse would diverge from pandas
    (prefix-sampled type misclassification or dropped short rows), it
    falls back to pandas for exact parity. Explicit 'native' proceeds
    with a logged warning (csv.py)."""
    if engine in ("auto", "native"):
        from hhrs_tpu import runtime

        if runtime.native_available():
            from hhrs_tpu.runtime.csv import NativeParseMismatch, read_csv_native

            try:
                return read_csv_native(path, strict=(engine == "auto"))
            except NativeParseMismatch as e:
                log.warning("%s; falling back to pandas", e)
                return pd.read_csv(path)
        if engine == "native":
            raise RuntimeError("native runtime not available")
    return pd.read_csv(path)


def load_reviews_csv(path: str, engine: str = "auto") -> pd.DataFrame:
    """Load the reviews CSV and normalize user/item column names.

    Validates the column contract up front (schema.REVIEWS_CSV_COLUMNS) so
    a wrong/truncated file fails with a clear error here instead of a bare
    KeyError deep inside the feature pipeline."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    df = _read_csv(path, engine)
    missing = [c for c in schema.REVIEWS_CSV_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"reviews CSV missing columns {missing}")
    df = df.rename(
        columns={schema.RAW_USER_COL: schema.USER_COL, schema.RAW_ITEM_COL: schema.ITEM_COL}
    )
    log.info("loaded %d review rows from %s", len(df), path)
    return df


def load_friendships_csv(path: str, engine: str = "auto") -> pd.DataFrame:
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    df = _read_csv(path, engine)
    missing = [c for c in schema.FRIEND_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"friendships CSV missing columns {missing}")
    return df


def noise_filter(
    df: pd.DataFrame, positive: float = 8.0, negative: float = 4.0
) -> pd.DataFrame:
    """Keep only confidently-labelled rows (reference train.py:280)."""
    before = len(df)
    out = df[(df["rating_overall"] >= positive) | (df["rating_overall"] <= negative)]
    log.info("noise filter: %d -> %d rows", before, len(out))
    return out
