"""Preprocessing: vocab maps, categorical encoders, min-max scaling, split.

Reproduces the reference pipeline (train.py:36-87) exactly:
  * numericals median-filled, rows with NaN categoricals dropped;
  * user/item vocab maps in order of first appearance;
  * per-column category→int encoders in *sorted* category order (pandas
    ``.cat.categories`` semantics, train.py:49-51);
  * MinMaxScaler fit — by default on the FULL dataset before the split,
    deliberately reproducing the reference's leakage quirk
    (train.py:53-54 vs :67) so metrics are apples-to-apples; set
    ``leakage_compat=False`` for the clean variant;
  * 80/20 split with sklearn ``train_test_split(random_state=42)`` for
    bit-exact split parity with the reference (train.py:67).

Serve-time fallbacks (reference main.py:215-230) are preserved verbatim:
unknown user → ``len(user_map)//2``, unknown item → 0, unknown category → 0.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import pandas as pd

from hhrs_tpu.data import schema


@dataclass
class MinMaxStats:
    """MinMax scaling with sklearn's zero-range convention (scale=1)."""

    data_min: np.ndarray
    data_max: np.ndarray

    @property
    def scale(self) -> np.ndarray:
        rng = self.data_max - self.data_min
        return np.where(rng == 0.0, 1.0, rng)

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x, dtype=np.float64) - self.data_min) / self.scale

    @classmethod
    def fit(cls, x: np.ndarray) -> "MinMaxStats":
        x = np.asarray(x, dtype=np.float64)
        return cls(data_min=np.nanmin(x, axis=0), data_max=np.nanmax(x, axis=0))


@dataclass
class PreprocessArtifacts:
    """Everything the serve path needs to featurize a request."""

    user_id_mapping: dict
    item_id_mapping: dict
    cat_encoders: dict  # col -> {category: code}
    scaler: MinMaxStats
    numerical_cols: list
    categorical_cols: list
    medians: dict  # col -> median used for NaN fill

    @property
    def n_users(self) -> int:
        return len(self.user_id_mapping)

    @property
    def n_items(self) -> int:
        return len(self.item_id_mapping)

    @property
    def cat_dims(self) -> dict:
        return {col: len(enc) for col, enc in self.cat_encoders.items()}

    @property
    def unknown_user_id(self) -> int:
        # Reference fallback for cold-start users (main.py:217).
        return len(self.user_id_mapping) // 2

    def to_json_dict(self) -> dict:
        def _pairs(m):
            # Keys as NATIVE JSON values (int/float/str — numpy scalars
            # unwrapped), stored as [key, value] pairs: JSON object keys
            # are always strings, and str()-ing e.g. a float id 7.0 used
            # to come back as the STRING "7.0" (int("7.0") raises), so a
            # disk-loaded artifact silently missed every lookup that the
            # in-memory artifact hit. Pairs round-trip the key type.
            return [
                [k.item() if hasattr(k, "item") else k, int(v)]
                for k, v in m.items()
            ]

        return {
            "user_id_mapping": _pairs(self.user_id_mapping),
            "item_id_mapping": _pairs(self.item_id_mapping),
            "cat_encoders": {
                col: _pairs(enc) for col, enc in self.cat_encoders.items()
            },
            "scaler_min": self.scaler.data_min.tolist(),
            "scaler_max": self.scaler.data_max.tolist(),
            "numerical_cols": list(self.numerical_cols),
            "categorical_cols": list(self.categorical_cols),
            "medians": {k: float(v) for k, v in self.medians.items()},
        }

    @classmethod
    def from_json_dict(cls, d: dict) -> "PreprocessArtifacts":
        def _map(m):
            if isinstance(m, dict):  # legacy artifacts: string-keyed object
                out = {}
                for k, v in m.items():
                    try:
                        out[int(k)] = int(v)
                    except ValueError:
                        try:
                            out[float(k)] = int(v)
                        except ValueError:
                            out[k] = int(v)
                return out
            return {k: int(v) for k, v in m}  # native-typed pair list

        return cls(
            user_id_mapping=_map(d["user_id_mapping"]),
            item_id_mapping=_map(d["item_id_mapping"]),
            cat_encoders={col: _map(enc) for col, enc in d["cat_encoders"].items()},
            scaler=MinMaxStats(
                data_min=np.asarray(d["scaler_min"], dtype=np.float64),
                data_max=np.asarray(d["scaler_max"], dtype=np.float64),
            ),
            numerical_cols=list(d["numerical_cols"]),
            categorical_cols=list(d["categorical_cols"]),
            medians=dict(d["medians"]),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_json_dict(), f)

    @classmethod
    def load(cls, path: str) -> "PreprocessArtifacts":
        with open(path) as f:
            return cls.from_json_dict(json.load(f))


@dataclass
class DatasetSplits:
    """Encoded arrays, already split. Shapes are static per split."""

    train_user: np.ndarray
    train_item: np.ndarray
    train_cat: np.ndarray
    train_num: np.ndarray
    train_y: np.ndarray
    val_user: np.ndarray
    val_item: np.ndarray
    val_cat: np.ndarray
    val_num: np.ndarray
    val_y: np.ndarray

    @property
    def n_train(self) -> int:
        return len(self.train_y)

    @property
    def n_val(self) -> int:
        return len(self.val_y)


class Preprocessor:
    """Fit/transform with the reference's exact semantics."""

    def __init__(
        self,
        user_col: str = schema.USER_COL,
        item_col: str = schema.ITEM_COL,
        target_col: str = schema.TARGET_COL,
        categorical_cols=schema.CATEGORICAL_COLS,
        numerical_cols=schema.NUMERICAL_COLS,
        test_size: float = 0.2,
        split_seed: int = 42,
        leakage_compat: bool = True,
    ):
        self.user_col = user_col
        self.item_col = item_col
        self.target_col = target_col
        self.categorical_cols = list(categorical_cols)
        self.numerical_cols = list(numerical_cols)
        self.test_size = test_size
        self.split_seed = split_seed
        self.leakage_compat = leakage_compat

    def fit_transform(self, df: pd.DataFrame) -> tuple[DatasetSplits, PreprocessArtifacts]:
        df = df.copy()

        if self.leakage_compat:
            # reference order (train.py:39-54): full-dataset medians AND
            # scaler, computed before the split — the documented leakage
            # quirk, reproduced for metric parity
            medians = df[self.numerical_cols].median()
            df[self.numerical_cols] = df[self.numerical_cols].fillna(medians)
            df = df.dropna(subset=self.categorical_cols)
            pre_idx = None
        else:
            # clean variant: NO full-dataset statistics. The cat-NaN drop is
            # independent of the numeric fill, so the row set (and hence the
            # seeded split) is identical either way; medians and scaler then
            # come from TRAIN rows only.
            df = df.dropna(subset=self.categorical_cols)
            pre_idx = self._split(
                len(df), df[self.target_col].to_numpy(dtype=np.float32)
            )
            medians = df.iloc[pre_idx[0]][self.numerical_cols].median()
            df[self.numerical_cols] = df[self.numerical_cols].fillna(medians)

        user_map = {orig: i for i, orig in enumerate(df[self.user_col].unique())}
        item_map = {orig: i for i, orig in enumerate(df[self.item_col].unique())}
        user_enc = df[self.user_col].map(user_map).to_numpy(dtype=np.int32)
        item_enc = df[self.item_col].map(item_map).to_numpy(dtype=np.int32)

        cat_encoders = {}
        cat_cols = []
        for col in self.categorical_cols:
            cats = pd.Categorical(df[col])
            cat_encoders[col] = {cat: i for i, cat in enumerate(cats.categories)}
            cat_cols.append(cats.codes.astype(np.int32))
        X_cat = np.stack(cat_cols, axis=1) if cat_cols else np.zeros((len(df), 0), np.int32)

        X_num_raw = df[self.numerical_cols].to_numpy(dtype=np.float64)
        y = df[self.target_col].to_numpy(dtype=np.float32)

        if self.leakage_compat:
            scaler = MinMaxStats.fit(X_num_raw)
            X_num = scaler.transform(X_num_raw).astype(np.float32)
            tr_idx, va_idx = self._split(len(df), y)
        else:
            tr_idx, va_idx = pre_idx  # computed pre-fill; same rows, same seed
            scaler = MinMaxStats.fit(X_num_raw[tr_idx])
            X_num = scaler.transform(X_num_raw).astype(np.float32)

        artifacts = PreprocessArtifacts(
            user_id_mapping=user_map,
            item_id_mapping=item_map,
            cat_encoders=cat_encoders,
            scaler=scaler,
            numerical_cols=self.numerical_cols,
            categorical_cols=self.categorical_cols,
            medians={c: float(medians[c]) for c in self.numerical_cols},
        )

        splits = DatasetSplits(
            train_user=user_enc[tr_idx],
            train_item=item_enc[tr_idx],
            train_cat=X_cat[tr_idx],
            train_num=X_num[tr_idx],
            train_y=y[tr_idx],
            val_user=user_enc[va_idx],
            val_item=item_enc[va_idx],
            val_cat=X_cat[va_idx],
            val_num=X_num[va_idx],
            val_y=y[va_idx],
        )
        return splits, artifacts

    def _split(self, n: int, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # sklearn's exact shuffling for split parity (reference train.py:67).
        from sklearn.model_selection import train_test_split

        indices = np.arange(n)
        tr_idx, va_idx, _, _ = train_test_split(
            indices, y, test_size=self.test_size, random_state=self.split_seed
        )
        return tr_idx, va_idx


def transform_with_artifacts(
    artifacts: PreprocessArtifacts,
    df: pd.DataFrame,
) -> dict:
    """Transform a LABELED review frame with SAVED artifacts — no refit.

    The standalone-eval path (train/eval_cli.py): encode with the train
    vocab, median-fill and scale with the train stats. Rows with ids the
    training run never saw get the serve-time fallbacks (unknown user →
    n_users//2, unknown item/category → 0 — reference main.py:215-230), so
    a production model can be scored on fresher data than it was fit on.
    Returns {"user","item","cat","num","y"} numpy arrays ("y" only if the
    target column is present).
    """
    df = df.dropna(subset=list(artifacts.categorical_cols))
    users = (
        df[schema.USER_COL]
        .map(artifacts.user_id_mapping)
        .fillna(artifacts.unknown_user_id)
        .to_numpy(dtype=np.int32)
    )
    items = (
        df[schema.ITEM_COL]
        .map(artifacts.item_id_mapping)
        .fillna(0)
        .to_numpy(dtype=np.int32)
    )
    cats = []
    for col in artifacts.categorical_cols:
        enc = artifacts.cat_encoders[col]
        cats.append(df[col].map(enc).fillna(0).to_numpy(dtype=np.int32))
    X_cat = np.stack(cats, axis=1) if cats else np.zeros((len(df), 0), np.int32)
    raw_num = df[list(artifacts.numerical_cols)].to_numpy(dtype=np.float64)
    med = np.asarray([artifacts.medians[c] for c in artifacts.numerical_cols])
    raw_num = np.where(np.isnan(raw_num), med, raw_num)
    X_num = artifacts.scaler.transform(raw_num).astype(np.float32)
    out = {"user": users, "item": items, "cat": X_cat, "num": X_num}
    if schema.TARGET_COL in df.columns:
        out["y"] = df[schema.TARGET_COL].to_numpy(dtype=np.float32)
    return out


def encode_item_features(
    artifacts: PreprocessArtifacts,
    items_df: pd.DataFrame,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-item featurization with reference fallback semantics (main.py:
    215-230): unknown item → 0, unknown category → 0; numericals
    median-filled with the TRAIN medians then scaled with the train
    scaler. The ONE implementation — used by per-request ranking
    (encode_items_for_ranking) and the serve engine's startup item matrix
    (serve/engine.py), so the two can never drift.

    The median fill is a robustness fix over the reference serve path
    (main.py:228 lets NaN flow into the model) — not a behavior change
    for clean rows. Returns (items, X_cat, X_num)."""
    n = len(items_df)
    items = (
        items_df[schema.ITEM_COL]
        .map(artifacts.item_id_mapping)
        .fillna(0)
        .to_numpy(dtype=np.int32)
    )
    cats = []
    for col in artifacts.categorical_cols:
        enc = artifacts.cat_encoders[col]
        cats.append(items_df[col].map(enc).fillna(0).to_numpy(dtype=np.int32))
    X_cat = np.stack(cats, axis=1) if cats else np.zeros((n, 0), np.int32)
    raw_num = items_df[list(artifacts.numerical_cols)].to_numpy(dtype=np.float64)
    med = np.asarray([artifacts.medians[c] for c in artifacts.numerical_cols])
    raw_num = np.where(np.isnan(raw_num), med, raw_num)
    X_num = artifacts.scaler.transform(raw_num).astype(np.float32)
    return items, X_cat, X_num


def encode_items_for_ranking(
    artifacts: PreprocessArtifacts,
    items_df: pd.DataFrame,
    user_id: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Serve-time featurization with reference fallback semantics
    (main.py:215-230): unknown user → n_users//2, unknown item → 0,
    unknown category → 0. Numericals are scaled with the train scaler.
    """
    internal_user = artifacts.user_id_mapping.get(user_id, artifacts.unknown_user_id)
    users = np.full(len(items_df), internal_user, dtype=np.int32)
    items, X_cat, X_num = encode_item_features(artifacts, items_df)
    return users, items, X_cat, X_num
