"""Warm-start fine-tuning: continue a shipped model on fresher data.

The reference has no retraining story — ``python train.py`` always fits
from scratch and re-derives every vocab (reference train.py:36-87), so a
nightly refresh both wastes the previous fit and scrambles the id→row
mapping under the old model's feet. This module is the production
retrain path the registry flow implies (train v1 → register → fine-tune
on refreshed data FROM v1 → register v2 → serve hot-swaps,
serve/reload.py):

* **Preprocessing is anchored to the artifact**: categorical encoders,
  numerical medians, and the MinMax scaler are FROZEN (same contract as
  serve-time featurization, reference main.py:215-230 — unknown
  category → 0); refitting them would silently shift every feature the
  copied weights were trained against.
* **User/item vocabs GROW**: ids the artifact knows keep their exact
  rows; unseen ids append in first-seen order. The fine-tuned artifact
  therefore stays id-compatible with the old one — and with any
  downstream system holding old internal ids.
* **Params copy row-aligned**: old table rows are copied into the
  (larger) fresh tables, new rows keep their fresh init; tower weights
  and BN state copy verbatim (the architecture comes FROM the
  artifact's manifest — shapes must match by construction).
* Optimizer moments start at zero; shuffle/dropout streams equal a cold
  run's (train_dcn's ``init_state`` hook changes only the start point).

CLI: ``python -m hhrs_tpu.train.cli --init-from <artifact_dir>``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import jax
import numpy as np
import pandas as pd

from hhrs_tpu.data import schema
from hhrs_tpu.data.preprocess import DatasetSplits, PreprocessArtifacts
from hhrs_tpu.models.dcn import ModelDims, init_dcn
from hhrs_tpu.train.artifacts import ArtifactBundle

log = logging.getLogger(__name__)


@dataclass
class WarmStart:
    """Everything train_dcn needs for a fine-tuning run."""

    splits: DatasetSplits
    preproc: PreprocessArtifacts  # extended vocabs, frozen encoders/stats
    dims: ModelDims
    params: dict
    bn_state: dict
    n_new_users: int
    n_new_items: int


def extend_mapping(mapping: dict, ids) -> tuple[dict, int]:
    """Old ids keep their rows; unseen ids append in first-seen order.
    Returns (extended mapping, number of appended rows)."""
    out = dict(mapping)
    n = len(out)
    for i in pd.unique(np.asarray(ids)):
        key = i.item() if hasattr(i, "item") else i
        if key not in out:
            out[key] = n
            n += 1
    return out, n - len(mapping)


def _encode(preproc: PreprocessArtifacts, df: pd.DataFrame):
    """Encode with EXTENDED user/item maps + frozen encoders/stats — the
    transform_with_artifacts semantics except known-by-extension ids
    resolve instead of falling back."""
    users_s = df[schema.USER_COL].map(preproc.user_id_mapping)
    items_s = df[schema.ITEM_COL].map(preproc.item_id_mapping)
    if users_s.isna().any() or items_s.isna().any():  # pragma: no cover
        raise AssertionError("extended vocab must cover every row")
    users, items = users_s.to_numpy(np.int64), items_s.to_numpy(np.int64)
    cats = []
    for col in preproc.categorical_cols:
        enc = preproc.cat_encoders[col]
        cats.append(df[col].map(enc).fillna(0).to_numpy(dtype=np.int32))
    X_cat = np.stack(cats, axis=1) if cats else np.zeros((len(df), 0), np.int32)
    raw = df[list(preproc.numerical_cols)].to_numpy(dtype=np.float64)
    med = np.asarray([preproc.medians[c] for c in preproc.numerical_cols])
    raw = np.where(np.isnan(raw), med, raw)
    X_num = preproc.scaler.transform(raw).astype(np.float32)
    y = df[schema.TARGET_COL].to_numpy(dtype=np.float32)
    return (users.astype(np.int32), items.astype(np.int32), X_cat, X_num, y)


def prepare_warm_start(
    bundle: ArtifactBundle,
    df: pd.DataFrame,
    test_size: float = 0.2,
    split_seed: int = 42,
    init_seed: int = 42,
) -> WarmStart:
    """Build the fine-tuning dataset + initial model state from a shipped
    artifact bundle and a (noise-filtered, feature-engineered) review frame.
    """
    df = df.dropna(subset=list(bundle.preproc.categorical_cols))

    user_map, n_new_users = extend_mapping(
        bundle.preproc.user_id_mapping, df[schema.USER_COL]
    )
    item_map, n_new_items = extend_mapping(
        bundle.preproc.item_id_mapping, df[schema.ITEM_COL]
    )
    preproc = PreprocessArtifacts(
        user_id_mapping=user_map,
        item_id_mapping=item_map,
        cat_encoders=bundle.preproc.cat_encoders,
        scaler=bundle.preproc.scaler,
        numerical_cols=bundle.preproc.numerical_cols,
        categorical_cols=bundle.preproc.categorical_cols,
        medians=bundle.preproc.medians,
    )
    dims = ModelDims.from_artifacts(preproc)
    if dict(dims.cat_dims) != dict(bundle.dims.cat_dims) or (
        dims.n_num_features != bundle.dims.n_num_features
    ):
        raise ValueError(
            "warm start: categorical/numerical feature layout differs from "
            f"the artifact ({dict(dims.cat_dims)}/{dims.n_num_features} vs "
            f"{dict(bundle.dims.cat_dims)}/{bundle.dims.n_num_features})"
        )

    # Fresh init at the GROWN dims (new rows keep this), then copy the
    # artifact's weights row-aligned. Same init stream as a cold run.
    init_rng, _ = jax.random.split(jax.random.PRNGKey(init_seed))
    params, _ = init_dcn(init_rng, dims, bundle.model_cfg)
    old = jax.device_get({"params": bundle.params, "bn_state": bundle.bn_state})

    def copy_rows(fresh, trained):
        trained = np.asarray(trained)
        if fresh.shape[1:] != trained.shape[1:] or fresh.shape[0] < trained.shape[0]:
            raise ValueError(
                f"warm start: table shape {trained.shape} does not embed in "
                f"{fresh.shape}"
            )
        out = np.asarray(fresh).copy()
        out[: trained.shape[0]] = trained
        return out

    params = dict(params)
    params["user_embedding"] = copy_rows(params["user_embedding"], old["params"]["user_embedding"])
    params["item_embedding"] = copy_rows(params["item_embedding"], old["params"]["item_embedding"])
    for k in old["params"]:
        if k not in ("user_embedding", "item_embedding"):
            params[k] = old["params"][k]  # tower/cat tables: shapes equal by construction
    bn_state = old["bn_state"]

    users, items, X_cat, X_num, y = _encode(preproc, df)
    from hhrs_tpu.data.preprocess import Preprocessor

    tr_idx, va_idx = Preprocessor(
        test_size=test_size, split_seed=split_seed
    )._split(len(df), y)
    splits = DatasetSplits(
        train_user=users[tr_idx], train_item=items[tr_idx], train_cat=X_cat[tr_idx],
        train_num=X_num[tr_idx], train_y=y[tr_idx],
        val_user=users[va_idx], val_item=items[va_idx], val_cat=X_cat[va_idx],
        val_num=X_num[va_idx], val_y=y[va_idx],
    )
    log.info(
        "warm start: %d users (+%d new), %d items (+%d new), %d train / %d val",
        dims.n_users, n_new_users, dims.n_items, n_new_items,
        splits.n_train, splits.n_val,
    )
    return WarmStart(
        splits=splits, preproc=preproc, dims=dims,
        params=params, bn_state=bn_state,
        n_new_users=n_new_users, n_new_items=n_new_items,
    )
