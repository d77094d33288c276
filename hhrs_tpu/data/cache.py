"""Preprocessed-dataset cache.

The reference re-runs CSV parse + preprocessing on every invocation
(reference train.py:273-300). For iterative training/HPO the encoded
arrays are deterministic given (CSV contents, preprocessing config), so
they cache as one .npz + the PreprocessArtifacts JSON. A cache hit skips
ingest, feature engineering, encoder fitting, and the split — worth
seconds per run at 500k rows, and more at scale.

Key = SHA1 of (csv path, size, mtime_ns, config knobs). Stale entries are
simply never hit again; the directory can be deleted freely.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os

import numpy as np

from hhrs_tpu.data.preprocess import DatasetSplits, PreprocessArtifacts

log = logging.getLogger(__name__)

_SPLIT_FIELDS = (
    "train_user", "train_item", "train_cat", "train_num", "train_y",
    "val_user", "val_item", "val_cat", "val_num", "val_y",
)


def _code_version() -> str:
    """Hash of the preprocessing-code sources: a change to the featurizer
    or encoders must invalidate cached arrays automatically — the CSV and
    config knobs alone can't see it."""
    import hhrs_tpu.data.features as _f
    import hhrs_tpu.data.ingest as _i
    import hhrs_tpu.data.preprocess as _p

    h = hashlib.sha1()
    for mod in (_f, _i, _p):
        with open(mod.__file__, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:12]


def cache_key(csv_path: str, cfg_knobs: dict) -> str:
    st = os.stat(csv_path)
    blob = json.dumps(
        {"path": os.path.abspath(csv_path), "size": st.st_size,
         "mtime_ns": st.st_mtime_ns, "code": _code_version(), **cfg_knobs},
        sort_keys=True,
    )
    return hashlib.sha1(blob.encode()).hexdigest()[:16]


def save(cache_dir: str, key: str, splits: DatasetSplits,
         artifacts: PreprocessArtifacts) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(
        os.path.join(cache_dir, f"{key}.npz"),
        **{f: getattr(splits, f) for f in _SPLIT_FIELDS},
    )
    artifacts.save(os.path.join(cache_dir, f"{key}.preproc.json"))
    log.info("dataset cache write: %s/%s", cache_dir, key)


def load(cache_dir: str, key: str):
    """(splits, artifacts) on hit, None on miss/corruption."""
    npz_path = os.path.join(cache_dir, f"{key}.npz")
    pre_path = os.path.join(cache_dir, f"{key}.preproc.json")
    if not (os.path.exists(npz_path) and os.path.exists(pre_path)):
        return None
    try:
        with np.load(npz_path) as z:
            splits = DatasetSplits(**{f: z[f] for f in _SPLIT_FIELDS})
        artifacts = PreprocessArtifacts.load(pre_path)
    except Exception as e:  # noqa: BLE001 — a torn cache must not kill the run
        log.warning("dataset cache read failed (%s); re-preprocessing", e)
        return None
    log.info("dataset cache hit: %s/%s", cache_dir, key)
    return splits, artifacts
