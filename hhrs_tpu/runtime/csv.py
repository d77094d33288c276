"""DataFrame construction over the native CSV reader.

``read_csv_native`` is a drop-in for ``pandas.read_csv`` on this project's
schema: numeric columns arrive as float64 (downcast to int64 when the
column is integral and complete, matching pandas inference), categorical
columns as strings with empty cells → NaN.

The native reader infers column kinds from a 1000-row prefix, so a file
outside this project's schema can diverge from pandas (string tokens in a
numeric-classified column → NaN; short rows → dropped). Both events are
counted by the C++ side; ``strict=True`` turns them into
``NativeParseMismatch`` so auto-mode ingest falls back to pandas, and
non-strict callers get a warning with the counts.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from hhrs_tpu.runtime import get_lib

log = logging.getLogger(__name__)


class NativeParseMismatch(RuntimeError):
    """The native parse would diverge from pandas (coerced tokens or
    dropped rows); callers should re-read with pandas."""


def read_csv_native(path: str, n_threads: int = 0, strict: bool = False) -> pd.DataFrame:
    """Parse with the C++ reader; raises RuntimeError if it is unavailable
    (callers gate on runtime.native_available())."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native runtime not available")

    handle = lib.csv_load(path.encode(), n_threads)
    try:
        err = lib.csv_error(handle)
        if err:
            raise RuntimeError(f"csv_load: {err.decode()}")
        n = lib.csv_n_rows(handle)
        bad_rows = lib.csv_n_bad_rows(handle)
        coerced = {
            lib.csv_col_name(handle, i).decode(): int(lib.csv_col_n_coerced(handle, i))
            for i in range(lib.csv_n_cols(handle))
            if lib.csv_col_n_coerced(handle, i)
        }
        if bad_rows or coerced:
            msg = (
                f"native CSV parse of {path} diverges from pandas: "
                f"{bad_rows} row(s) dropped (field-count mismatch), "
                f"non-numeric tokens coerced to NaN per column: {coerced or '{}'}"
            )
            if strict:
                raise NativeParseMismatch(msg)
            log.warning("%s", msg)
        cols = {}
        for i in range(lib.csv_n_cols(handle)):
            name = lib.csv_col_name(handle, i).decode()
            if lib.csv_col_kind(handle, i) == 0:
                buf = np.ctypeslib.as_array(lib.csv_col_f64(handle, i), shape=(n,))
                arr = np.array(buf, dtype=np.float64)  # copy out before free
                if arr.size and lib.csv_col_int_like(handle, i):
                    # pandas int64 inference: every token was plain integer text
                    arr = arr.astype(np.int64)
                cols[name] = arr
            else:
                codes = np.array(
                    np.ctypeslib.as_array(lib.csv_col_codes(handle, i), shape=(n,)),
                    dtype=np.int32,
                )
                nv = lib.csv_col_vocab_size(handle, i)
                vocab = (
                    lib.csv_col_vocab(handle, i).decode().split("\n") if nv else []
                )
                lookup = np.asarray(vocab + [np.nan], dtype=object)  # -1 → NaN slot
                cols[name] = lookup[codes]
        # copy=False: every array above is freshly owned, and the dict path
        # skips pandas' per-column consolidation copy (~800ms at 500k rows).
        return pd.DataFrame(cols, copy=False)
    finally:
        lib.csv_free(handle)
