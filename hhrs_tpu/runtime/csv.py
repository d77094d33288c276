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

The wrapper extends that divergence net to the CATEGORICAL direction and
edge shapes the C++ counters cannot see — in strict mode any of these
raises ``NativeParseMismatch`` (→ pandas fallback): empty frames,
duplicate or BOM-carrying headers, non-UTF-8 bytes (e.g. a .gz file
pandas would transparently decompress), single-column files (blank-line
handling is chunk-layout-dependent there), a non-'.' LC_NUMERIC locale,
int64 columns beyond 2^53 (the double round-trip loses exactness), and
string columns whose sampled tokens all look numeric/boolean/NA (pandas
would have typed them).
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


# Tokens pandas treats as NA or bool; a "categorical" column sampled as
# only these + numerics means pandas would NOT have typed it string.
_PANDAS_TYPED_TOKENS = {
    "", "nan", "na", "n/a", "null", "none", "true", "false",
    "#n/a", "#n/a n/a", "#na", "-nan", "<na>",
}

# pandas' default na_values, matched EXACTLY (case-sensitive: 'NA' is
# missing, 'Na' is a string). Cells with these tokens in object columns
# become NaN — keeping them as literal category strings silently diverged
# from the pandas fallback (r4 review finding).
_PANDAS_NA_TOKENS = {
    "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "None",
    "n/a", "nan", "null",
}


def _looks_pandas_typed(values: np.ndarray) -> bool:
    """True if every sampled non-NaN string is numeric/bool/NA-ish —
    i.e. pandas inference would have produced a non-object column."""
    sample = [v for v in values[:1000] if isinstance(v, str)]
    if not sample:
        return False
    for v in sample:
        t = v.strip().lower()
        if t in _PANDAS_TYPED_TOKENS:
            continue
        try:
            float(t)
        except ValueError:
            return False
    return True


def read_csv_native(path: str, n_threads: int = 0, strict: bool = False) -> pd.DataFrame:
    """Parse with the C++ reader; raises RuntimeError if it is unavailable
    (callers gate on runtime.native_available())."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native runtime not available")

    import locale

    if (locale.localeconv().get("decimal_point") or ".") != ".":
        # strtod is locale-sensitive; pandas' parser is not
        raise NativeParseMismatch("non-'.' LC_NUMERIC locale")

    handle = lib.csv_load(path.encode(), n_threads)
    try:
        err = lib.csv_error(handle)
        if err:
            raise RuntimeError(f"csv_load: {err.decode()}")
        n = lib.csv_n_rows(handle)
        n_cols = lib.csv_n_cols(handle)
        if n == 0 or n_cols <= 1:
            # empty frames need no speedup; single-column files have
            # chunk-layout-dependent blank-line semantics in the reader
            raise NativeParseMismatch("empty or single-column CSV")
        try:
            names = [lib.csv_col_name(handle, i).decode() for i in range(n_cols)]
        except UnicodeDecodeError as e:  # e.g. a .gz pandas would decompress
            raise NativeParseMismatch(f"non-UTF-8 header bytes: {e}") from e
        if len(set(names)) != len(names):
            raise NativeParseMismatch("duplicate header names (pandas mangles)")
        if names and names[0].startswith("\ufeff"):
            raise NativeParseMismatch("UTF-8 BOM in header (pandas strips)")
        bad_rows = lib.csv_n_bad_rows(handle)
        nul_cells = int(lib.csv_n_nul_cells(handle))
        if nul_cells:
            # NUL bytes cannot travel through the c_char_p vocab join at
            # all (truncation) — always a mismatch, pandas handles them
            raise NativeParseMismatch(
                f"{nul_cells} cell(s) contain NUL bytes (undeliverable "
                "over the native ABI)"
            )
        coerced = {
            names[i]: c
            for i in range(n_cols)
            if (c := int(lib.csv_col_n_coerced(handle, i)))
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
        for i in range(n_cols):
            name = names[i]
            if lib.csv_col_kind(handle, i) == 0:
                buf = np.ctypeslib.as_array(lib.csv_col_f64(handle, i), shape=(n,))
                arr = np.array(buf, dtype=np.float64)  # copy out before free
                if arr.size and lib.csv_col_int_like(handle, i):
                    # pandas int64 inference: every token was plain integer text
                    if np.any(np.abs(arr) >= 2.0**53):
                        msg = (
                            f"column {name!r} has integers beyond 2^53 — the "
                            "double round-trip loses exactness vs pandas int64"
                        )
                        if strict:
                            raise NativeParseMismatch(msg)
                        # non-strict: WARN and keep float64 — astype(int64)
                        # would overflow values past 2^63 to INT64_MIN
                        # (silent id corruption, r4 review finding)
                        log.warning("%s; keeping float64", msg)
                    else:
                        arr = arr.astype(np.int64)
                cols[name] = arr
            else:
                codes = np.array(
                    np.ctypeslib.as_array(lib.csv_col_codes(handle, i), shape=(n,)),
                    dtype=np.int32,
                )
                nv = lib.csv_col_vocab_size(handle, i)
                try:
                    vocab = (
                        lib.csv_col_vocab(handle, i).decode().split("\n") if nv else []
                    )
                except UnicodeDecodeError as e:
                    raise NativeParseMismatch(f"non-UTF-8 cell bytes: {e}") from e
                if len(vocab) != nv:
                    # belt-and-braces behind the NUL-cell counter above
                    raise NativeParseMismatch(
                        f"column {name!r} vocab truncated in transit "
                        f"({len(vocab)} != {nv})"
                    )
                lookup = np.asarray(vocab + [np.nan], dtype=object)  # -1 → NaN slot
                col = lookup[codes]
                # the typed-column net needs the RAW tokens (an all-'NA'
                # column must raise here — pandas types it float64)
                if strict and _looks_pandas_typed(col):
                    raise NativeParseMismatch(
                        f"column {name!r} classified categorical but every "
                        "sampled token is numeric/bool/NA — pandas would "
                        "have typed it"
                    )
                # pandas' default NA sentinels become NaN in mixed string
                # columns, exactly as the pandas fallback would produce
                # (vocab-level membership: one check per distinct string)
                na_mask = np.asarray(
                    [v in _PANDAS_NA_TOKENS for v in vocab] + [False]
                )
                if na_mask.any():
                    col = np.where(na_mask[codes], np.nan, col)
                cols[name] = col
        # copy=False: every array above is freshly owned, and the dict path
        # skips pandas' per-column consolidation copy (~800ms at 500k rows).
        return pd.DataFrame(cols, copy=False)
    finally:
        lib.csv_free(handle)
