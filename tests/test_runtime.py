"""Native C++ CSV reader tests: pandas parity on the project schema,
edge cases (missing values, quoted fields, CRLF), and thread invariance."""

import numpy as np
import pandas as pd
import pytest

from hhrs_tpu.data.synthetic import write_synthetic_dataset
from hhrs_tpu.runtime import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime not built (no toolchain)"
)


def _assert_frames_match(ref: pd.DataFrame, nat: pd.DataFrame):
    assert list(ref.columns) == list(nat.columns)
    assert len(ref) == len(nat)
    for c in ref.columns:
        r, m = ref[c], nat[c]
        if str(r.dtype) == "object" or str(r.dtype).startswith("str"):
            assert (
                r.fillna("~").astype(str).to_numpy() == m.fillna("~").astype(str).to_numpy()
            ).all(), c
        else:
            assert r.dtype == m.dtype, (c, r.dtype, m.dtype)
            np.testing.assert_allclose(
                r.to_numpy(np.float64), m.to_numpy(np.float64), rtol=1e-12, equal_nan=True
            )


def test_parity_on_synthetic_schema(tmp_path):
    from hhrs_tpu.runtime.csv import read_csv_native

    write_synthetic_dataset(str(tmp_path), n_users=300, n_items=100, n_reviews=5000, seed=9)
    for f in ("hackathon_augmented_data.csv", "friendships.csv"):
        path = str(tmp_path / f)
        _assert_frames_match(pd.read_csv(path), read_csv_native(path))


def test_edge_cases(tmp_path):
    from hhrs_tpu.runtime.csv import read_csv_native

    p = tmp_path / "edge.csv"
    p.write_text(
        "id,price,city,note\r\n"
        "1,10.5,\"Sochi\",hello\r\n"
        "2,,Moscow,\r\n"
        "3,-7.25,Sochi,world\r\n"
    )
    ref = pd.read_csv(str(p))
    nat = read_csv_native(str(p))
    _assert_frames_match(ref, nat)
    assert nat["id"].dtype == np.int64
    assert nat["price"].dtype == np.float64  # has a missing cell → float
    assert pd.isna(nat["price"].iloc[1])
    assert pd.isna(nat["note"].iloc[1])


def test_thread_invariance(tmp_path):
    from hhrs_tpu.runtime.csv import read_csv_native

    write_synthetic_dataset(str(tmp_path), n_users=200, n_items=80, n_reviews=3000, seed=4)
    path = str(tmp_path / "hackathon_augmented_data.csv")
    a = read_csv_native(path, n_threads=1)
    b = read_csv_native(path, n_threads=7)
    _assert_frames_match(a, b)


def test_ingest_uses_native_with_parity(tmp_path):
    from hhrs_tpu.data.ingest import load_reviews_csv

    write_synthetic_dataset(str(tmp_path), n_users=100, n_items=50, n_reviews=1000, seed=2)
    path = str(tmp_path / "hackathon_augmented_data.csv")
    nat = load_reviews_csv(path, engine="native")
    ref = load_reviews_csv(path, engine="pandas")
    _assert_frames_match(ref, nat)


def test_native_strict_divergence_net(tmp_path):
    """Cases where the native parse would silently diverge from pandas must
    raise NativeParseMismatch in strict mode (auto-ingest then falls back):
    NA/bool tokens typed categorical, >2^53 ints, duplicate headers, BOM,
    empty frames, non-UTF-8 bytes."""
    import pytest
    from hhrs_tpu import runtime
    from hhrs_tpu.data.ingest import _read_csv

    if not runtime.native_available():
        pytest.skip("native runtime not built")
    from hhrs_tpu.runtime.csv import NativeParseMismatch, read_csv_native

    def case(name, content, mode="w"):
        p = tmp_path / name
        with open(p, mode) as f:
            f.write(content)
        return str(p)

    cases = {
        "na_tokens": case("na.csv", "a,b\n" + "\n".join(f"{i},NA" for i in range(1200))),
        "bools": case("bool.csv", "a,b\n" + "\n".join(f"{i},True" for i in range(1200))),
        "big_ints": case("big.csv", "a,b\n9007199254740993,1\n9007199254740995,2\n"),
        "dup_header": case("dup.csv", "a,a\n1,2\n"),
        "bom": case("bom.csv", "﻿a,b\n1,2\n"),
        "empty": case("empty.csv", "a,b\n"),
        "binary": case("bin.csv", b"\x1f\x8b\x08\x00junk\xff\xfe\n", "wb"),
    }
    for label, path in cases.items():
        with pytest.raises((NativeParseMismatch, RuntimeError)):
            read_csv_native(path, strict=True)
        # auto-mode ingest must survive via the pandas fallback wherever
        # pandas itself can read the file
        if label in ("na_tokens", "bools", "big_ints", "dup_header", "bom", "empty"):
            df = _read_csv(path, engine="auto")
            import pandas as pd

            expected = pd.read_csv(path)
            assert list(df.columns) == list(expected.columns), label
            assert len(df) == len(expected), label


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_native_pandas_parity_edge_tokens(tmp_path):
    """r4 review repros, each previously a silent strict-mode divergence:
    NA sentinels in mixed string columns, hex tokens, doubled-quote
    escapes, bare-\\r row terminators."""
    import numpy as np

    from hhrs_tpu.runtime.csv import read_csv_native

    def both(name, text):
        p = tmp_path / name
        p.write_bytes(text if isinstance(text, bytes) else text.encode())
        return pd.read_csv(p), read_csv_native(str(p), strict=True)

    # NA sentinels among real strings -> NaN exactly like pandas
    # (case-sensitive: 'Null' stays a literal string)
    ref, nat = both("na_mixed.csv",
                    "a,b\n1,Paris\n2,NA\n3,London\n4,null\n5,Null\n")
    assert list(ref["b"].isna()) == [False, True, False, True, False]
    assert list(nat["b"].isna()) == list(ref["b"].isna())
    assert list(nat["b"].dropna()) == list(ref["b"].dropna())

    # hex tokens are NOT numbers (strtod would have parsed them)
    ref, nat = both("hex.csv", "a,b\n1,0x1A\n2,0xFF\n")
    assert list(nat["b"]) == ["0x1A", "0xFF"] == list(ref["b"])

    # RFC-4180 doubled quotes un-escape
    ref, nat = both("quotes.csv", 'a,b\n1,"he said ""hi"""\n2,plain\n')
    assert list(nat["b"]) == ['he said "hi"', "plain"] == list(ref["b"])

    # bare \r is a row terminator for pandas
    ref, nat = both("bare_cr.csv", b"a,b\n1,x\r2,y\n3,z\n")
    assert len(nat) == len(ref)
    assert list(nat["a"])[:1] == list(ref["a"])[:1]


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_native_nul_cell_raises_mismatch(tmp_path):
    """NUL bytes cannot cross the c_char_p vocab join: must be a
    NativeParseMismatch (pandas fallback), never an IndexError."""
    from hhrs_tpu.runtime.csv import NativeParseMismatch, read_csv_native

    p = tmp_path / "nul.csv"
    p.write_bytes(b"a,b\n1,foo\x00bar\n2,x\n3,y\n")
    with pytest.raises(NativeParseMismatch):
        read_csv_native(str(p), strict=True)
    with pytest.raises(NativeParseMismatch):
        read_csv_native(str(p), strict=False)  # undeliverable either way


@pytest.mark.skipif(not native_available(), reason="native runtime not built")
def test_native_nonstrict_big_ints_keep_float64(tmp_path):
    """Non-strict >2^53 ints must stay float64 with a warning — the old
    astype(int64) overflowed >2^63 values to INT64_MIN (id corruption)."""
    import numpy as np

    from hhrs_tpu.runtime.csv import read_csv_native

    p = tmp_path / "big.csv"
    p.write_text("a,b\n99999999999999999999,1\n12345678901234567890,2\n")
    nat = read_csv_native(str(p), strict=False)
    assert nat["a"].dtype == np.float64
    assert (nat["a"] > 0).all()  # approximate, never INT64_MIN garbage
