"""Native runtime: C++ components behind ctypes (no pybind11 in this image).

Currently the multithreaded mmap CSV reader (csv_reader.cpp). The library
auto-builds on first use via the Makefile when a toolchain is present and
is otherwise reported unavailable — every caller has a pure-Python
fallback, so the native path is a strict accelerator, never a dependency.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

log = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libhhrs_runtime.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # noqa: BLE001 — missing toolchain is expected
        log.info("native runtime build unavailable: %s", e)
        return False


def _stale() -> bool:
    src = os.path.join(_DIR, "csv_reader.cpp")
    if not os.path.exists(src):
        # Source-free install (wheel / artifact-only deploy): a present .so
        # cannot be mtime-checked, so trust it — _wire_symbols() below still
        # rejects genuinely stale builds via the missing-symbol guard.
        return False
    try:
        return os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    except OSError:
        return True


def get_lib():
    """The loaded runtime library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # Rebuild when the source is newer than the library (make is a
        # no-op otherwise); a stale .so missing newer symbols must not load.
        if (not os.path.exists(_LIB_PATH) or _stale()) and not _build():
            # Rebuild impossible (no toolchain — e.g. a wheel install that
            # ships both the .so and the .cpp but lands on a target without
            # make/g++; pip's extraction doesn't preserve mtimes, so the
            # staleness heuristic can misfire there). A present .so is
            # still worth trying: _wire_symbols() below rejects genuinely
            # stale builds via the missing-symbol guard.
            if not os.path.exists(_LIB_PATH):
                return None
            log.info(
                "native runtime rebuild unavailable; trying the existing %s",
                _LIB_PATH,
            )
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            log.warning("failed to load native runtime: %s", e)
            return None

        # Symbol wiring can raise AttributeError if a stale .so slipped past
        # the mtime heuristic (e.g. tarball/rsync-preserved mtimes); the
        # module contract is "never a dependency", so degrade to pandas.
        try:
            _wire_symbols(lib)
        except AttributeError as e:
            log.warning(
                "native runtime %s is missing symbols (stale build?): %s — "
                "falling back to pandas", _LIB_PATH, e,
            )
            return None
        _lib = lib
        return _lib


def _wire_symbols(lib) -> None:
    lib.csv_load.restype = ctypes.c_void_p
    lib.csv_load.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.csv_free.argtypes = [ctypes.c_void_p]
    lib.csv_error.restype = ctypes.c_char_p
    lib.csv_error.argtypes = [ctypes.c_void_p]
    lib.csv_n_rows.restype = ctypes.c_int64
    lib.csv_n_rows.argtypes = [ctypes.c_void_p]
    lib.csv_n_bad_rows.restype = ctypes.c_int64
    lib.csv_n_bad_rows.argtypes = [ctypes.c_void_p]
    lib.csv_n_nul_cells.restype = ctypes.c_int64
    lib.csv_n_nul_cells.argtypes = [ctypes.c_void_p]
    lib.csv_col_n_coerced.restype = ctypes.c_int64
    lib.csv_col_n_coerced.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.csv_n_cols.restype = ctypes.c_int
    lib.csv_n_cols.argtypes = [ctypes.c_void_p]
    lib.csv_col_name.restype = ctypes.c_char_p
    lib.csv_col_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.csv_col_kind.restype = ctypes.c_int
    lib.csv_col_kind.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.csv_col_int_like.restype = ctypes.c_int
    lib.csv_col_int_like.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.csv_col_f64.restype = ctypes.POINTER(ctypes.c_double)
    lib.csv_col_f64.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.csv_col_codes.restype = ctypes.POINTER(ctypes.c_int32)
    lib.csv_col_codes.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.csv_col_vocab.restype = ctypes.c_char_p
    lib.csv_col_vocab.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.csv_col_vocab_size.restype = ctypes.c_int
    lib.csv_col_vocab_size.argtypes = [ctypes.c_void_p, ctypes.c_int]


def native_available() -> bool:
    return get_lib() is not None
