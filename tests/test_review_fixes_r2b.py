"""Regressions for the second round-2 review pass: source-free native-lib
loading, the retired serve.use_pallas warning reaching the engine from the
CLI, and the shared pad/shard helpers staying consistent with the inlined
arithmetic they replaced."""

import numpy as np
import pytest


def test_prebuilt_native_lib_loads_without_source(monkeypatch):
    """A wheel / artifact-only deploy ships libhhrs_runtime.so but not
    csv_reader.cpp; the prebuilt lib must load instead of being treated as
    stale (which forced a doomed rebuild and silently dropped to pandas)."""
    import hhrs_tpu.runtime as rt

    class _FakeSym:
        restype = None
        argtypes = None

    class _FakeLib:
        def __init__(self):
            self._syms = {}

        def __getattr__(self, name):
            return self._syms.setdefault(name, _FakeSym())

    monkeypatch.setattr(rt, "_lib", None)
    monkeypatch.setattr(rt, "_tried", False)
    monkeypatch.setattr(
        rt.os.path, "exists", lambda p: not p.endswith("csv_reader.cpp")
    )

    def _no_build():
        raise AssertionError("source-free install must not attempt a rebuild")

    monkeypatch.setattr(rt, "_build", _no_build)
    monkeypatch.setattr(rt.ctypes, "CDLL", lambda p: _FakeLib())
    assert rt._stale() is False
    assert rt.get_lib() is not None


def test_stale_lib_with_failed_rebuild_still_loads(monkeypatch):
    """Toolchain-less target where the .so looks stale (pip extraction does
    not preserve mtimes): when the rebuild fails, a PRESENT .so must still
    be tried — the symbol guard rejects genuinely incompatible builds."""
    import hhrs_tpu.runtime as rt

    class _FakeSym:
        restype = None
        argtypes = None

    class _FakeLib:
        def __init__(self):
            self._syms = {}

        def __getattr__(self, name):
            return self._syms.setdefault(name, _FakeSym())

    monkeypatch.setattr(rt, "_lib", None)
    monkeypatch.setattr(rt, "_tried", False)
    monkeypatch.setattr(rt.os.path, "exists", lambda p: True)
    monkeypatch.setattr(rt, "_stale", lambda: True)
    monkeypatch.setattr(rt, "_build", lambda: False)  # no toolchain
    monkeypatch.setattr(rt.ctypes, "CDLL", lambda p: _FakeLib())
    assert rt.get_lib() is not None


def test_serve_cli_forwards_use_pallas_to_engine(tmp_path):
    """`serve.use_pallas=true` must reach RecommendationEngine so its
    retirement warning fires (config.py documents the override as a warned
    no-op; previously the CLI dropped it silently)."""
    import inspect

    from hhrs_tpu.serve import cli as serve_cli
    from hhrs_tpu.serve.engine import RecommendationEngine

    # from_dirs accepts the kwarg and the CLI passes it through.
    assert "use_pallas" in inspect.signature(
        RecommendationEngine.from_dirs
    ).parameters
    src = inspect.getsource(serve_cli.main)
    assert "use_pallas=cfg.use_pallas" in src


def test_pad_to_shards_and_row_shardings():
    import jax
    from jax.sharding import PartitionSpec as P

    from hhrs_tpu.parallel.mesh import make_mesh, pad_to_shards, row_shardings

    assert pad_to_shards(10, None) == 10
    mesh = make_mesh(-1, 2)
    m = int(mesh.devices.size)
    assert pad_to_shards(1, mesh) == m
    assert pad_to_shards(m, mesh) == m
    assert pad_to_shards(m + 1, mesh) == 2 * m

    rows, rows2d, cols2d, rep = row_shardings(mesh)
    axes = tuple(mesh.axis_names)
    assert rows.spec == P(axes)
    assert rows2d.spec == P(axes, None)
    assert cols2d.spec == P(None, axes)
    assert rep.spec == P()
    # a padded 1-D array actually shards evenly over every device
    x = jax.device_put(np.zeros(pad_to_shards(m + 1, mesh)), rows)
    assert len(x.sharding.device_set) == m


def test_catalog_recall_params_are_arguments_not_closures():
    """eval_retrieval's scoring program must take params/tables as jit
    ARGUMENTS: a closed-over table lowers as an HLO constant, which the
    tunneled TPU's remote-compile endpoint rejects at scale (HTTP 413,
    RESULTS.md) and which would gather sharded params on a mesh run."""
    import inspect

    from hhrs_tpu.train import eval_retrieval

    src = inspect.getsource(eval_retrieval.catalog_recall_at_k)
    call = [ln for ln in src.splitlines() if "score_users(" in ln and "def" not in ln]
    assert call and "params" in call[0]
