"""Regressions for the round-2 code-review findings (see git log for the
review pass): optuna-shim intermediate fidelity, stale-native-lib fallback,
recall@k denominator convention, retired serve.use_pallas override compat,
and the shared --mesh spec parser."""

import numpy as np
import pytest

from hhrs_tpu.hpo.study import Trial, _OptunaShimStudy
from hhrs_tpu.hpo.space import float_range


class _FakeOptunaTrial:
    """Records report() calls; prunes when asked more than N times."""

    def __init__(self):
        self.number = 0
        self.reported = []
        self.prune_calls = 0
        self.user_attrs = {}

    def report(self, value, step):
        self.reported.append((step, float(value)))

    def set_user_attr(self, key, value):  # forwarded by the shim
        self.user_attrs[key] = value

    def should_prune(self):
        self.prune_calls += 1
        return False


def test_optuna_shim_forwards_true_intermediates():
    """The real-optuna backend must receive the TRUE per-step values, not
    the running min (which corrupted optuna's stored curves and
    double-applied best-over-steps)."""
    ot = _FakeOptunaTrial()
    trial = Trial(0, {"x": float_range(0.0, 1.0)}, {"x": 0.5}, _OptunaShimStudy(ot))
    for step, v in enumerate([0.5, 0.6, 0.7]):
        trial.report(v, step)
        trial.should_prune()
    assert ot.reported == [(0, 0.5), (1, 0.6), (2, 0.7)]
    # should_prune consults optuna but never re-reports
    assert ot.prune_calls == 3
    assert len(ot.reported) == 3


def test_builtin_pruner_still_uses_best_intermediate():
    """The built-in path keeps optuna PercentilePruner semantics: the
    trial's best-so-far faces the median (test_hpo pins the e2e flow;
    this pins it survives the shim refactor)."""
    from hhrs_tpu.hpo.pruner import MedianPruner
    from hhrs_tpu.hpo.study import Study, TrialPruned

    s = Study(None, seed=0, pruner=MedianPruner(n_startup_trials=1, n_warmup_steps=0))
    space = {"x": float_range(0.0, 1.0)}

    def good(trial):
        for e in range(2):
            trial.report(0.1, e)
        return 0.1

    s.optimize(good, space, n_trials=1)

    outcome = {}

    def regresses(trial):
        trial.report(0.05, 0)
        trial.report(9.0, 1)  # regression AFTER a best-beating epoch
        outcome["pruned"] = trial.should_prune()
        return 0.05

    s.optimize(regresses, space, n_trials=2)
    assert outcome["pruned"] is False


def test_stale_native_lib_falls_back_to_pandas(monkeypatch, tmp_path):
    """A loaded .so missing round-2 symbols must degrade to pandas, not
    crash every ingest with AttributeError."""
    import ctypes

    import hhrs_tpu.runtime as rt

    class _MissingSymbols:
        def __getattr__(self, name):
            raise AttributeError(name)

    monkeypatch.setattr(rt, "_lib", None)
    monkeypatch.setattr(rt, "_tried", False)
    monkeypatch.setattr(rt.os.path, "exists", lambda p: True)
    monkeypatch.setattr(rt, "_stale", lambda: False)
    monkeypatch.setattr(ctypes, "CDLL", lambda p: _MissingSymbols())
    assert rt.get_lib() is None
    assert rt.native_available() is False
    # ingest still works end-to-end via pandas
    csv = tmp_path / "t.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    import pandas as pd

    from hhrs_tpu.data.ingest import _read_csv

    df = _read_csv(str(csv))
    pd.testing.assert_frame_equal(
        df.reset_index(drop=True), pd.read_csv(str(csv)).reset_index(drop=True),
        check_dtype=False,
    )


def test_catalog_recall_excludes_train_seen_from_denominator():
    """A val positive the user also rated in train is masked from the
    ranking; it must leave the denominator too (perfect model → 1.0)."""
    import jax

    from hhrs_tpu.config import ModelConfig
    from hhrs_tpu.data.preprocess import DatasetSplits
    from hhrs_tpu.models.dcn import ModelDims, init_dcn
    from hhrs_tpu.train import eval_retrieval as er

    n_items = 30
    # user 0: train rows on items 0..9; val positives {0 (train-seen), 10}
    train_user = np.zeros(10, np.int32)
    train_item = np.arange(10, dtype=np.int32)
    val_user = np.zeros(2, np.int32)
    val_item = np.array([0, 10], np.int32)
    # pad extra rows so every catalog item has features
    extra = np.arange(n_items, dtype=np.int32)
    train_user = np.r_[train_user, np.ones(n_items, np.int32)]
    train_item = np.r_[train_item, extra]

    def feats(n):
        return np.zeros((n, 1), np.int32), np.zeros((n, 2), np.float32)

    tc, tn = feats(len(train_user))
    vc, vn = feats(2)
    splits = DatasetSplits(
        train_user, train_item, tc, tn, np.ones(len(train_user), np.float32),
        val_user, val_item, vc, vn, np.ones(2, np.float32),
    )
    dims = ModelDims(2, n_items, (("c", 2),), 2)
    cfg = ModelConfig(emb_dim=2, hidden_dim=4, n_cross_layers=1, n_res_blocks=1,
                      dropout=0.0)
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, cfg)

    # k covers EVERY unmasked catalog item (30 items, 10 train-seen masked),
    # so recall must be exactly 1.0 when the denominator drops the
    # train-seen positive (the old code returned 0.5 here regardless of
    # the model, since masked item 0 stayed in the denominator).
    k = n_items - 10
    got = er.catalog_recall_at_k(params, bn, cfg, splits, k=k, max_users=4,
                                 exclude_train=True)
    assert got == pytest.approx(1.0)


def test_serve_use_pallas_override_still_parses():
    """serve.use_pallas was retired to a no-op; existing override lists
    must keep parsing instead of AttributeError-ing at CLI startup."""
    from hhrs_tpu.config import Config

    cfg = Config().apply_overrides(["serve.use_pallas=true"])
    assert cfg.serve.use_pallas is True


def test_mesh_from_spec():
    import jax

    from hhrs_tpu.parallel.mesh import mesh_from_spec

    n = len(jax.devices())
    m = mesh_from_spec(f"{n // 2}x2")
    assert m.shape == {"data": n // 2, "model": 2}
    m = mesh_from_spec(str(n))
    assert m.shape == {"data": n, "model": 1}
    with pytest.raises(ValueError, match="DATAxMODEL"):
        mesh_from_spec("4x2x1")
    with pytest.raises(ValueError):
        mesh_from_spec(f"{n * 8}x8")
