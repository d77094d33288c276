"""HPO engine tests: space transforms, TPE convergence, pruning, and
journal resumability (reference study semantics — train.py:303-325)."""

import math
import os

import numpy as np
import pytest

from hhrs_tpu.hpo.pruner import MedianPruner
from hhrs_tpu.hpo.sampler import RandomSampler, TPESampler
from hhrs_tpu.hpo.space import categorical, float_range, int_range, reference_search_space
from hhrs_tpu.hpo.study import Study, TrialPruned


def test_dim_roundtrip():
    d = categorical(16, 24, 32, 48, 64)
    for v in d.choices:
        assert d.from_unit(d.to_unit(v)) == v
    d = int_range(32, 512, step=32)
    for v in (32, 256, 512):
        assert d.from_unit(d.to_unit(v)) == v
    d = float_range(1e-5, 1e-2, log=True)
    assert math.isclose(d.from_unit(d.to_unit(1e-3)), 1e-3, rel_tol=1e-9)
    assert d.from_unit(0.0) == pytest.approx(1e-5)
    assert d.from_unit(1.0) == pytest.approx(1e-2)


def test_random_sampler_in_bounds():
    space = reference_search_space()
    s = RandomSampler(seed=1)
    for _ in range(50):
        p = s.sample(space, [])
        assert p["emb_dim"] in (16, 24, 32, 48, 64)
        assert 32 <= p["hidden_dim"] <= 512 and p["hidden_dim"] % 32 == 0
        assert 1e-5 <= p["lr"] <= 1e-2
        assert p["optimizer"] in ("adam", "adamw")


def test_tpe_beats_random_on_toy_objective():
    space = {"x": float_range(0.0, 1.0), "y": float_range(0.0, 1.0)}

    def f(p):
        return (p["x"] - 0.7) ** 2 + (p["y"] - 0.2) ** 2

    def run(sampler, n=60):
        hist = []
        for _ in range(n):
            p = sampler.sample(space, hist)
            hist.append((p, f(p)))
        return min(v for _, v in hist)

    best_tpe = run(TPESampler(seed=3, n_startup_trials=10))
    assert best_tpe < 1e-2  # TPE should home in on the optimum


def test_median_pruner():
    pr = MedianPruner(n_startup_trials=2, n_warmup_steps=1)
    completed = [{0: 1.0, 1: 0.5, 2: 0.3}, {0: 1.1, 1: 0.6, 2: 0.35}]
    assert not pr.should_prune(0, 99.0, completed)  # warmup step
    assert pr.should_prune(1, 0.9, completed)  # worse than median 0.55
    assert not pr.should_prune(1, 0.4, completed)
    assert not pr.should_prune(1, 0.9, completed[:1])  # startup not reached


def test_study_resume(tmp_path):
    journal = str(tmp_path / "j.jsonl")
    space = {"x": float_range(0.0, 1.0)}

    def obj(trial):
        return (trial.suggest_float("x") - 0.5) ** 2

    s1 = Study(journal, seed=0)
    s1.optimize(obj, space, n_trials=5)
    assert len(s1.trials) == 5

    s2 = Study(journal, seed=0)
    assert len(s2.trials) == 5
    s2.optimize(obj, space, n_trials=8)
    assert len(s2.trials) == 8
    assert s2.best_value <= s1.best_value
    # journal holds all 8
    s3 = Study(journal, seed=0)
    assert len(s3.trials) == 8


def test_study_handles_pruned_and_failed(tmp_path):
    journal = str(tmp_path / "j.jsonl")
    space = {"x": float_range(0.0, 1.0)}
    calls = {"n": 0}

    def obj(trial):
        calls["n"] += 1
        if calls["n"] == 2:
            raise TrialPruned()
        if calls["n"] == 3:
            raise RuntimeError("boom")
        return trial.suggest_float("x")

    s = Study(journal, seed=0)
    s.optimize(obj, space, n_trials=5)
    states = [t["state"] for t in s.trials]
    assert states.count("pruned") == 1
    assert states.count("failed") == 1
    assert states.count("complete") == 3
    assert math.isfinite(s.best_value)


def test_trial_report_prune_flow():
    space = {"x": float_range(0.0, 1.0)}
    s = Study(None, seed=0, pruner=MedianPruner(n_startup_trials=1, n_warmup_steps=0))

    # Seed one completed trial with good intermediates.
    def good(trial):
        for e in range(3):
            trial.report(0.1, e)
        return 0.1

    s.optimize(good, space, n_trials=1)

    pruned = {"hit": False}

    def bad(trial):
        trial.report(5.0, 0)
        if trial.should_prune():
            pruned["hit"] = True
            raise TrialPruned()
        return 5.0

    s.optimize(bad, space, n_trials=2)
    assert pruned["hit"]
    assert s.trials[1]["state"] == "pruned"

    # optuna parity: the trial's BEST intermediate (not the latest) is what
    # faces the median — a good epoch followed by a regression survives.
    survived = {"hit": False}

    def regresses(trial):
        trial.report(0.05, 0)  # better than the seeded 0.1 median
        trial.report(9.0, 1)  # later regression
        survived["hit"] = not trial.should_prune()
        return 0.05

    s.optimize(regresses, space, n_trials=3)
    assert survived["hit"]


def test_param_importances_and_plots(tmp_path):
    import numpy as np

    from hhrs_tpu.hpo.plots import param_importances, save_study_plots

    rng = np.random.default_rng(0)
    trials = []
    for i in range(40):
        x = float(rng.uniform())
        cat = str(rng.choice(["a", "b"]))
        trials.append({
            "number": i, "state": "complete",
            "value": (x - 0.6) ** 2 + float(rng.normal()) * 0.05,
            "params": {"x": x, "cat": cat},
        })
    imp = param_importances(trials)
    assert imp["x"] > imp["cat"]  # the driving param dominates
    paths = save_study_plots(trials, str(tmp_path))
    # history + importances + parallel coordinates (reference train.py:337-350)
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)
    assert any("parallel_coordinates" in p for p in paths)
    assert param_importances(trials[:3]) == {}  # too few trials → empty


def test_hpo_cli_smoke(tmp_path):
    """Two real trials end-to-end on tiny synthetic data."""
    from hhrs_tpu.hpo.cli import main

    rc = main([
        "--trials", "2",
        "--journal", str(tmp_path / "journal.jsonl"),
        "--data", str(tmp_path / "data"),
        "--out", str(tmp_path / "artifacts"),
        "--synthetic",
        "--synth-users", "120", "--synth-items", "60", "--synth-reviews", "1500",
        "--epochs", "2",
        "train.eval_batch_size=512",
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "journal.jsonl")
    assert os.path.exists(tmp_path / "artifacts" / "manifest.json")


def test_int_from_unit_stays_on_grid():
    """A non-divisible int range must still snap to the declared step grid
    (from_unit(1.0) on low=0,high=11,step=3 is 9, not the off-grid 11)."""
    from hhrs_tpu.hpo.space import int_range

    d = int_range(0, 11, step=3)
    assert d.from_unit(1.0) == 9
    assert all(d.from_unit(u / 10) in (0, 3, 6, 9) for u in range(11))


def test_nan_intermediate_prunes_and_median_ignores_nan():
    """A diverged (NaN) trial prunes at its first report; a NaN posted at
    some step by a completed trial must not disable the median there."""
    import math

    from hhrs_tpu.hpo.pruner import MedianPruner
    from hhrs_tpu.hpo.study import Study, Trial

    study = Study(None, pruner=MedianPruner(n_startup_trials=0))
    study.trials = [
        {"state": "complete", "intermediates_by_step": {0: 0.5}},
        {"state": "complete", "intermediates_by_step": {0: math.nan}},
    ]
    t = Trial(0, {}, {}, study)
    t.report(math.nan, 0)
    assert t.should_prune()  # NaN best → prune immediately
    t2 = Trial(1, {}, {}, study)
    t2.report(0.9, 0)
    assert t2.should_prune()  # 0.9 > median(0.5) — the NaN didn't poison it
    t3 = Trial(2, {}, {}, study)
    t3.report(0.1, 0)
    assert not t3.should_prune()


def test_successive_halving_pruner():
    """ASHA semantics: rungs at min_resource·η^k epochs; a trial at a rung
    survives iff its best is in the top 1/η of all trials' bests there;
    pruned trials' curves COUNT as evidence; off-rung steps never prune."""
    from hhrs_tpu.hpo.pruner import SuccessiveHalvingPruner

    pr = SuccessiveHalvingPruner(min_resource=1, reduction_factor=3)
    # evidence: 3 trials that reached epoch 0 with bests 0.1, 0.2, 0.3
    ev = [{0: 0.1}, {0: 0.2}, {0: 0.3}]
    # rung at resource 1 (step 0): top ceil(3/3)=1 -> cutoff 0.1
    assert pr.should_prune(0, 0.25, [], all_intermediates=ev)
    assert not pr.should_prune(0, 0.05, [], all_intermediates=ev)
    assert not pr.should_prune(0, 0.1, [], all_intermediates=ev)  # ties survive
    # step 1 (resource 2) is NOT a rung for eta=3 -> never prunes
    ev2 = [{0: 0.1, 1: 0.1}, {0: 0.2, 1: 0.2}, {0: 0.3, 1: 0.3}]
    assert not pr.should_prune(1, 9.9, [], all_intermediates=ev2)
    # resource 3 (step 2) IS a rung; only trials that REACHED it count
    ev3 = [{0: 0.1, 1: 0.1, 2: 0.1}, {0: 0.2, 1: 0.2, 2: 0.2},
           {0: 0.3, 1: 0.3, 2: 0.3}, {0: 0.05}]  # last pruned at rung 1
    assert pr.should_prune(2, 0.25, [], all_intermediates=ev3)
    # too little rung evidence -> no pruning
    assert not pr.should_prune(0, 9.9, [], all_intermediates=[{0: 0.1}])
    # invalid params
    with pytest.raises(ValueError):
        SuccessiveHalvingPruner(reduction_factor=1)


def test_asha_in_study_uses_pruned_trial_evidence(tmp_path):
    """End-to-end through Study: early bad trials get cut at rung 1 once
    eta trials have posted there — without waiting for completions."""
    from hhrs_tpu.hpo.pruner import SuccessiveHalvingPruner
    from hhrs_tpu.hpo.space import float_range

    space = {"x": float_range(0.0, 1.0)}
    study = Study(None, seed=1,
                  pruner=SuccessiveHalvingPruner(min_resource=1, reduction_factor=2))
    calls = []

    def objective(trial):
        # trials 0,1 post the SAME good rung-1 value (a tie is within the
        # top 1/eta — `value > bests[keep-1]` is strict — so both survive;
        # the candidate is part of its own rung cohort, true ASHA
        # semantics); later trials post bad values and must be pruned AT
        # step 0, without waiting for completions
        good = trial.number < 2
        v0 = 0.1 if good else 0.5 + trial.number * 0.01
        trial.report(v0, 0)
        if trial.should_prune():
            calls.append((trial.number, "pruned@0"))
            raise TrialPruned()
        trial.report(v0 / 2 + 0.001 * trial.number, 1)
        calls.append((trial.number, "done"))
        return v0 / 2 + 0.001 * trial.number

    study.optimize(objective, space, n_trials=6)
    states = [t["state"] for t in study.trials]
    assert states[:2] == ["complete", "complete"]
    assert states[2:] == ["pruned"] * 4  # every later bad trial cut at rung 1


def test_nan_after_finite_epoch_prunes_immediately():
    """min() is order-dependent over NaN — a trial that diverges AFTER a
    finite first epoch must still insta-prune (r4 review finding)."""
    from hhrs_tpu.hpo.study import Study, Trial

    study = Study(seed=0)
    t = Trial(0, {}, {}, study)
    t.report(0.65, 0)
    assert not t.should_prune()
    t.report(float("nan"), 1)
    assert t.should_prune()


def test_journal_stays_strict_json_with_nan_intermediates(tmp_path):
    """Non-finite intermediates must round-trip through the journal as
    null (strict JSON — no NaN tokens), restored as nan for the pruners."""
    import json
    import math

    from hhrs_tpu.hpo.study import Study, Trial

    path = str(tmp_path / "j.jsonl")
    study = Study(journal_path=path, seed=0)
    t = Trial(0, {}, {"lr": 1e-3}, study)
    t.report(0.6, 0)
    t.report(float("nan"), 1)
    study.tell(t, "pruned")

    for line in open(path):
        json.loads(line, parse_constant=lambda c: (_ for _ in ()).throw(
            ValueError(f"non-standard JSON token {c}")))

    resumed = Study(journal_path=path, seed=0)
    inter = resumed.trials[0]["intermediates_by_step"]
    assert inter[0] == 0.6 and math.isnan(inter[1])


def test_asha_uses_in_flight_sibling_evidence():
    """Asynchronous halving must see asked-but-untold siblings' curves —
    the property that lets vectorized lanes prune each other mid-round."""
    from hhrs_tpu.hpo.pruner import SuccessiveHalvingPruner
    from hhrs_tpu.hpo.study import Study, Trial

    study = Study(seed=0, pruner=SuccessiveHalvingPruner(min_resource=1,
                                                         reduction_factor=2))
    trials = [Trial(i, {}, {}, study) for i in range(3)]
    study._in_flight.extend(trials)
    # two in-flight siblings post good rung-1 values; the third posts a bad one
    trials[0].report(0.10, 0)
    trials[1].report(0.12, 0)
    trials[2].report(0.90, 0)
    # with eta=2 and 3 rung entries (cohort INCLUDES the candidate),
    # ceil(3/2)=2 survive: only the bad trial prunes, purely on IN-FLIGHT
    # evidence (study.trials is empty)
    assert study.trials == []
    assert trials[2].should_prune()
    assert not trials[0].should_prune()
    assert not trials[1].should_prune()  # second-best of 3 is in the top 1/2

    # exactly eta trials at a rung: halving must already fire (docstring:
    # "starts cutting as soon as reduction_factor trials have touched a
    # rung") — the self-excluding cohort could never reach eta entries
    study2 = Study(seed=0, pruner=SuccessiveHalvingPruner(min_resource=1,
                                                          reduction_factor=2))
    pair = [Trial(i, {}, {}, study2) for i in range(2)]
    study2._in_flight.extend(pair)
    pair[0].report(0.10, 0)
    pair[1].report(0.90, 0)
    assert pair[1].should_prune()
    assert not pair[0].should_prune()
