"""Vectorized HPO (hpo/vectorized.py): K same-architecture trials in one
vmapped program must reproduce the sequential trainer trial-for-trial."""

import json

import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data import Preprocessor, add_engineered_features
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.hpo.space import reference_search_space
from hhrs_tpu.hpo.study import Study
from hhrs_tpu.hpo.vectorized import arch_key, group_trials, run_group
from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.train.trainer import train_dcn


ARCH = {"emb_dim": 8, "hidden_dim": 32, "n_cross_layers": 2, "n_res_blocks": 1,
        "batch_size": 256, "optimizer": "adamw"}


def _trial(lr, wd, dropout, optimizer="adamw", patience=1, factor=0.5):
    p = dict(ARCH)
    p.update(lr=lr, weight_decay=wd, dropout=dropout, optimizer=optimizer,
             lr_plateau_patience=patience, lr_plateau_factor=factor)
    return p


@pytest.fixture(scope="module")
def dataset():
    ds = generate_synthetic_dataset(n_users=300, n_items=120, n_reviews=8000, seed=11)
    df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(df)
    return splits, ModelDims.from_artifacts(art)


def _cfgs(params):
    mcfg = ModelConfig(
        emb_dim=params["emb_dim"], hidden_dim=params["hidden_dim"],
        n_cross_layers=params["n_cross_layers"], n_res_blocks=params["n_res_blocks"],
        dropout=float(params["dropout"]),
    )
    tcfg = TrainConfig(
        lr=float(params["lr"]), batch_size=params["batch_size"],
        weight_decay=float(params["weight_decay"]), optimizer=params["optimizer"],
        lr_plateau_patience=params["lr_plateau_patience"],
        lr_plateau_factor=params["lr_plateau_factor"],
        n_epochs=4, early_stop_patience=5,
    )
    return mcfg, tcfg


def test_group_trials_partitions_by_shape_and_optimizer():
    trials = [
        _trial(1e-3, 1e-5, 0.2),
        _trial(3e-3, 1e-4, 0.5),               # same arch → same group
        _trial(1e-3, 1e-5, 0.2, optimizer="adam"),  # family differs → new group
        {**_trial(1e-3, 1e-5, 0.2), "hidden_dim": 64},  # shape differs → new group
    ]
    groups = group_trials(trials)
    assert sorted(len(v) for v in groups.values()) == [1, 1, 2]
    assert groups[arch_key(trials[0])] == [0, 1]


@pytest.mark.parametrize("optimizer", ["adamw", "adam"])
def test_vectorized_group_matches_sequential_trainer(dataset, optimizer):
    """Each lane of a 3-trial vmapped group reproduces the sequential
    train_dcn run with the same hyperparams: val-loss history, plateau-LR
    decisions, best epoch, and final metrics (dropout ON — the rng streams
    coincide by construction)."""
    splits, dims = dataset
    trials = [
        _trial(3e-3, 1e-5, 0.2, optimizer=optimizer),
        _trial(1e-3, 1e-4, 0.5, optimizer=optimizer, patience=2, factor=0.1),
        _trial(2e-2, 1e-6, 0.1, optimizer=optimizer),  # hot lr → plateau likely fires
    ]
    mcfg, tcfg = _cfgs(trials[0])
    vres = run_group(splits, dims, mcfg, tcfg, trials)

    for t, vr in zip(trials, vres):
        m, tc = _cfgs(t)
        sr = train_dcn(splits, dims, m, tc)
        assert len(vr.history) == len(sr.history)
        for hv, hs in zip(vr.history, sr.history):
            assert hv["val_loss"] == pytest.approx(hs["val_loss"], rel=2e-3)
            assert hv["train_loss"] == pytest.approx(hs["train_loss"], rel=2e-3)
            assert hv["lr"] == pytest.approx(hs["lr"])
        assert vr.best_epoch == sr.best_epoch
        assert vr.best_val_loss == pytest.approx(sr.best_val_loss, rel=2e-3)
        assert vr.final_metrics["val_auc"] == pytest.approx(
            sr.final_metrics["val_auc"], abs=5e-3)
        assert vr.final_metrics["val_logloss"] == pytest.approx(
            sr.final_metrics["val_logloss"], rel=2e-3)


def test_lane_pruning_and_early_stop_isolation(dataset):
    """A pruned lane stops reporting while its siblings run to the cap."""
    splits, dims = dataset
    trials = [_trial(1e-3, 1e-5, 0.2), _trial(3e-3, 1e-4, 0.3)]
    mcfg, tcfg = _cfgs(trials[0])
    reports = {0: [], 1: []}

    def rf(k):
        def f(epoch, vl):
            reports[k].append(epoch)
            return k == 0 and epoch >= 1  # prune lane 0 at epoch 1

        return f

    vres = run_group(splits, dims, mcfg, tcfg, trials, report_fns=[rf(0), rf(1)])
    assert vres[0].pruned and not vres[1].pruned
    assert reports[0] == [0, 1]            # stopped reporting after pruning
    assert len(vres[0].history) == 2
    assert len(vres[1].history) == tcfg.n_epochs
    assert reports[1] == list(range(tcfg.n_epochs))


def test_group_rejects_mixed_architectures(dataset):
    splits, dims = dataset
    trials = [_trial(1e-3, 1e-5, 0.2), {**_trial(1e-3, 1e-5, 0.2), "hidden_dim": 64}]
    mcfg, tcfg = _cfgs(trials[0])
    with pytest.raises(ValueError, match="architectures"):
        run_group(splits, dims, mcfg, tcfg, trials)


def test_study_ask_tell_journal_roundtrip(tmp_path):
    space = reference_search_space()
    journal = str(tmp_path / "j.jsonl")
    study = Study(journal_path=journal, seed=3)
    asked = study.ask(space, 3)
    assert [t.number for t in asked] == [0, 1, 2]
    for t in asked:
        assert set(t.params) == set(space)

    study.tell(asked[0], "complete", 0.5)
    study.tell(asked[1], "pruned")
    study.tell(asked[2], "failed", error="boom")
    assert [t["state"] for t in study.trials] == ["complete", "pruned", "failed"]
    assert study.best_value == 0.5

    # non-finite completions are recorded as failed (journal-safe JSON)
    extra = study.ask(space, 1)[0]
    rec = study.tell(extra, "complete", float("nan"))
    assert rec["state"] == "failed"

    # reload: records + numbering resume
    study2 = Study(journal_path=journal, seed=3)
    assert len(study2.trials) == 4
    assert study2.ask(space, 1)[0].number == 4
    with open(journal) as f:
        for line in f:
            json.loads(line)


def test_lane_sharded_group_matches_unsharded(dataset):
    """shard_lanes=True (trial axis over the 8-device mesh) reproduces the
    unsharded group lane-for-lane: per-lane math crosses no lanes, so the
    partitioned program is the same per-lane computation."""
    splits, dims = dataset
    trials = [_trial(1e-3 * (1.5 ** i), 1e-5, 0.1 + 0.05 * i) for i in range(8)]
    mcfg, tcfg = _cfgs(trials[0])
    base = run_group(splits, dims, mcfg, tcfg, trials)
    sharded = run_group(splits, dims, mcfg, tcfg, trials, shard_lanes=True)
    # Not bit-exact: the partitioned program tiles the batched matmuls at
    # [K/8, B, ·] instead of [K, B, ·], changing f32 summation order inside
    # each lane's dots — the tolerance is accumulation-order-level, same
    # class as the mesh-trainer parity bound (tests/test_parallel_full_run).
    for b, s in zip(base, sharded):
        assert len(b.history) == len(s.history)
        for hb, hs in zip(b.history, s.history):
            assert hs["val_loss"] == pytest.approx(hb["val_loss"], rel=1e-3)
            assert hs["lr"] == pytest.approx(hb["lr"])
        assert s.best_epoch == b.best_epoch
        assert s.final_metrics["val_logloss"] == pytest.approx(
            b.final_metrics["val_logloss"], rel=1e-3)
        assert s.final_metrics["val_auc"] == pytest.approx(
            b.final_metrics["val_auc"], abs=2e-3)


def test_lane_sharding_rejects_indivisible_group(dataset):
    splits, dims = dataset
    trials = [_trial(1e-3, 1e-5, 0.2) for _ in range(3)]  # 3 lanes, 8 devices
    mcfg, tcfg = _cfgs(trials[0])
    with pytest.raises(ValueError, match="multiple of the device count"):
        run_group(splits, dims, mcfg, tcfg, trials, shard_lanes=True)


def test_ask_shared_arch_forms_one_group():
    """Arch-major ask: shared dims are sampled once per batch, so the whole
    batch lands in ONE vmapped group; scalar dims still vary per trial."""
    from hhrs_tpu.hpo.vectorized import ARCH_KEYS

    space = reference_search_space()
    study = Study(seed=7)
    asked = study.ask(space, 8, shared=ARCH_KEYS)
    assert len(group_trials([t.params for t in asked])) == 1
    for key in ARCH_KEYS:
        assert len({t.params[key] for t in asked}) == 1
    # the scalar dims must NOT be copies (lr is continuous — 8 identical
    # samples would mean the sharing leaked into the scalar dims)
    assert len({t.params["lr"] for t in asked}) > 1
    # independent ask keeps full per-trial sampling (arch dims vary)
    indep = study.ask(space, 8)
    assert len(group_trials([t.params for t in indep])) > 1


def test_hpo_cli_vectorized_smoke(tmp_path):
    """--vectorize 4 end-to-end: 4 trials asked per round, grouped by
    architecture, journal holds 4 tell'd records, best artifacts exported."""
    import os

    from hhrs_tpu.hpo.cli import main

    rc = main([
        "--trials", "4",
        "--vectorize", "4",
        "--journal", str(tmp_path / "journal.jsonl"),
        "--data", str(tmp_path / "data"),
        "--out", str(tmp_path / "artifacts"),
        "--synthetic",
        "--synth-users", "120", "--synth-items", "60", "--synth-reviews", "1500",
        "--epochs", "2",
        "train.eval_batch_size=512",
    ])
    assert rc == 0
    study = Study(journal_path=str(tmp_path / "journal.jsonl"))
    assert len(study.trials) == 4
    assert all(t["state"] in ("complete", "pruned", "failed") for t in study.trials)
    assert any(t["state"] == "complete" for t in study.trials)
    done = [t for t in study.trials if t["state"] == "complete"]
    assert all("val_auc" in t["user_attrs"] for t in done)
    assert all(t["user_attrs"]["group_examples_per_s"] >=
               t["user_attrs"]["examples_per_s"] for t in done)
    assert os.path.exists(tmp_path / "artifacts" / "manifest.json")
    # the exported manifest must carry the WINNING trial's dropout (a
    # per-lane vmapped scalar), not the group-shared config's
    best = min(done, key=lambda t: t["value"])
    manifest = json.loads((tmp_path / "artifacts" / "manifest.json").read_text())
    assert manifest["model_config"]["dropout"] == pytest.approx(best["params"]["dropout"])


def test_optimize_still_sequential_after_refactor(tmp_path):
    """Study.optimize (now routed through ask/tell) keeps its contract:
    resume-aware trial count, pruned/failed isolation, best tracking."""
    from hhrs_tpu.hpo.study import TrialPruned

    space = {"lr": reference_search_space()["lr"]}
    study = Study(journal_path=str(tmp_path / "o.jsonl"), seed=0)
    calls = []

    def objective(trial):
        calls.append(trial.number)
        if trial.number == 1:
            raise TrialPruned()
        if trial.number == 2:
            raise RuntimeError("boom")
        return float(trial.params["lr"])

    study.optimize(objective, space, n_trials=4)
    assert calls == [0, 1, 2, 3]
    states = [t["state"] for t in study.trials]
    assert states == ["complete", "pruned", "failed", "complete"]
    assert study.best_value == min(study.trials[0]["value"], study.trials[3]["value"])


def test_cli_vectorize_shard_requires_vectorize():
    from hhrs_tpu.hpo.cli import main

    with pytest.raises(SystemExit):
        main(["--vectorize-shard", "--trials", "2"])


def test_lane_reclamation_refills_dead_lanes(dataset):
    """VERDICT r3 item 4: a pruned lane is finalized and refilled with a
    fresh same-arch trial at the epoch boundary — index updates only, the
    compiled program never changes — and the refilled trial trains a FULL
    epoch budget on its own age clock."""
    splits, dims = dataset
    t0 = _trial(3e-3, 1e-4, 0.0)
    t1 = _trial(1e-3, 1e-5, 0.1)
    mcfg, tcfg = _cfgs(t0)  # n_epochs=4

    prune_lane1_at_0 = [
        None,
        lambda epoch, vl: epoch == 0,  # lane 1 dies after its first epoch
    ]
    # ONE refill in the budget: the pruned lane consumes it; when lane 0
    # later completes its budget, refill_fn returns None and it goes dormant
    refills = [_trial(2e-3, 1e-6, 0.2)]
    handed = []

    def refill_fn():
        if not refills:
            return None
        p = refills.pop(0)
        handed.append(p)
        return p, None  # no pruning hook for the refills

    results = run_group(splits, dims, mcfg, tcfg, [t0, t1],
                        report_fns=prune_lane1_at_0, refill_fn=refill_fn)

    # initial 2 trials + 1 refill (only one lane ever died with budget left)
    assert len(results) == 3
    assert results[1].pruned and len(results[1].history) == 1
    assert not results[0].pruned and len(results[0].history) == 4
    # the refilled trial ran its FULL budget from age 0
    r2 = results[2]
    assert not r2.pruned
    assert [h["epoch"] for h in r2.history] == [0, 1, 2, 3]
    assert np.isfinite(r2.best_val_loss)
    assert "val_auc" in r2.final_metrics and "val_auc" in results[0].final_metrics
    # results[1] (pruned) has no final metrics, per the no-refill contract
    assert results[1].final_metrics == {}
    assert len(handed) == 1


def test_lane_reclamation_refill_starts_from_fresh_init(dataset):
    """A refilled lane must NOT inherit the dead trial's weights: with
    identical hyperparams, a lane refilled at epoch boundary e produces a
    first-epoch val loss in the same range as a from-scratch first epoch,
    not a continued-training loss."""
    splits, dims = dataset
    base = _trial(3e-3, 1e-4, 0.0)
    mcfg, tcfg = _cfgs(base)

    refilled = []

    def refill_fn():
        if refilled:
            return None
        refilled.append(True)
        return dict(base), None

    # lane 0 pruned after epoch 0; refill with IDENTICAL hyperparams
    results = run_group(
        splits, dims, mcfg, tcfg, [base],
        report_fns=[lambda e, v: e == 0], refill_fn=refill_fn,
    )
    assert len(results) == 2
    first_epoch_loss_original = results[0].history[0]["val_loss"]
    first_epoch_loss_refill = results[1].history[0]["val_loss"]
    # same init, same scalars, different shuffle epoch: close but the
    # original's CONTINUED loss would be much lower than a first epoch
    assert abs(first_epoch_loss_refill - first_epoch_loss_original) < 0.05


def test_refill_arch_mismatch_rejected(dataset):
    splits, dims = dataset
    base = _trial(3e-3, 1e-4, 0.0)
    mcfg, tcfg = _cfgs(base)
    bad = dict(base, hidden_dim=base["hidden_dim"] * 2)

    with pytest.raises(ValueError, match="different"):
        run_group(splits, dims, mcfg, tcfg, [base],
                  report_fns=[lambda e, v: e == 0],
                  refill_fn=lambda: (bad, None))


def test_study_ask_fixed_pins_params():
    from hhrs_tpu.hpo.vectorized import ARCH_KEYS

    space = reference_search_space()
    study = Study(seed=3)
    fixed = {k: v for k, v in ARCH.items() if k in ARCH_KEYS}
    trials = study.ask(space, k=4, fixed=fixed)
    for t in trials:
        for k, v in fixed.items():
            assert t.params[k] == v
    # non-fixed scalars vary across proposals
    assert len({t.params["lr"] for t in trials}) > 1
    with pytest.raises(ValueError, match="not in space"):
        study.ask(space, fixed={"bogus_param": 1})


def test_reclaim_lanes_requires_vectorize():
    from hhrs_tpu.hpo.cli import main as hpo_main

    with pytest.raises(SystemExit):
        hpo_main(["--synthetic", "--trials", "2", "--reclaim-lanes"])
