"""DB seeding + model registry tests (reference database_setup.py parity:
idempotent seed, sorted-pair friendship dedup, rollback; plus the
functional registry the reference only designed)."""

import json
import os
import sqlite3

import pytest

from hhrs_tpu.data.synthetic import write_synthetic_dataset
from hhrs_tpu.db.registry import ModelRegistry, resolve_artifacts_dir, seed_database


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dbdata"))
    write_synthetic_dataset(d, n_users=100, n_items=40, n_reviews=800, n_friendships=200, seed=5)
    return d


def test_seed_counts_and_dedup(data_dir, tmp_path):
    db = str(tmp_path / "hhrs.sqlite")
    counts = seed_database(db, data_dir)
    assert counts["reviews"] == 800
    assert counts["hotels"] <= 40
    assert counts["users"] >= counts["hotels"] > 0

    conn = sqlite3.connect(db)
    # sorted-pair invariant (reference database_setup.py:105-110)
    bad = conn.execute("SELECT COUNT(*) FROM friendships WHERE user_id_1 >= user_id_2").fetchone()[0]
    assert bad == 0
    # reseeding is idempotent
    counts2 = seed_database(db, data_dir)
    assert counts2 == counts
    conn.close()


def test_seed_rollback_on_missing_data(tmp_path):
    db = str(tmp_path / "x.sqlite")
    with pytest.raises(FileNotFoundError):
        seed_database(db, str(tmp_path / "nope"))


def test_registry_lifecycle(tmp_path):
    db = str(tmp_path / "reg.sqlite")
    # a missing db is an error unless explicitly creating (typo'd
    # registry:<db> specs must not invent empty databases)
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        ModelRegistry(db)
    reg = ModelRegistry(db, create=True)
    assert reg.active() is None

    a = reg.register("v1", str(tmp_path / "art1"), metrics={"val_auc": 0.91})
    b = reg.register("v2", str(tmp_path / "art2"), metrics={"val_auc": 0.93})
    assert reg.active()["version"] == "v2"  # latest registration activates

    reg.activate(a)
    assert reg.active()["version"] == "v1"
    assert len(reg.list()) == 2
    with pytest.raises(KeyError):
        reg.activate(999)

    assert resolve_artifacts_dir(f"registry:{db}") == os.path.abspath(str(tmp_path / "art1"))
    assert resolve_artifacts_dir("plain/dir") == "plain/dir"


def test_db_cli_seed_and_register(data_dir, tmp_path):
    from hhrs_tpu.db.cli import main

    db = str(tmp_path / "cli.sqlite")
    assert main(["seed", "--db", db, "--data", data_dir]) == 0

    art = tmp_path / "arts"
    art.mkdir()
    (art / "manifest.json").write_text(json.dumps({"metrics": {"val_auc": 0.9}, "model_config": {}}))
    assert main(["register", "--db", db, "--artifacts", str(art)]) == 0
    assert ModelRegistry(db).active()["metrics"]["val_auc"] == 0.9
    assert main(["list", "--db", db]) == 0
    # error path returns 1 (reference exit-1 semantics)
    assert main(["seed", "--db", db, "--data", str(tmp_path / "missing")]) == 1


def test_promote_if_better_gate(tmp_path):
    """promote_if_better: first candidate promotes (no incumbent), worse
    loses but is registered inactive, better wins; direction auto-infers
    maximize for AUC; missing candidate metric raises."""
    from hhrs_tpu.db.registry import ModelRegistry

    db = str(tmp_path / "r.sqlite")
    reg = ModelRegistry(db, create=True)

    a, promoted, why = reg.promote_if_better(
        None, str(tmp_path / "a"), {"val_logloss": 0.50})
    assert promoted and "no active model" in why
    assert reg.active()["model_id"] == a

    b, promoted, why = reg.promote_if_better(
        None, str(tmp_path / "b"), {"val_logloss": 0.60})
    assert not promoted and reg.active()["model_id"] == a
    # the loser is still in the history, inactive
    rows = {m["model_id"]: m for m in reg.list()}
    assert rows[b]["is_active"] is False

    c, promoted, _ = reg.promote_if_better(
        None, str(tmp_path / "c"), {"val_logloss": 0.40})
    assert promoted and reg.active()["model_id"] == c

    # maximize metrics auto-infer direction
    d, promoted, _ = reg.promote_if_better(
        None, str(tmp_path / "d"), {"val_logloss": 0.45, "val_auc": 0.95},
        metric="val_auc")
    assert promoted  # incumbent c has no val_auc -> promote
    e, promoted, _ = reg.promote_if_better(
        None, str(tmp_path / "e"), {"val_auc": 0.90}, metric="val_auc")
    assert not promoted  # 0.90 < 0.95 under maximize

    with pytest.raises(KeyError, match="no 'val_auc'"):
        reg.promote_if_better(None, str(tmp_path / "f"), {"x": 1}, metric="val_auc")
    with pytest.raises(ValueError, match="min|max|auto"):
        reg.promote_if_better(None, str(tmp_path / "g"), {"val_auc": 1.0},
                              metric="val_auc", direction="up")


def test_db_cli_promote(tmp_path):
    """promote subcommand end-to-end: winner activates, loser stays inactive."""
    import json as _json

    from hhrs_tpu.db.cli import main
    from hhrs_tpu.db.registry import ModelRegistry

    db = str(tmp_path / "p.sqlite")
    art1, art2 = tmp_path / "m1", tmp_path / "m2"
    for art, ll in ((art1, 0.5), (art2, 0.7)):
        art.mkdir()
        (art / "manifest.json").write_text(_json.dumps(
            {"metrics": {"val_logloss": ll}, "model_config": {"emb_dim": 16}}))
    assert main(["promote", "--db", db, "--artifacts", str(art1)]) == 0
    assert main(["promote", "--db", db, "--artifacts", str(art2)]) == 0
    reg = ModelRegistry(db)
    active = reg.active()
    assert active["artifact_path"].endswith("m1")
    assert len(reg.list()) == 2


def test_promote_rejects_candidate_in_active_dir(tmp_path):
    """A candidate exported over the ACTIVE model's dir has already
    clobbered its weights — the gate must refuse, not register."""
    from hhrs_tpu.db.registry import ModelRegistry

    reg = ModelRegistry(str(tmp_path / "r.sqlite"), create=True)
    reg.promote_if_better(None, str(tmp_path / "a"), {"val_logloss": 0.5})
    with pytest.raises(ValueError, match="own directory"):
        reg.promote_if_better(None, str(tmp_path / "a"), {"val_logloss": 0.4})
    assert len(reg.list()) == 1  # the refused candidate was NOT registered


def test_promote_incumbent_value_override(tmp_path):
    """incumbent_value (the --eval-data re-scored gate) wins over the
    incumbent's stored manifest metric."""
    from hhrs_tpu.db.registry import ModelRegistry

    reg = ModelRegistry(str(tmp_path / "r.sqlite"), create=True)
    a, _, _ = reg.promote_if_better(None, str(tmp_path / "a"), {"val_logloss": 0.5})
    # stored incumbent metric says 0.5; re-scored says 0.3 -> candidate 0.4 loses
    _, promoted, why = reg.promote_if_better(
        None, str(tmp_path / "b"), {"val_logloss": 0.4}, incumbent_value=0.3)
    assert not promoted and "re-scored" in why
    assert reg.active()["model_id"] == a


def test_db_cli_active_path(tmp_path, capsys):
    from hhrs_tpu.db.cli import main
    from hhrs_tpu.db.registry import ModelRegistry

    db = str(tmp_path / "r.sqlite")
    assert main(["active-path", "--db", db]) == 1  # no such db -> error
    ModelRegistry(db, create=True).register("v1", str(tmp_path / "art"))
    assert main(["active-path", "--db", db]) == 0
    assert capsys.readouterr().out.strip().endswith("art")
