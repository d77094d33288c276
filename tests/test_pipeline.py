"""Continuous-training pipeline (hhrs_tpu/pipeline.py): ONE supervised
command closes watch → fine-tune → gate → promote.

The reference's retraining story is a one-shot script plus hand-copied
artifacts plus a server restart (reference train.py:270-397,
main.py:233-284); here the loop runs unattended and a `--reload-poll-s` /
`--data-poll-s` server picks the results up live (test_serve_reload.py).
"""

import json
import os
import threading

from hhrs_tpu import pipeline
from hhrs_tpu.data.synthetic import append_reviews, write_synthetic_dataset
from hhrs_tpu.db.registry import ModelRegistry

# tiny model + tiny batches: each cycle is a real train→eval→gate pass
OVR = ["model.emb_dim=8", "model.hidden_dim=32", "model.n_cross_layers=1",
       "model.n_res_blocks=1", "train.batch_size=256"]


def _history(runs_dir):
    with open(os.path.join(runs_dir, "pipeline_history.jsonl")) as f:
        return [json.loads(line) for line in f]


def _append_reviews(data_dir: str, user_id: int, n: int = 8) -> None:
    # the shared refreshed-data-drop simulator (hhrs_tpu/data/synthetic.py)
    append_reviews(data_dir, user_id, n=n)


def test_pipeline_cold_warm_and_watch(tmp_path):
    data = str(tmp_path / "data")
    write_synthetic_dataset(data, n_users=150, n_items=60, n_reviews=3000, seed=9)
    db = str(tmp_path / "reg.sqlite")
    runs = str(tmp_path / "runs")
    base = ["--data", data, "--db", db, "--runs-dir", runs]

    # cycle 1: empty registry → COLD train; first model promotes
    # unconditionally (no incumbent to beat)
    rc = pipeline.main(base + ["--once", "--epochs", "1"] + OVR)
    assert rc == 0
    active = ModelRegistry(db).active()
    assert active is not None
    h = _history(runs)
    assert h[-1]["ok"] and h[-1]["promoted"] is True
    assert h[-1]["warm_start_from"] is None
    assert h[-1]["run_dir"] == active["artifact_path"]
    first_path = active["artifact_path"]

    # refresh the data, cycle 2: WARM start from the active model, and the
    # gate re-scores BOTH models on the refreshed dataset
    _append_reviews(data, 77_000_001)
    rc = pipeline.main(base + ["--once", "--epochs", "1"] + OVR)
    assert rc == 0
    h = _history(runs)
    assert h[-1]["ok"] and h[-1]["warm_start_from"] == first_path
    assert isinstance(h[-1]["promoted"], bool) and h[-1]["reason"]
    models = ModelRegistry(db).list()
    assert len(models) == 2
    assert sum(m["is_active"] for m in models) == 1  # loser stays inactive
    # the gate's apples-to-apples metrics are recorded on the candidate,
    # the cycle trained/gated from a consistent snapshot, and the audit
    # field records the DURABLE data dir (not the deleted temp snapshot)
    cand = next(m for m in models if m["artifact_path"] == h[-1]["run_dir"])
    assert "gate_logloss" in cand["metrics"]
    assert h[-1]["snapshot"] is True
    assert cand["metrics"]["gate_eval_data"] == os.path.abspath(data)

    # WATCH mode: debounced fingerprint trigger → one more cycle, then exit
    # via --max-cycles. Run in a thread; a data drop lands mid-watch.
    done = {}

    def watch():
        done["rc"] = pipeline.main(
            base + ["--poll-s", "0.05", "--max-cycles", "1",
                    "--epochs", "1"] + OVR)

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    # let the watcher take its BASELINE fingerprint before the drop lands —
    # appending first would make the refreshed files the baseline and the
    # watcher would (correctly) never trigger
    import time

    time.sleep(2.0)
    _append_reviews(data, 77_000_002)
    t.join(timeout=240)
    assert not t.is_alive() and done["rc"] == 0
    h = _history(runs)
    assert len(h) == 3 and h[-1]["ok"]
    assert h[-1]["trigger_fingerprint"]  # watch cycles record their trigger
    assert len(ModelRegistry(db).list()) == 3


def test_pipeline_once_survives_bad_data(tmp_path):
    """A torn/bad data drop fails the cycle (exit 1) but records the
    failure instead of raising — the watch loop stays alive on this."""
    data = str(tmp_path / "data")
    os.makedirs(data)
    with open(os.path.join(data, "hackathon_augmented_data.csv"), "w") as f:
        f.write("guest_id,hotel_id\n1,2\n")  # missing required columns
    db = str(tmp_path / "reg.sqlite")
    runs = str(tmp_path / "runs")
    rc = pipeline.main(["--data", data, "--db", db, "--runs-dir", runs,
                        "--once", "--epochs", "1"] + OVR)
    assert rc == 1
    h = _history(runs)
    assert h[-1]["ok"] is False and h[-1]["stage"] == "train"
    assert not os.path.exists(db) or ModelRegistry(db).active() is None


def test_pipeline_trains_from_snapshot_not_live_dir(tmp_path, monkeypatch):
    """run_cycle must hand the trainer a SNAPSHOT dir, so a writer
    appending mid-train cannot tear the read (r4 review: debounce alone
    cannot protect a minutes-long read; the serve-side starvation was
    measured before the same fix there)."""
    import hhrs_tpu.train.cli as train_cli_mod

    data = str(tmp_path / "data")
    write_synthetic_dataset(data, n_users=60, n_items=30, n_reviews=800, seed=3)
    seen = {}

    def fake_train(argv):
        i = argv.index("--data")
        seen["data_arg"] = argv[i + 1]
        # writer races the "training": the live dir changes NOW
        append_reviews(data, 42_000_000)
        seen["snapshot_rows_stable"] = os.path.getsize(
            os.path.join(argv[i + 1], "hackathon_augmented_data.csv"))
        return 1  # end the cycle at the train stage (assertions above ran)

    monkeypatch.setattr(train_cli_mod, "main", fake_train)
    rec = pipeline.run_cycle(data, str(tmp_path / "reg.sqlite"),
                             str(tmp_path / "runs"), epochs=1)
    assert rec["snapshot"] is True
    assert seen["data_arg"] != data           # trained from the snapshot...
    live = os.path.getsize(os.path.join(data, "hackathon_augmented_data.csv"))
    assert seen["snapshot_rows_stable"] < live  # ...which the write missed
    assert rec["ok"] is False and rec["stage"] == "train"


def test_pipeline_promotion_feeds_registry_hot_reload(tmp_path):
    """The zero-restart loop's handshake: a pipeline cycle PROMOTES a new
    model in the registry, and a live server's RegistryReloader picks it
    up on its next poll tick — no restart between train and serve."""
    from hhrs_tpu.serve.engine import RecommendationEngine
    from hhrs_tpu.serve.reload import RegistryReloader, SwappableEngine
    from hhrs_tpu.train.artifacts import load_artifact_bundle

    data = str(tmp_path / "data")
    write_synthetic_dataset(data, n_users=120, n_items=50, n_reviews=2500, seed=5)
    db = str(tmp_path / "reg.sqlite")
    runs = str(tmp_path / "runs")
    base = ["--data", data, "--db", db, "--runs-dir", runs,
            "--once", "--epochs", "1"] + OVR

    assert pipeline.main(base) == 0          # cycle 1 → active model v1
    v1 = ModelRegistry(db).active()["artifact_path"]

    def build(adir):
        return RecommendationEngine.from_dirs(adir, data)

    holder = SwappableEngine(build(v1))      # "server" boots on v1
    reloader = RegistryReloader(holder, f"registry:{db}", build,
                                poll_s=3600, current_dir=v1)
    assert reloader.check_once() is False    # nothing new yet

    append_reviews(data, 66_000_001, n=6)
    assert pipeline.main(base) == 0          # cycle 2 → gate decides
    active = ModelRegistry(db).active()["artifact_path"]
    hist = _history(runs)
    if hist[-1]["promoted"]:
        assert active == hist[-1]["run_dir"]  # the candidate won
        assert reloader.check_once() is True  # ...and the server swapped
    else:
        assert active == v1                   # incumbent kept
        # promote_if_better re-registers the incumbent as a NEW activation
        # (new model_id) or keeps it; either way the server must end up
        # serving the active registration
        reloader.check_once()
    assert holder.artifacts_dir == active
    uni = holder.gen.universe
    assert "ranked_hotels" in holder.recommend(
        int(uni.user_ids[0]), uni.cities[0], "friends", 1.0)


def test_pipeline_gate_runs_under_the_trainer_config(tmp_path, monkeypatch):
    """r4 review: the gate must evaluate under the SAME layered config the
    trainer used — a default-config gate noise-filters/splits differently
    under data.* overrides, and its 'val' rows can overlap the candidate's
    training rows. Also pins the durable audit path."""
    import hhrs_tpu.db.cli as db_cli

    captured = {}
    real = db_cli.run_promote

    def spy(*a, **kw):
        captured.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(db_cli, "run_promote", spy)
    data = str(tmp_path / "data")
    write_synthetic_dataset(data, n_users=80, n_items=40, n_reviews=1200, seed=6)
    rc = pipeline.main(["--data", data, "--db", str(tmp_path / "r.sqlite"),
                        "--runs-dir", str(tmp_path / "runs"),
                        "--once", "--epochs", "1",
                        "data.positive_rating=7"] + OVR)
    assert rc == 0
    assert captured["cfg"].data.positive_rating == 7  # layered cfg reached the gate
    assert captured["record_eval_data"] == data       # durable audit path
