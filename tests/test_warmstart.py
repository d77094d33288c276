"""Warm-start fine-tuning (train/warmstart.py, train CLI --init-from).

The production retrain path: encoders/scaler frozen to the artifact,
user/item vocabs grow id-stably, table rows + tower weights copied.
"""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data import Preprocessor, add_engineered_features, noise_filter
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
from hhrs_tpu.train.metrics import bce_with_logits
from hhrs_tpu.train.trainer import train_dcn
from hhrs_tpu.train.warmstart import extend_mapping, prepare_warm_start

MCFG = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=2, n_res_blocks=1,
                   dropout=0.2)


def _frames():
    """(df_a, df_b) from ONE generation so user/item latents are stable:
    A sees only users 1..150; B is the full set — the 'refreshed dataset
    with new users and new reviews' shape warm start targets."""
    ds = generate_synthetic_dataset(n_users=250, n_items=90, n_reviews=8000, seed=7)
    df = ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    df = add_engineered_features(noise_filter(df))
    df_a = df[(df["user_id"] <= 150) & (df["item_id"] <= 160)]
    return df_a.reset_index(drop=True), df


@pytest.fixture(scope="module")
def shipped(tmp_path_factory):
    """A trained + exported model on the SMALL (old-users-only) dataset."""
    out = str(tmp_path_factory.mktemp("ws_artifacts"))
    df_a, _ = _frames()
    splits, art = Preprocessor().fit_transform(df_a)
    dims = ModelDims.from_artifacts(art)
    res = train_dcn(splits, dims, MCFG,
                    TrainConfig(batch_size=256, n_epochs=3, early_stop_patience=5))
    export_artifacts(out, res.params, res.bn_state, MCFG, dims, art,
                     res.final_metrics)
    return out


def test_extend_mapping_preserves_rows():
    m, n_new = extend_mapping({10: 0, 20: 1}, [20, 30, 10, 30, 40])
    assert m == {10: 0, 20: 1, 30: 2, 40: 3}
    assert n_new == 2


def test_warm_start_grows_vocab_and_copies_rows(shipped):
    bundle = load_artifact_bundle(shipped)
    _, df_b = _frames()  # superset generation: new users + new reviews
    ws = prepare_warm_start(bundle, df_b)

    assert ws.n_new_users > 0 and ws.n_new_items > 0
    assert ws.dims.n_users == bundle.dims.n_users + ws.n_new_users
    # old ids keep their exact rows
    for ext_id, row in list(bundle.preproc.user_id_mapping.items())[:20]:
        assert ws.preproc.user_id_mapping[ext_id] == row
    old_u = np.asarray(jax.device_get(bundle.params["user_embedding"]))
    assert np.array_equal(np.asarray(ws.params["user_embedding"])[: len(old_u)], old_u)
    # frozen preprocessing stats
    assert np.array_equal(ws.preproc.scaler.data_min, bundle.preproc.scaler.data_min)
    assert ws.preproc.cat_encoders == bundle.preproc.cat_encoders
    assert ws.preproc.medians == bundle.preproc.medians
    # tower copied verbatim
    assert np.array_equal(np.asarray(ws.params["final"]["kernel"]),
                          np.asarray(jax.device_get(bundle.params["final"]["kernel"])))


def _val_bce(params, bn, splits, cfg):
    import jax.numpy as jnp

    logits, _ = apply_dcn(
        params, bn, jnp.asarray(splits.val_user), jnp.asarray(splits.val_item),
        jnp.asarray(splits.val_cat), jnp.asarray(splits.val_num),
        cfg=cfg, train=False,
    )
    return float(bce_with_logits(logits, jnp.asarray(splits.val_y)))


def test_warm_init_beats_fresh_init(shipped):
    bundle = load_artifact_bundle(shipped)
    _, df_b = _frames()
    ws = prepare_warm_start(bundle, df_b)
    fresh_p, fresh_bn = init_dcn(jax.random.PRNGKey(0), ws.dims, bundle.model_cfg)
    warm = _val_bce(ws.params, ws.bn_state, ws.splits, bundle.model_cfg)
    fresh = _val_bce(fresh_p, fresh_bn, ws.splits, bundle.model_cfg)
    assert warm < fresh

    # and fine-tuning from it runs + improves on the warm start point
    res = train_dcn(ws.splits, ws.dims, bundle.model_cfg,
                    TrainConfig(batch_size=256, n_epochs=2, early_stop_patience=5),
                    init_state=(ws.params, ws.bn_state))
    assert np.isfinite(res.best_val_loss)
    assert res.best_val_loss <= warm + 1e-6


def test_warm_start_on_mesh_matches_single_device(shipped):
    """init_state composes with the mesh trainer: the host-side warm params
    re-place onto the run's shardings and the loss trajectory matches the
    single-device fine-tune (same rtol bound as test_parallel_full_run)."""
    from hhrs_tpu.parallel.mesh import mesh_from_spec

    bundle = load_artifact_bundle(shipped)
    _, df_b = _frames()
    ws = prepare_warm_start(bundle, df_b)
    tcfg = TrainConfig(batch_size=256, n_epochs=2, early_stop_patience=5)
    single = train_dcn(ws.splits, ws.dims, bundle.model_cfg, tcfg,
                       init_state=(ws.params, ws.bn_state))
    mesh = mesh_from_spec("4x2")
    sharded = train_dcn(ws.splits, ws.dims, bundle.model_cfg, tcfg, mesh=mesh,
                        init_state=(ws.params, ws.bn_state))
    for hs, hm in zip(single.history, sharded.history):
        assert hm["val_loss"] == pytest.approx(hs["val_loss"], rel=1e-4)


def test_warm_start_rejects_feature_layout_change(shipped):
    bundle = load_artifact_bundle(shipped)
    tampered = dataclasses.replace(
        bundle, dims=ModelDims(bundle.dims.n_users, bundle.dims.n_items,
                               (("city", 3),), bundle.dims.n_num_features)
    )
    with pytest.raises(ValueError, match="feature layout"):
        prepare_warm_start(tampered, _frames()[0])


def test_cli_init_from_end_to_end(tmp_path):
    from hhrs_tpu.train.cli import main

    data_a, data_b = str(tmp_path / "da"), str(tmp_path / "db")
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    base = ["--synthetic", "--epochs", "2", "train.batch_size=256",
            "model.emb_dim=8", "model.hidden_dim=32"]
    assert main(["--data", data_a, "--out", out_a,
                 "--synth-users", "120", "--synth-items", "50",
                 "--synth-reviews", "2000", *base]) == 0
    # refreshed, larger dataset; model.* overrides must be ignored in favor
    # of the artifact manifest
    assert main(["--data", data_b, "--out", out_b, "--init-from", out_a,
                 "--synth-users", "200", "--synth-items", "80",
                 "--synth-reviews", "3500", *base]) == 0

    man_a = json.loads(open(os.path.join(out_a, "manifest.json")).read())
    man_b = json.loads(open(os.path.join(out_b, "manifest.json")).read())
    assert man_b["model_dims"]["n_users"] > man_a["model_dims"]["n_users"]
    assert man_b["model_config"] == man_a["model_config"]
    # the fine-tuned artifact loads and its id map extends the old one
    b = load_artifact_bundle(out_b)
    a = load_artifact_bundle(out_a)
    for ext_id, row in list(a.preproc.user_id_mapping.items())[:10]:
        assert b.preproc.user_id_mapping[ext_id] == row


def test_cli_promote_gate_with_warm_start(tmp_path):
    """--init-from + --register-db --promote: the full retraining loop in
    one pipeline — the fine-tuned model passes the gate only if better."""
    from hhrs_tpu.db.registry import ModelRegistry
    from hhrs_tpu.train.cli import main

    db = str(tmp_path / "reg.sqlite")
    data_a = str(tmp_path / "da")
    base = ["--synthetic", "--epochs", "2", "train.batch_size=256",
            "model.emb_dim=8", "model.hidden_dim=32",
            "--register-db", db, "--promote"]
    assert main(["--data", data_a, "--out", str(tmp_path / "a"),
                 "--synth-users", "120", "--synth-items", "50",
                 "--synth-reviews", "2000", *base]) == 0
    reg = ModelRegistry(db)
    assert reg.active()["artifact_path"].endswith("a")

    # fine-tune on MORE data (same dir regenerated larger → richer train
    # set); with 2 extra epochs from the warm point it should win the gate,
    # but the contract under test is only: gate consulted, history grows.
    assert main(["--data", str(tmp_path / "db2"), "--out", str(tmp_path / "b"),
                 "--init-from", str(tmp_path / "a"),
                 "--synth-users", "200", "--synth-items", "80",
                 "--synth-reviews", "4000", *base]) == 0
    models = reg.list()
    assert len(models) == 2
    assert sum(m["is_active"] for m in models) == 1


def test_db_cli_promote_eval_data_gate(tmp_path):
    """promote --eval-data re-scores candidate AND incumbent on one fixed
    dataset (train/evaluate.py) and gates on those numbers: promoting the
    SAME artifacts twice (two dirs) must NOT displace the incumbent — the
    re-scored metrics tie exactly and a tie is not strictly better."""
    import shutil

    from hhrs_tpu.data.synthetic import write_synthetic_dataset
    from hhrs_tpu.db.cli import main as db_main
    from hhrs_tpu.db.registry import ModelRegistry

    out = tmp_path / "m1"
    df_a, _ = _frames()
    splits, art = Preprocessor().fit_transform(df_a)
    dims = ModelDims.from_artifacts(art)
    res = train_dcn(splits, dims, MCFG,
                    TrainConfig(batch_size=256, n_epochs=1, early_stop_patience=5))
    export_artifacts(str(out), res.params, res.bn_state, MCFG, dims, art,
                     res.final_metrics)
    twin = tmp_path / "m2"
    shutil.copytree(out, twin)

    eval_dir = tmp_path / "evalset"
    eval_dir.mkdir()
    write_synthetic_dataset(str(eval_dir), n_users=120, n_items=50,
                            n_reviews=1500, seed=3)

    db = str(tmp_path / "reg.sqlite")
    assert db_main(["promote", "--db", db, "--artifacts", str(out),
                    "--eval-data", str(eval_dir)]) == 0
    assert db_main(["promote", "--db", db, "--artifacts", str(twin),
                    "--eval-data", str(eval_dir)]) == 0
    reg = ModelRegistry(db)
    assert reg.active()["artifact_path"].endswith("m1")  # tie → incumbent stays
    models = {m["model_id"]: m for m in reg.list()}
    assert len(models) == 2
    # both rows carry the re-scored gate metric + eval-data provenance
    for m in models.values():
        assert "gate_logloss" in m["metrics"] and "gate_eval_data" in m["metrics"]
    assert (models[1]["metrics"]["gate_logloss"]
            == models[2]["metrics"]["gate_logloss"])
