"""Two-tower learned retriever (retrieval/two_tower.py) — a second model
family beyond the reference, opt-in end to end.

The reference's candidate expansion reuses the RANKER's item table through
a kNN index (main.py:268-270); the two-tower model trains retrieval
vectors for the retrieval task itself (in-batch sampled softmax with the
logQ popularity correction) and substitutes them into the serve similarity
surfaces only under --retrieval-embeddings."""

import dataclasses

import jax
import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data import Preprocessor, add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.retrieval.two_tower import (
    TwoTowerConfig,
    catalog_recall,
    export_retrieval_embeddings,
    in_batch_softmax_loss,
    init_two_tower,
    train_two_tower,
)


@pytest.fixture(scope="module")
def dataset():
    ds = generate_synthetic_dataset(n_users=800, n_items=900,
                                    n_reviews=40_000, seed=7)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id",
                                   "hotel_id": "item_id"})))
    splits, art = Preprocessor().fit_transform(df)
    return ds, df, splits, art, ModelDims.from_artifacts(art)


@pytest.fixture(scope="module")
def trained(dataset):
    _, _, splits, _, dims = dataset
    cfg = TwoTowerConfig(n_epochs=25, batch_size=512)
    return cfg, train_two_tower(splits, dims, cfg)


def test_training_learns_and_beats_untrained_retrieval(dataset, trained):
    _, _, splits, _, dims = dataset
    cfg, r = trained
    losses = [h["train_loss"] for h in r.history]
    assert losses[-1] < losses[0] - 0.3  # real optimization, not noise
    assert np.isfinite(losses).all()

    chance = 100 / dims.n_items
    untrained = catalog_recall(
        init_two_tower(jax.random.PRNGKey(0), dims, cfg), splits)
    assert r.final_recall_at_100 > chance  # better than random retrieval
    # the logQ-corrected objective must not DEGRADE retrieval below the
    # untrained towers (the uncorrected in-batch softmax measurably did)
    assert r.final_recall_at_100 >= untrained * 0.95


def test_duplicate_items_in_batch_are_masked(dataset):
    _, _, splits, _, dims = dataset
    cfg = TwoTowerConfig()
    params = init_two_tower(jax.random.PRNGKey(1), dims, cfg)
    batch = {
        "user": np.asarray(splits.train_user[:64], np.int32),
        "item": np.zeros(64, np.int32),  # ALL duplicates of one item
        "cat": np.asarray(splits.train_cat[:64], np.int32),
        "num": np.asarray(splits.train_num[:64], np.float32),
    }
    loss = float(in_batch_softmax_loss(params, jax.tree.map(np.asarray, batch),
                                       cfg.temperature))
    # every negative is a false negative and masked → loss is exactly 0
    # (softmax over the positive alone), crucially finite — no -inf/nan
    assert np.isfinite(loss) and loss == pytest.approx(0.0, abs=1e-5)


def test_export_covers_every_internal_item_normalized(dataset, trained, tmp_path):
    _, _, splits, _, dims = dataset
    _, r = trained
    path = export_retrieval_embeddings(str(tmp_path), r.params, splits, dims)
    V = np.load(path)
    assert V.shape[0] == dims.n_items
    norms = np.linalg.norm(V, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)  # L2-normalized rows


def test_engine_substitution_drives_similarity_surfaces(dataset, tmp_path):
    """Crafted orthogonal-group retrieval vectors → /similar_items must
    return exactly the same-group items, proving the substituted vectors
    (not the ranker's) drive the similarity index; the ranking model and
    response contract stay intact; shape mismatch fails fast."""
    from hhrs_tpu.serve.engine import RecommendationEngine
    from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
    from hhrs_tpu.train.trainer import train_dcn

    ds, df, splits, art, dims = dataset
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1,
                       n_res_blocks=1, dropout=0.2)
    res = train_dcn(splits, dims, mcfg,
                    TrainConfig(lr=3e-3, batch_size=512, n_epochs=1))
    out = str(tmp_path / "rank_art")
    export_artifacts(out, res.params, res.bn_state, mcfg, dims, art,
                     res.final_metrics)
    bundle = load_artifact_bundle(out)

    # groups of 4 by internal id; within-group vectors identical+orthogonal
    # to other groups → nearest neighbors are exactly the group mates
    rng = np.random.default_rng(0)
    D = 64
    group_vecs = rng.normal(size=(dims.n_items // 4 + 1, D)).astype(np.float32)
    V = group_vecs[np.arange(dims.n_items) // 4]
    V /= np.linalg.norm(V, axis=1, keepdims=True)

    eng = RecommendationEngine(bundle, df, ds.friendships,
                               retrieval_embeddings=V)
    inv = {v: k for k, v in art.item_id_mapping.items()}
    internal = 8  # group {8, 9, 10, 11}
    got = eng.similar_items(inv[internal], 3)
    assert set(got) == {inv[9], inv[10], inv[11]}

    # the full request path still serves over the substituted vectors
    uni = eng.gen.universe
    out_rec = eng.recommend(int(uni.user_ids[0]), uni.cities[0], "friends", 0.7)
    assert "ranked_hotels" in out_rec

    with pytest.raises(ValueError, match="retrieval_embeddings rows"):
        RecommendationEngine(bundle, df, ds.friendships,
                             retrieval_embeddings=V[:-1])


def test_cli_export_then_serve_flag(tmp_path):
    """The documented workflow: module CLI trains + exports, the engine
    loads the file through from_dirs(retrieval_embeddings_path=...)."""
    import subprocess
    import sys
    import os

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = str(tmp_path / "d")
    out = str(tmp_path / "o")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.update({"JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1"})
    r = subprocess.run(
        [sys.executable, "-m", "hhrs_tpu.retrieval.two_tower", "--synthetic",
         "--data", data, "--out", out, "--epochs", "2",
         "--synth-users", "200", "--synth-items", "80",
         "--synth-reviews", "4000"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]
    V = np.load(os.path.join(out, "retrieval_embeddings.npy"))
    # one row per INTERNAL item id (the noise filter may drop raw items)
    assert 0 < V.shape[0] <= 80
    np.testing.assert_allclose(np.linalg.norm(V, axis=1), 1.0, atol=1e-4)
