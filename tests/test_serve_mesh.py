"""Mesh-mode serving parity (VERDICT round-1 item 3): the engine with the
item axis sharded over an 8-device mesh must return responses IDENTICAL to
the single-device engine — friends/personal × λ∈{0.6, 1.0}, including the
popularity fallback and empty-candidate cases.

Exactness is expected, not just closeness: sharding the item (row) axis
never changes any per-row reduction order, so logits, argsort order, and
MMR picks are bit-equal."""

import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data import Preprocessor, add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.parallel.mesh import make_mesh
from hhrs_tpu.serve.engine import RecommendationEngine
from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
from hhrs_tpu.train.trainer import train_dcn


@pytest.fixture(scope="module")
def engines(tmp_path_factory, request):
    if len(__import__("jax").devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tmp = tmp_path_factory.mktemp("serve_mesh")
    # 121 items → pads to 128 on an 8-device mesh (exercises the padding)
    ds = generate_synthetic_dataset(n_users=220, n_items=121, n_reviews=6000, seed=33)
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(noise_filter(main_df.copy()))
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1, dropout=0.2)
    result = train_dcn(splits, dims, mcfg, TrainConfig(lr=3e-3, batch_size=512, n_epochs=2))
    out = str(tmp / "artifacts")
    export_artifacts(out, result.params, result.bn_state, mcfg, dims, art,
                     result.final_metrics)
    bundle = load_artifact_bundle(out)
    single = RecommendationEngine(bundle, main_df, ds.friendships)
    mesh = make_mesh(4, 2)
    meshed = RecommendationEngine(bundle, main_df, ds.friendships, mesh=mesh)
    return single, meshed, (bundle, main_df, ds.friendships, mesh)


@pytest.mark.parametrize("mode,lam", [
    ("friends", 1.0), ("friends", 0.6), ("personal", 1.0), ("personal", 0.6),
])
def test_mesh_engine_identical_responses(engines, mode, lam):
    single, meshed, _setup = engines
    uni = single.gen.universe
    users = [int(u) for u in uni.user_ids[:8]]
    cities = uni.cities[:2]
    checked = 0
    for u in users:
        for city in cities:
            a = single.recommend(u, city, mode, lam)
            b = meshed.recommend(u, city, mode, lam)
            assert a == b, (u, city, mode, lam)
            checked += 1
    assert checked == len(users) * len(cities)


def test_mesh_disables_cap_and_city_bounding(engines):
    """Under a mesh, candidate_cap and city_bounded both auto-disable —
    arbitrary-row gathers from row-sharded feature arrays would insert
    collectives into every request; the row-sharded full-universe program
    is the mesh fast path. Responses stay identical regardless."""
    single, _meshed, (bundle, main_df, friendships, mesh) = engines
    eng = RecommendationEngine(bundle, main_df, friendships, mesh=mesh,
                               candidate_cap=16, city_bounded=True)
    assert eng._cap == 0 and not eng._city_bounded
    uni = single.gen.universe
    u = int(uni.user_ids[0])
    assert eng.recommend(u, uni.cities[0], "friends", 0.7) == \
        single.recommend(u, uni.cities[0], "friends", 0.7)


def test_mesh_engine_edge_cases(engines):
    single, meshed, _setup = engines
    uni = single.gen.universe
    # unknown city → empty candidates → message response, both engines
    a = single.recommend(int(uni.user_ids[0]), "Nowhere-City", "friends", 0.7)
    b = meshed.recommend(int(uni.user_ids[0]), "Nowhere-City", "friends", 0.7)
    assert a == b and a["ranked_hotels"] == [] and "message" in a
    # unknown user (cold start → n_users//2 fallback id) identical too
    a = single.recommend(999_999_999, uni.cities[0], "friends", 0.6)
    b = meshed.recommend(999_999_999, uni.cities[0], "friends", 0.6)
    assert a == b
    # friendless user in friends mode → popularity fallback path
    friendless = None
    for u in uni.user_ids:
        if len(single.graph.friends_of(int(u))) == 0:
            friendless = int(u)
            break
    if friendless is not None:
        a = single.recommend(friendless, uni.cities[0], "friends", 1.0)
        b = meshed.recommend(friendless, uni.cities[0], "friends", 1.0)
        assert a == b


def test_mesh_engine_batched_requests(engines):
    single, meshed, _setup = engines
    uni = single.gen.universe
    reqs = [
        (int(uni.user_ids[i]), uni.cities[i % len(uni.cities)],
         ("friends" if i % 2 else "personal"), (0.6 if i % 3 else 1.0))
        for i in range(5)
    ]
    a = single.recommend_many(reqs)
    b = meshed.recommend_many(reqs)
    assert a == b


def test_mesh_similar_items_identical(engines):
    """/similar_items via the sharded per-shard-top-k + merge == the
    single-device brute-force path, including the padded-table mask."""
    single, meshed, _setup = engines
    art = single.bundle.preproc
    some_items = list(art.item_id_mapping.keys())[:10]
    for ext in some_items:
        for n in (1, 5, 16):
            assert single.similar_items(ext, n) == meshed.similar_items(ext, n), (ext, n)
    assert meshed.similar_items(999_999_999) is None  # unknown → 404 upstream


@pytest.mark.slow
def test_serve_cli_mesh_boot(tmp_path):
    """`serve.cli --mesh 4x2` boots on the 8-device virtual mesh and answers
    the REST contract (CLI wiring for mesh serving)."""
    import json as json_mod
    import subprocess
    import sys
    import time
    import urllib.request

    env = {
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PYTHONPATH": "/root/repo",
    }
    data_dir = str(tmp_path / "data")
    art_dir = str(tmp_path / "artifacts")
    r = subprocess.run(
        [sys.executable, "-m", "hhrs_tpu.train.cli", "--synthetic",
         "--data", data_dir, "--out", art_dir,
         "--synth-users", "120", "--synth-items", "50", "--synth-reviews", "1500",
         "--epochs", "1", "train.batch_size=256", "train.eval_batch_size=512"],
        capture_output=True, text=True, timeout=420, env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]

    import socket

    s = socket.socket(); s.bind(("127.0.0.1", 0)); port = s.getsockname()[1]; s.close()
    proc = subprocess.Popen(
        [sys.executable, "-m", "hhrs_tpu.serve.cli", "--artifacts", art_dir,
         "--data", data_dir, "--port", str(port), "--mesh", "4x2"],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
        env=env, cwd="/root/repo",
    )
    try:
        deadline = time.time() + 300
        health = None
        while time.time() < deadline and proc.poll() is None:
            try:
                health = urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5).read().decode()
                break
            except OSError:
                time.sleep(0.5)
        assert proc.poll() is None, proc.stderr.read()[-2000:]
        assert health and "ok" in health
        body = json_mod.dumps({"user_id": 1, "city": "Sochi", "type": "friends",
                               "lambda_param": 1.0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommendations", data=body,
            headers={"content-type": "application/json"})
        resp = json_mod.loads(urllib.request.urlopen(req, timeout=60).read().decode())
        assert "ranked_hotels" in resp
    finally:
        proc.kill()
        proc.wait(timeout=20)


def test_mesh_candidate_mask_matches(engines):
    """Stage-1 alone: the generator's mask agrees with the unsharded one."""
    single, meshed, _setup = engines
    uni = single.gen.universe
    for u in uni.user_ids[:5]:
        for mode in ("friends", "personal"):
            ca, na = single.gen.generate(int(u), uni.cities[0], mode, single.graph)
            cb, nb = meshed.gen.generate(int(u), uni.cities[0], mode, meshed.graph)
            np.testing.assert_array_equal(ca, cb)
            assert na == nb


def test_mesh_quantized_tables_identical_to_single_quantized(engines):
    """--quantize-tables composes with --mesh: the QuantizedTable pytree
    device_puts under the replicated NamedSharding, and (as with f32)
    row-sharding the item axis changes no per-row reduction, so the
    quantized mesh engine is bit-identical to the quantized single-device
    engine."""
    _single, _meshed, (bundle, main_df, friendships, mesh) = engines
    q_single = RecommendationEngine(bundle, main_df, friendships, quantize_tables=True)
    q_meshed = RecommendationEngine(bundle, main_df, friendships, mesh=mesh,
                                    quantize_tables=True)
    uni = q_single.gen.universe
    checked = 0
    for u in [int(x) for x in uni.user_ids[:6]]:
        for city in uni.cities[:2]:
            for lam in (1.0, 0.6):
                a = q_single.recommend(u, city, "friends", lam)
                b = q_meshed.recommend(u, city, "friends", lam)
                assert a == b, (u, city, lam)
                checked += len(a.get("ranked_hotels", []))
    assert checked > 0


def test_mesh_engine_data_hot_reload(engines, tmp_path):
    """Mesh serving composes with the data hot reload: a data drop rebuilds
    the MESH engine through the same DataReloader path the CLI wires, the
    refreshed universe serves, and responses still equal a fresh
    single-device engine over the same data."""
    import os

    from hhrs_tpu.data.ingest import load_friendships_csv, load_reviews_csv
    from hhrs_tpu.data.synthetic import append_reviews, write_synthetic_dataset
    from hhrs_tpu.serve.reload import DataReloader, SwappableEngine

    _, _, (bundle, _, _, mesh) = engines
    data_dir = str(tmp_path / "mesh_reload_data")
    ds = write_synthetic_dataset(data_dir, n_users=220, n_items=121,
                                 n_reviews=6000, seed=33)

    def frames(d):
        df = add_engineered_features(load_reviews_csv(
            os.path.join(d, "hackathon_augmented_data.csv")))
        return df, load_friendships_csv(os.path.join(d, "friendships.csv"))

    def build(adir, fr=None):
        fr = fr if fr is not None else frames(data_dir)
        return RecommendationEngine(bundle, fr[0], fr[1], mesh=mesh)

    holder = SwappableEngine(build(None))
    dr = DataReloader(holder, data_dir, build, poll_s=3600,
                      current_dir_fn=lambda: "unused",
                      frames_loader=frames)

    new_user = 31_000_001
    append_reviews(data_dir, new_user, n=3, rating=9)
    assert dr.check_once() is False  # debounce
    assert dr.check_once() is True   # mesh rebuild + swap
    assert new_user in set(int(u) for u in holder.gen.universe.user_ids)

    fr = frames(data_dir)  # same refreshed data, no mesh sharding
    fresh_single = RecommendationEngine(bundle, fr[0], fr[1])
    uni = holder.gen.universe
    for city in uni.cities[:2]:
        a = holder.recommend(new_user, city, "personal", 1.0)
        b = fresh_single.recommend(new_user, city, "personal", 1.0)
        assert a == b
