"""Canary serving (serve/canary.py): a sticky user-hash slice of live
traffic answered by a candidate model on the request path; per-arm stats
in /healthz + /metrics; canary failures fall back to the primary."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data import Preprocessor, add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.serve.canary import CanaryEngine, routes_to_canary
from hhrs_tpu.serve.engine import RecommendationEngine
from hhrs_tpu.serve.http import make_handler
from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
from hhrs_tpu.train.trainer import train_dcn


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    """Primary and canary engines from two differently-trained models on
    the same dataset (same fixture shape as test_serve_shadow)."""
    tmp = tmp_path_factory.mktemp("canary")
    ds = generate_synthetic_dataset(n_users=200, n_items=90, n_reviews=5000, seed=13)
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(noise_filter(main_df.copy()))
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1)
    engs = []
    for epochs in (2, 1):
        res = train_dcn(splits, dims, mcfg, TrainConfig(lr=3e-3, batch_size=512,
                                                        n_epochs=epochs))
        out = str(tmp / f"art_{epochs}")
        export_artifacts(out, res.params, res.bn_state, mcfg, dims, art,
                         res.final_metrics)
        bundle = load_artifact_bundle(out)
        eng = RecommendationEngine(bundle, main_df, ds.friendships)
        eng.artifacts_dir = out
        engs.append(eng)
    return engs[0], engs[1], main_df


def split_users(main_df, fraction):
    """Dataset users partitioned by arm at the given fraction."""
    users = sorted({int(u) for u in main_df["user_id"]})
    canary = [u for u in users if routes_to_canary(u, fraction)]
    primary = [u for u in users if not routes_to_canary(u, fraction)]
    return primary, canary


def test_routing_is_sticky_and_proportional():
    ids = range(20_000)
    frac = sum(routes_to_canary(u, 0.1) for u in ids) / 20_000
    assert 0.08 < frac < 0.12  # crc32 is uniform enough at this scale
    # deterministic: same answer on every call, and monotone in fraction
    assert all(routes_to_canary(7, 0.3) == routes_to_canary(7, 0.3)
               for _ in range(3))
    assert all(routes_to_canary(u, 1.0) for u in range(100))
    assert not any(routes_to_canary(u, 1e-12) for u in range(100))


def test_fraction_validation(engines):
    primary, canary, _ = engines
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            CanaryEngine(primary, canary, bad)


def test_canary_answers_its_slice(engines):
    primary, canary, main_df = engines
    ce = CanaryEngine(primary, canary, 0.5)
    city = main_df["city"].iloc[0]
    primary_users, canary_users = split_users(main_df, 0.5)
    assert primary_users and canary_users  # 200 users: both arms populated

    pu, cu = primary_users[0], canary_users[0]
    assert ce.recommend(pu, city, "friends", 0.7) == \
        primary.recommend(pu, city, "friends", 0.7)
    assert ce.recommend(cu, city, "friends", 0.7) == \
        canary.recommend(cu, city, "friends", 0.7)
    stats = ce.canary_stats()
    assert stats["primary_served"] == 1 and stats["canary_served"] == 1
    assert stats["errors"] == 0
    assert stats["canary_model"].endswith("art_1")
    assert "canary_latency" in stats
    # delegation: the wrapper still exposes the primary's surface
    assert ce.latency is primary.latency
    assert ce.similar_items(10**9, 5) is None


def test_recommend_many_splits_and_reassembles(engines):
    primary, canary, main_df = engines
    ce = CanaryEngine(primary, canary, 0.5)
    city = main_df["city"].iloc[0]
    primary_users, canary_users = split_users(main_df, 0.5)
    reqs = [(primary_users[0], city, "friends", 0.7),
            (canary_users[0], city, "friends", 0.7),
            (primary_users[1], city, "personal", 1.0),
            (canary_users[1], city, "personal", 1.0)]
    out = ce.recommend_many(reqs, pad_to=8)
    direct = [primary.recommend(*reqs[0]), canary.recommend(*reqs[1]),
              primary.recommend(*reqs[2]), canary.recommend(*reqs[3])]
    assert out == direct
    stats = ce.canary_stats()
    assert stats["primary_served"] == 2 and stats["canary_served"] == 2

    # an all-primary batch takes the no-split fast path
    out2 = ce.recommend_many([reqs[0], reqs[2]], pad_to=8)
    assert out2 == [direct[0], direct[2]]
    assert ce.canary_stats()["primary_served"] == 4


def test_canary_errors_fall_back_to_primary(engines):
    primary, _, main_df = engines

    class Exploding:
        artifacts_dir = "boom"

        def recommend(self, *a):
            raise RuntimeError("canary boom")

        def recommend_many(self, requests, pad_to=None):
            raise RuntimeError("canary boom")

    ce = CanaryEngine(primary, Exploding(), 1.0)  # every request routes there
    city = main_df["city"].iloc[0]
    user = int(main_df["user_id"].iloc[0])
    res = ce.recommend(user, city, "friends", 0.7)
    assert res == primary.recommend(user, city, "friends", 0.7)
    out = ce.recommend_many([(user, city, "personal", 1.0)])
    assert out == [primary.recommend(user, city, "personal", 1.0)]
    stats = ce.canary_stats()
    assert stats["errors"] == 2
    assert stats["canary_served"] == 0
    # fallback requests are counted as primary-served
    assert stats["primary_served"] == 2


def test_canary_stats_in_http_surface(engines):
    primary, canary, main_df = engines
    ce = CanaryEngine(primary, canary, 0.5)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(ce))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    try:
        city = main_df["city"].iloc[0]
        primary_users, canary_users = split_users(main_df, 0.5)
        for user in (primary_users[0], canary_users[0]):
            body = json.dumps({"user_id": user, "city": city, "type": "friends",
                               "lambda_param": 0.7}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/recommendations", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                assert r.status == 200
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["canary"]["primary_served"] == 1
        assert health["canary"]["canary_served"] == 1
        assert health["canary"]["fraction"] == 0.5
        assert health["canary"]["canary_model"].endswith("art_1")
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            metrics = r.read().decode()
        assert 'hhrs_canary_requests_total{arm="canary"} 1' in metrics
        assert 'hhrs_canary_requests_total{arm="primary"} 1' in metrics
        assert "hhrs_canary_fraction 0.5" in metrics
        assert "hhrs_canary_errors_total 0" in metrics
    finally:
        server.shutdown()
        server.server_close()


def test_salt_rotates_the_slice():
    """A per-rollout salt must change WHICH users route to the canary while
    staying deterministic (ADVICE r3: the unsalted slice is the same fixed
    user population for every rollout)."""
    users = range(5000)
    unsalted = {u for u in users if routes_to_canary(u, 0.2)}
    salted = {u for u in users if routes_to_canary(u, 0.2, salt="release-2")}
    assert unsalted != salted  # slice rotated
    # determinism + roughly proportional in both cases
    assert salted == {u for u in users if routes_to_canary(u, 0.2, salt="release-2")}
    assert 0.15 < len(salted) / 5000 < 0.25


def test_half_constructed_instance_raises_attribute_error_not_recursion():
    """fraction=0 raises in __init__ — attribute access on the partially
    constructed instance (repr, pickle) must not recurse through
    __getattr__ (ADVICE r3)."""

    class Obj:
        pass

    eng = CanaryEngine.__new__(CanaryEngine)  # nothing assigned at all
    with pytest.raises(AttributeError):
        eng._primary  # noqa: B018
    with pytest.raises(AttributeError):
        # public attr on a half-constructed instance: __getattr__ looks up
        # self._primary, which must itself raise AttributeError (private),
        # not recurse
        eng.latency  # noqa: B018

    with pytest.raises(ValueError):
        CanaryEngine(Obj(), Obj(), 0.0)
