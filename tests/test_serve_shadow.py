"""Shadow serving (serve/shadow.py): traffic mirrored to a candidate model
off the request path; agreement stats in /healthz + /metrics."""

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
from hhrs_tpu.serve.engine import RecommendationEngine
from hhrs_tpu.serve.http import make_handler
from hhrs_tpu.serve.shadow import ShadowEngine, overlap_metrics
from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
from hhrs_tpu.train.trainer import train_dcn


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    """Primary and shadow engines from two differently-trained models on
    the same dataset."""
    tmp = tmp_path_factory.mktemp("shadow")
    ds = generate_synthetic_dataset(n_users=200, n_items=90, n_reviews=5000, seed=13)
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(noise_filter(main_df.copy()))
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1)
    engs = []
    for epochs in (2, 1):  # different training -> models genuinely differ
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


def test_overlap_metrics():
    r = lambda ids: {"ranked_hotels": [{"hotel_id": i} for i in ids]}  # noqa: E731
    assert overlap_metrics(r([1, 2, 3]), r([1, 2, 3])) == (1.0, True)
    jac, top1 = overlap_metrics(r([1, 2, 3, 4]), r([3, 4, 5, 6]))
    assert jac == pytest.approx(2 / 6) and not top1
    assert overlap_metrics(r([]), r([])) == (1.0, True)
    assert overlap_metrics(r([1]), r([])) == (0.0, False)


def test_shadow_engine_compares_off_path(engines):
    primary, shadow, main_df = engines
    se = ShadowEngine(primary, shadow)
    user = int(main_df["user_id"].iloc[0])
    city = main_df["city"].iloc[0]

    direct = primary.recommend(user, city, "friends", 0.7)
    via = se.recommend(user, city, "friends", 0.7)
    assert via == direct  # responses come from the primary, verbatim

    se.recommend_many([(user, city, "personal", 1.0)])
    assert se.drain()
    stats = se.shadow_stats()
    assert stats["compared"] == 2
    assert stats["errors"] == 0
    assert 0.0 <= stats["mean_overlap"] <= 1.0
    assert stats["shadow_model"].endswith("art_1")
    # delegation: the wrapper still exposes the primary's surface
    assert se.latency is primary.latency
    assert se.similar_items(10**9, 5) is None  # unknown item passthrough


def test_shadow_errors_do_not_affect_serving(engines):
    primary, _, main_df = engines

    class Exploding:
        artifacts_dir = "boom"

        def recommend(self, *a):
            raise RuntimeError("shadow boom")

    se = ShadowEngine(primary, Exploding())
    user = int(main_df["user_id"].iloc[0])
    city = main_df["city"].iloc[0]
    res = se.recommend(user, city, "friends", 0.7)
    assert "ranked_hotels" in res
    assert se.drain()
    stats = se.shadow_stats()
    assert stats["errors"] == 1 and stats["compared"] == 0


def test_shadow_stats_in_http_surface(engines):
    primary, shadow, main_df = engines
    se = ShadowEngine(primary, shadow)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(se))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    try:
        user = int(main_df["user_id"].iloc[0])
        city = main_df["city"].iloc[0]
        body = json.dumps({"user_id": user, "city": city, "type": "friends",
                           "lambda_param": 0.7}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommendations", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        assert se.drain()
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["shadow"]["compared"] == 1
        assert health["shadow"]["shadow_model"].endswith("art_1")
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            metrics = r.read().decode()
        assert "hhrs_shadow_compared_total 1" in metrics
        assert "hhrs_shadow_mean_overlap" in metrics
    finally:
        server.shutdown()
        server.server_close()
