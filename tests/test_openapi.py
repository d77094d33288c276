"""OpenAPI contract (VERDICT r3 item 7 — reference parity with FastAPI's
/docs + openapi.json, reference main.py:287-291).

The spec is generated from the SAME pydantic models the handlers validate
with (serve/openapi.py); these tests boot the real stdlib server and
validate actual endpoint responses — success AND error shapes — against
the published spec with jsonschema."""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import jsonschema
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data import Preprocessor, add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.serve.engine import RecommendationEngine
from hhrs_tpu.serve.http import make_handler
from hhrs_tpu.serve.openapi import build_openapi_spec
from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
from hhrs_tpu.train.trainer import train_dcn


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("openapi")
    ds = generate_synthetic_dataset(n_users=150, n_items=60, n_reviews=3000, seed=5)
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(noise_filter(main_df.copy()))
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=16, n_cross_layers=1, n_res_blocks=1)
    result = train_dcn(splits, dims, mcfg, TrainConfig(batch_size=256, n_epochs=1))
    out = str(tmp / "artifacts")
    export_artifacts(out, result.params, result.bn_state, mcfg, dims, art,
                     result.final_metrics)
    engine = RecommendationEngine(load_artifact_bundle(out), main_df, ds.friendships)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", main_df
    srv.shutdown()


@pytest.fixture(scope="module")
def spec(server):
    base, _ = server
    with urllib.request.urlopen(base + "/openapi.json") as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/json"
        served = json.loads(r.read())
    # the served document is exactly the generated one
    assert served == build_openapi_spec()
    return served


def _validate(spec, schema, instance):
    """jsonschema validation with $refs resolved against #/components."""
    full = dict(schema)
    full["$defs"] = {
        name: s for name, s in spec["components"]["schemas"].items()
    }
    # rewrite component refs to $defs for a self-contained schema
    text = json.dumps(full).replace("#/components/schemas/", "#/$defs/")
    jsonschema.validate(instance=instance, schema=json.loads(text))


def _response_schema(spec, path, method, code, ctype="application/json"):
    return spec["paths"][path][method]["responses"][str(code)]["content"][ctype]["schema"]


def _call(url, payload=None):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode() if payload is not None else None,
        headers={"Content-Type": "application/json"} if payload is not None else {},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_spec_is_structurally_sound(spec):
    assert spec["openapi"].startswith("3.1")
    assert set(spec["paths"]) == {
        "/recommendations", "/recommendations/batch", "/similar_items",
        "/healthz", "/metrics",
    }
    # every $ref in the document resolves
    comps = spec["components"]["schemas"]

    def walk(node):
        if isinstance(node, dict):
            if "$ref" in node:
                assert node["$ref"].split("/")[-1] in comps, node["$ref"]
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(spec["paths"])
    # the enforced batch cap is published, not just enforced (one source)
    batch_req = comps["BatchRecommendationRequest"]["properties"]["requests"]
    assert batch_req["maxItems"] == 64 and batch_req["minItems"] == 1


def test_recommendations_response_matches_schema(spec, server):
    base, main_df = server
    city = main_df["city"].iloc[0]
    user = int(main_df["user_id"].iloc[0])
    status, body = _call(base + "/recommendations",
                         {"user_id": user, "city": city, "type": "friends",
                          "lambda_param": 1.0})
    assert status == 200
    _validate(spec, _response_schema(spec, "/recommendations", "post", 200), body)

    # 422 error shape
    status, body = _call(base + "/recommendations", {"user_id": "not-an-int"})
    assert status == 422
    _validate(spec, _response_schema(spec, "/recommendations", "post", 422), body)


def test_batch_response_matches_schema(spec, server):
    base, main_df = server
    city = main_df["city"].iloc[0]
    reqs = [{"user_id": int(main_df["user_id"].iloc[i]), "city": city,
             "type": "personal", "lambda_param": 1.0} for i in range(2)]
    status, body = _call(base + "/recommendations/batch", {"requests": reqs})
    assert status == 200
    _validate(spec, _response_schema(spec, "/recommendations/batch", "post", 200), body)
    assert len(body["responses"]) == 2


def test_similar_items_matches_schema(spec, server):
    base, main_df = server
    item = int(main_df["item_id"].iloc[0])
    status, body = _call(base + f"/similar_items?item_id={item}&n=5")
    assert status == 200
    _validate(spec, _response_schema(spec, "/similar_items", "get", 200), body)

    status, body = _call(base + "/similar_items?item_id=99999999")
    assert status == 404
    _validate(spec, _response_schema(spec, "/similar_items", "get", 404), body)


def test_healthz_matches_schema(spec, server):
    base, _ = server
    status, body = _call(base + "/healthz")
    assert status == 200
    _validate(spec, _response_schema(spec, "/healthz", "get", 200), body)


def test_docs_page_is_self_contained(server):
    """/docs must render without ANY external asset (air-gapped parity with
    the reference's CDN-backed swagger page)."""
    base, _ = server
    with urllib.request.urlopen(base + "/docs") as r:
        assert r.status == 200
        html = r.read().decode()
    assert "Hybrid Recommendation API" in html
    assert "/openapi.json" in html  # explorer fetches the spec
    for marker in ("http://", "https://", "//cdn"):
        # no external fetches anywhere in the page
        assert marker not in html.replace("http://127.0.0.1", ""), marker
