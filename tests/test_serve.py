"""Serve-path tests: full two-stage pipeline vs an independent oracle, plus
the REST contract driven over a real HTTP socket.
"""

import json
import threading
import time
import urllib.request
import urllib.error
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data import add_engineered_features, Preprocessor
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.preprocess import encode_items_for_ranking
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims, apply_dcn
from hhrs_tpu.serve.engine import RecommendationEngine
from hhrs_tpu.serve.http import make_handler
from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
from hhrs_tpu.train.trainer import train_dcn

from tests.test_retrieval import oracle_candidates, oracle_mmr


@pytest.fixture(scope="module")
def engine_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    ds = generate_synthetic_dataset(n_users=250, n_items=120, n_reviews=7000, seed=21)
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    filtered = noise_filter(main_df.copy())
    splits, art = Preprocessor().fit_transform(filtered)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1, dropout=0.2)
    tcfg = TrainConfig(lr=3e-3, batch_size=512, n_epochs=3)
    result = train_dcn(splits, dims, mcfg, tcfg)
    out = str(tmp / "artifacts")
    export_artifacts(out, result.params, result.bn_state, mcfg, dims, art, result.final_metrics)
    bundle = load_artifact_bundle(out)
    engine = RecommendationEngine(bundle, main_df, ds.friendships)
    return engine, main_df, ds.friendships, bundle


def _oracle_recommend(engine, main_df, friendships, bundle, user_id, city, mode, lam):
    """Independent recomputation of the full reference pipeline."""
    art = bundle.preproc
    cand = oracle_candidates(
        main_df, friendships, art.item_id_mapping, bundle.item_embeddings, user_id, city, mode
    )
    if not cand:
        return []
    items_df = main_df[main_df["item_id"].isin(list(cand))].drop_duplicates(subset=["item_id"])
    users, items, cats, nums = encode_items_for_ranking(art, items_df, user_id)
    logits, _ = apply_dcn(
        bundle.params,
        bundle.bn_state,
        jnp.asarray(users),
        jnp.asarray(items),
        jnp.asarray(cats),
        jnp.asarray(nums),
        cfg=bundle.model_cfg,
        train=False,
    )
    scores = np.asarray(logits, np.float64)
    ext_ids = items_df["item_id"].to_numpy()
    order = np.argsort(-scores, kind="stable")
    if lam < 1.0:
        score_by_item = {int(ext_ids[i]): float(scores[i]) for i in range(len(ext_ids))}
        emb_by_item = {}
        for i, ext in enumerate(ext_ids):
            ti = art.item_id_mapping.get(int(ext))
            if ti is not None:
                emb_by_item[int(ext)] = bundle.item_embeddings[ti]
        return oracle_mmr(score_by_item, emb_by_item, lam)
    return [int(ext_ids[i]) for i in order]


@pytest.mark.parametrize("mode,lam", [("friends", 1.0), ("friends", 0.5), ("personal", 1.0), ("personal", 0.3)])
def test_two_stage_pipeline_matches_oracle(engine_setup, mode, lam):
    engine, main_df, friendships, bundle = engine_setup
    uni = engine.gen.universe
    checked = 0
    for user in uni.user_ids[:5]:
        for city in uni.cities[:2]:
            expected = _oracle_recommend(
                engine, main_df, friendships, bundle, int(user), city, mode, lam
            )
            got = engine.recommend(int(user), city, mode, lam)
            got_ids = [h["hotel_id"] for h in got["ranked_hotels"]]
            assert got_ids == expected, (user, city, mode, lam)
            checked += 1
    assert checked == 10


def test_recommended_by_lists_friends(engine_setup):
    engine, main_df, friendships, bundle = engine_setup
    uni = engine.gen.universe
    user = int(uni.user_ids[0])
    friends = set(engine.graph.friends_of(user).tolist())
    res = engine.recommend(user, uni.cities[0], "friends", 1.0)
    for h in res["ranked_hotels"]:
        for rec_user in h["recommended_by"]:
            assert rec_user in friends
            rows = main_df[
                (main_df["user_id"] == rec_user)
                & (main_df["item_id"] == h["hotel_id"])
                & (main_df["rating_overall"] >= 8)
            ]
            assert len(rows) > 0


def test_empty_candidates_message(engine_setup):
    engine, *_ = engine_setup
    res = engine.recommend(1, "Atlantis", "friends", 0.7)
    assert res == {"ranked_hotels": [], "message": "No suitable candidates found."}


def test_similar_items_contract(engine_setup):
    engine, main_df, _, bundle = engine_setup
    art = bundle.preproc
    some_item = next(iter(art.item_id_mapping))
    ids = engine.similar_items(some_item, 5)
    assert len(ids) == 5
    assert some_item not in ids  # self dropped
    assert engine.similar_items(10**9, 5) is None  # unknown → None → 404


@pytest.fixture(scope="module")
def http_server(engine_setup):
    engine, *_ = engine_setup
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_recommendations(http_server, engine_setup):
    engine, *_ = engine_setup
    uni = engine.gen.universe
    status, body = _post(
        http_server + "/recommendations",
        {"user_id": int(uni.user_ids[0]), "city": uni.cities[0], "type": "friends", "lambda_param": 0.7},
    )
    assert status == 200
    assert "ranked_hotels" in body
    if body["ranked_hotels"]:
        h = body["ranked_hotels"][0]
        assert set(h) == {"hotel_id", "city", "price_rub", "stars", "recommended_by"}


def test_http_validation_errors(http_server):
    status, body = _post(http_server + "/recommendations", {"user_id": 1, "city": "X", "lambda_param": 2.0})
    assert status == 422
    status, _ = _post(http_server + "/recommendations", {"city": "X"})
    assert status == 422


def test_http_method_not_allowed(http_server):
    """FastAPI-contract parity: known routes hit with the wrong method
    answer 405, unknown paths 404."""
    status, _ = _get(http_server + "/recommendations")
    assert status == 405
    status, _ = _get(http_server + "/recommendations/batch")
    assert status == 405
    status, _ = _post(http_server + "/similar_items", {})
    assert status == 405
    status, _ = _post(http_server + "/healthz", {})
    assert status == 405
    status, _ = _get(http_server + "/nope")
    assert status == 404
    status, _ = _post(http_server + "/nope", {})
    assert status == 404


def test_http_similar_items(http_server, engine_setup):
    engine, _, _, bundle = engine_setup
    some_item = next(iter(bundle.preproc.item_id_mapping))
    status, body = _get(http_server + f"/similar_items?item_id={some_item}&n=3")
    assert status == 200 and len(body["similar_item_ids"]) == 3
    status, body = _get(http_server + "/similar_items?item_id=999999999&n=3")
    assert status == 404
    status, body = _get(http_server + f"/similar_items?item_id={some_item}&n=99")
    assert status == 422
    status, body = _get(http_server + "/similar_items")
    assert status == 422


def test_http_healthz_and_docs(http_server):
    status, body = _get(http_server + "/healthz")
    assert status == 200 and body["status"] == "ok"
    with urllib.request.urlopen(http_server + "/docs") as r:
        assert r.status == 200 and b"Hybrid Recommendation API" in r.read()


def test_http_concurrent_requests(http_server, engine_setup):
    """16 concurrent clients over the threaded server: all succeed, and
    identical requests return identical rankings (the shared jitted engine
    is safe under concurrent dispatch)."""
    from concurrent.futures import ThreadPoolExecutor

    engine, *_ = engine_setup
    uni = engine.gen.universe
    payload = {"user_id": int(uni.user_ids[0]), "city": uni.cities[0],
               "type": "friends", "lambda_param": 0.7}

    def hit(i):
        for attempt in range(3):  # transient socket resets under load
            try:
                if i % 4 == 3:
                    return _get(http_server + f"/similar_items?item_id={int(uni.item_ids[0])}&n=5")
                return _post(http_server + "/recommendations", payload)
            except (ConnectionResetError, ConnectionRefusedError):
                if attempt == 2:
                    raise
                time.sleep(0.1)

    with ThreadPoolExecutor(max_workers=16) as ex:
        results = list(ex.map(hit, range(32)))

    assert all(status == 200 for status, _ in results)
    rec_bodies = [b for i, (s, b) in enumerate(results) if i % 4 != 3]
    first = [h["hotel_id"] for h in rec_bodies[0]["ranked_hotels"]]
    for b in rec_bodies[1:]:
        assert [h["hotel_id"] for h in b["ranked_hotels"]] == first


def test_http_batch_endpoint(http_server, engine_setup):
    engine, *_ = engine_setup
    uni = engine.gen.universe
    reqs = [
        {"user_id": int(uni.user_ids[i]), "city": uni.cities[i % len(uni.cities)],
         "type": "friends", "lambda_param": 0.7}
        for i in range(3)
    ]
    status, body = _post(http_server + "/recommendations/batch", {"requests": reqs})
    assert status == 200
    assert len(body["responses"]) == 3
    # identical to the single-request endpoint
    for r, got in zip(reqs, body["responses"]):
        s2, single = _post(http_server + "/recommendations", r)
        assert s2 == 200 and got == single

    status, _ = _post(http_server + "/recommendations/batch", {"requests": []})
    assert status == 422
    status, _ = _post(http_server + "/recommendations/batch", {"requests": [{"user_id": "x"}]})
    assert status == 422


def test_engine_with_empty_friendships(engine_setup):
    """No friendship rows at all: 'personal' mode works, and 'friends'
    mode serves the city popularity fallback (reference main.py:204-207 —
    zero candidates triggers the top-100 pool) with empty recommended_by."""
    engine, main_df, _friendships, bundle = engine_setup
    empty = pd.DataFrame({"user_id_1": [], "user_id_2": []})
    eng = RecommendationEngine(bundle, main_df, empty)
    uni = eng.gen.universe
    user, city = int(uni.user_ids[0]), uni.cities[0]
    res_p = eng.recommend(user, city, "personal", 1.0)
    assert "ranked_hotels" in res_p
    res_f = eng.recommend(user, city, "friends", 0.7)
    assert len(res_f["ranked_hotels"]) > 0  # popularity fallback
    assert all(h["recommended_by"] == [] for h in res_f["ranked_hotels"])
    assert all(h["city"] == city for h in res_f["ranked_hotels"])


def test_http_batch_endpoint_malformed_bodies(http_server):
    """Malformed-but-valid-JSON bodies → 422, never 500."""
    for body in ([], None, "hi", {"requests": 5}, {"requests": "x"}):
        status, _ = _post(http_server + "/recommendations/batch", body)
        assert status == 422, body


def test_single_candidate_request(engine_setup):
    """Exactly ONE candidate must serve cleanly for every lambda. The
    reference crashes here: a 1-element logit tensor `.squeeze()`s to 0-d
    and `zip(scores, ...)` raises (reference main.py:127,325 — SURVEY.md
    §3.3 flags it as a latent bug not to replicate). Our masked
    full-universe program has no such rank hazard; this pins that."""
    engine, main_df, friendships, bundle = engine_setup
    solo = main_df.iloc[[0]].copy()
    solo_item = int(main_df["item_id"].max()) + 1
    solo["item_id"] = solo_item
    solo["city"] = "Solo"
    solo["rating_overall"] = 9.0  # a positive review, so 'personal' finds it
    user = int(solo["user_id"].iloc[0])
    df2 = pd.concat([main_df, solo], ignore_index=True)
    eng = RecommendationEngine(bundle, df2, friendships)
    for lam in (1.0, 0.5):  # full-list path and the MMR path
        res = eng.recommend(user, "Solo", "personal", lam)
        hotels = res["ranked_hotels"]
        assert len(hotels) == 1, (lam, res)
        assert hotels[0]["hotel_id"] == solo_item
        assert hotels[0]["city"] == "Solo"


def test_candidate_cap_responses_identical(engine_setup):
    """serve.candidate_cap: the capped fast path (score only candidate
    rows) must return responses IDENTICAL to the full-universe program for
    every request — including requests whose candidate set overflows the
    cap (lax.cond falls back to the exact full branch) and empty sets."""
    engine, main_df, friendships, bundle = engine_setup
    # cap inside the (default) city-bounded program AND the cap over the
    # full-universe program (_recommend_impl's cond / M-width _rank_capped
    # padding — the path production reaches via serve.city_bounded=false
    # or a single-city catalog)
    capped = RecommendationEngine(bundle, main_df, friendships, candidate_cap=16)
    capped_nb = RecommendationEngine(bundle, main_df, friendships,
                                     candidate_cap=16, city_bounded=False)
    assert capped._city_bounded and not capped_nb._city_bounded
    uni = engine.gen.universe
    took_fast = took_full = 0
    for u in [int(x) for x in uni.user_ids[:12]]:
        for city in uni.cities[:2]:
            for mode in ("friends", "personal"):
                for lam in (1.0, 0.5):
                    a = engine.recommend(u, city, mode, lam)
                    b = capped.recommend(u, city, mode, lam)
                    c = capped_nb.recommend(u, city, mode, lam)
                    assert a == b == c, (u, city, mode, lam)
                    n = len(a.get("ranked_hotels", []))
                    if 0 < n <= 16:
                        took_fast += 1
                    elif n > 16:
                        took_full += 1
    # both branches must actually have been exercised
    assert took_fast > 0 and took_full > 0, (took_fast, took_full)


def test_cache_never_serves_preswap_response():
    """Swap race regression: a response computed against the pre-swap model
    must never be cached after the swap (cache.py's _get/_put generation
    handshake). The in-flight thread deterministically lands its _put
    AFTER the swap; without the handshake the stale entry would be served."""
    import threading as _threading
    import time as _time

    from hhrs_tpu.serve.cache import CachedEngine
    from hhrs_tpu.serve.reload import SwappableEngine

    class Fake:
        def __init__(self, tag):
            self.tag = tag

        def recommend(self, u, c, m, l):
            _time.sleep(0.002)  # widen the miss→put window past the swap
            return {"tag": self.tag}

    holder = SwappableEngine(Fake("gen0"))
    cached = CachedEngine(holder, max_entries=8)
    for i in range(1, 50):
        t = _threading.Thread(
            target=lambda: cached.recommend(1, "X", "friends", 0.7)
        )
        t.start()
        _time.sleep(0.001)  # thread is inside the old model's compute
        holder.swap(Fake(f"gen{i}"))
        t.join()  # its _put lands after the swap → must be refused
        assert cached.recommend(1, "X", "friends", 0.7)["tag"] == f"gen{i}", i


def test_cache_single_flight():
    """A stampede of identical misses computes ONCE (leader) while the
    followers wait and serve the cached result; distinct keys still
    compute independently; a failing leader doesn't poison followers."""
    import threading as _threading
    import time as _time

    from hhrs_tpu.serve.cache import CachedEngine

    calls = []
    barrier = _threading.Barrier(8)

    class Slow:
        def recommend(self, u, c, m, l):
            calls.append((u, c))
            _time.sleep(0.05)
            return {"u": u, "c": c}

    cached = CachedEngine(Slow(), max_entries=32)

    def hit(u):
        barrier.wait()
        return cached.recommend(u, "X", "friends", 0.7)

    with __import__("concurrent.futures", fromlist=["ThreadPoolExecutor"]) \
            .ThreadPoolExecutor(max_workers=8) as ex:
        res = list(ex.map(hit, [1] * 6 + [2, 3]))
    assert all(r == {"u": 1, "c": "X"} for r in res[:6])
    assert res[6] == {"u": 2, "c": "X"} and res[7] == {"u": 3, "c": "X"}
    # 3 distinct keys → exactly 3 computations despite 6 concurrent dupes
    assert sorted(calls) == [(1, "X"), (2, "X"), (3, "X")], calls

    # a leader that raises must not deadlock or poison followers
    class Flaky:
        def __init__(self):
            self.n = 0

        def recommend(self, u, c, m, l):
            self.n += 1
            if self.n == 1:
                _time.sleep(0.02)
                raise RuntimeError("transient")
            return {"ok": self.n}

    flaky = CachedEngine(Flaky(), max_entries=8)
    start = _threading.Barrier(2)
    results, errors = [], []

    def try_hit():
        start.wait()
        try:
            results.append(flaky.recommend(9, "Y", "friends", 0.7))
        except RuntimeError:
            errors.append(1)

    ts = [_threading.Thread(target=try_hit) for _ in range(2)]
    [t.start() for t in ts]
    [t.join(10) for t in ts]
    assert len(errors) == 1 and results == [{"ok": 2}]


def test_city_bounded_engine_parity(engine_setup):
    """serve.city_bounded (default on): ranking only the request city's
    rows must return responses IDENTICAL to the full-universe program —
    single-request AND batched paths, including unknown-city (empty) and
    λ=1.0 full-list requests. Exactness rests on candidates ⊆ city items
    (candidates.py intersects the mask with city_item)."""
    engine, main_df, friendships, bundle = engine_setup
    uni = engine.gen.universe
    assert engine._city_bounded  # multi-city dataset → auto-enabled
    assert engine._order_width < engine.gen._M
    full = RecommendationEngine(bundle, main_df, friendships, city_bounded=False)
    assert not full._city_bounded

    reqs = []
    for u in [int(x) for x in uni.user_ids[:8]]:
        for city in list(uni.cities[:2]) + ["NowhereCity"]:
            for mode, lam in (("friends", 0.7), ("personal", 1.0)):
                reqs.append((u, city, mode, lam))
    for u, c, m, l in reqs:
        assert engine.recommend(u, c, m, l) == full.recommend(u, c, m, l), (u, c, m, l)
    # batched program (vmapped city-bounded impl) — same contract
    assert engine.recommend_many(reqs[:9]) == full.recommend_many(reqs[:9])


def test_city_bounded_multi_city_item(engine_setup):
    """An item whose reviews appear under TWO cities belongs to both city
    masks (candidates.py builds city_item from ALL review rows, not the
    item's first-occurrence city). The city-bounded rows table must come
    from that same mask — this pins it: with a review row duplicated into
    a second city, bounded and unbounded engines stay response-identical
    for BOTH cities, and the multi-city item actually surfaces."""
    engine, main_df, friendships, bundle = engine_setup
    uni = engine.gen.universe
    c0, c1 = uni.cities[0], uni.cities[1]
    row = main_df[main_df["city"] == c0].iloc[[0]].copy()
    row["city"] = c1
    row["rating_overall"] = 9.0  # its reviewer now likes it → personal positive
    df2 = pd.concat([main_df, row], ignore_index=True)
    bounded = RecommendationEngine(bundle, df2, friendships, city_bounded=True)
    unbounded = RecommendationEngine(bundle, df2, friendships, city_bounded=False)
    assert bounded._city_bounded and not unbounded._city_bounded
    item = int(row["item_id"].iloc[0])
    user = int(row["user_id"].iloc[0])
    hits = 0
    for city in (c0, c1):
        for uid in [user] + [int(x) for x in uni.user_ids[:5]]:
            for mode in ("friends", "personal"):
                a = bounded.recommend(uid, city, mode, 1.0)
                b = unbounded.recommend(uid, city, mode, 1.0)
                assert a == b, (uid, city, mode)
                if any(h["hotel_id"] == item for h in a.get("ranked_hotels", [])):
                    hits += 1
    assert hits > 0  # the duplicated-city item surfaced somewhere


def test_response_cache(engine_setup):
    """serve/cache.py: identical requests are memoized exactly; misses in a
    batch still go to the device as one program; LRU evicts; TTL expires;
    and a model-generation change (hot swap) invalidates everything."""
    import time as _time

    from hhrs_tpu.serve.cache import CachedEngine
    from hhrs_tpu.serve.reload import SwappableEngine

    engine, main_df, friendships, bundle = engine_setup
    uni = engine.gen.universe
    u0, u1 = int(uni.user_ids[0]), int(uni.user_ids[1])
    city = uni.cities[0]

    cached = CachedEngine(engine, max_entries=2)
    a = cached.recommend(u0, city, "friends", 0.7)
    b = cached.recommend(u0, city, "friends", 0.7)
    assert a is b  # the literal cached object — no device call
    assert a == engine.recommend(u0, city, "friends", 0.7)
    assert cached.cache_stats()["hits"] == 1

    # batched: one hit + one miss — parity with the raw engine
    reqs = [(u0, city, "friends", 0.7), (u1, city, "personal", 1.0)]
    out = cached.recommend_many(reqs)
    assert out == engine.recommend_many(reqs)
    assert cached.cache_stats()["hits"] == 2  # the u0 entry

    # LRU: a third distinct key evicts the oldest (max_entries=2)
    cached.recommend(u1, city, "friends", 0.5)
    assert cached.cache_stats()["entries"] == 2

    # TTL expiry
    ttl = CachedEngine(engine, max_entries=8, ttl_s=0.01)
    ttl.recommend(u0, city, "friends", 0.7)
    _time.sleep(0.05)
    ttl.recommend(u0, city, "friends", 0.7)
    assert ttl.cache_stats() == {"entries": 1, "hits": 0, "misses": 2}

    # similar_items memoized too, incl. the unknown-item None (404) case
    sim = CachedEngine(engine, max_entries=8)
    some_item = int(next(iter(bundle.preproc.item_id_mapping)))
    s1 = sim.similar_items(some_item, 5)
    s2 = sim.similar_items(some_item, 5)
    assert s1 == s2 and sim.cache_stats()["hits"] == 1
    assert sim.similar_items(-12345, 5) is None
    assert sim.similar_items(-12345, 5) is None  # served from the sentinel
    assert sim.cache_stats()["hits"] == 2

    # hot-swap invalidation: generation = identity of holder.current
    holder = SwappableEngine(engine)
    swapped = CachedEngine(holder, max_entries=8)
    r1 = swapped.recommend(u0, city, "friends", 0.7)
    holder.swap(RecommendationEngine(bundle, main_df, friendships))
    r2 = swapped.recommend(u0, city, "friends", 0.7)
    assert r1 == r2  # same model → same response...
    assert r1 is not r2  # ...but recomputed: the swap cleared the cache
    assert swapped.cache_stats()["misses"] == 2


def test_city_bounded_fuzz_random_universes(engine_setup):
    """Randomized serve universes against the SAME trained bundle: review
    rows reassigned to random cities (items spanning several cities, small
    cities, items unknown to the bundle → internal id 0). Bounded and
    unbounded engines must agree on every response."""
    engine, _main_df, _friendships, bundle = engine_setup
    for seed in range(3):
        ds = generate_synthetic_dataset(
            n_users=60, n_items=100, n_reviews=700, seed=100 + seed
        )
        df = add_engineered_features(
            ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
        )
        r = np.random.default_rng(seed)
        # per-ITEM home city + 5% per-row spill into random cities: items
        # stay city-concentrated (so W < Mp and the rows path engages) while
        # some items still span multiple cities (the tricky case)
        cities = np.array(["A", "B", "C", "D"])
        home = {it: cities[r.integers(4)] for it in df["item_id"].unique()}
        city_col = df["item_id"].map(home).to_numpy(object)
        spill = r.random(len(df)) < 0.05
        city_col[spill] = cities[r.integers(0, 4, int(spill.sum()))]
        df["city"] = city_col
        bounded = RecommendationEngine(bundle, df, ds.friendships, city_bounded=True)
        unbounded = RecommendationEngine(bundle, df, ds.friendships, city_bounded=False)
        assert bounded._city_bounded  # the rows path really runs (W < Mp)
        uni = bounded.gen.universe
        for uid in [int(x) for x in uni.user_ids[:5]]:
            for city in ("A", "D", "Zzz"):
                for mode, lam in (("friends", 1.0), ("personal", 0.5)):
                    a = bounded.recommend(uid, city, mode, lam)
                    b = unbounded.recommend(uid, city, mode, lam)
                    assert a == b, (seed, uid, city, mode, lam)


def test_city_bounded_composes_with_quantized_tables(engine_setup):
    """int8 tables change scores (vs f32) but bounded and unbounded
    engines must still agree with EACH OTHER under quantization — the
    rows program gathers through the same table_lookup dispatch."""
    engine, main_df, friendships, bundle = engine_setup
    uni = engine.gen.universe
    qb = RecommendationEngine(bundle, main_df, friendships,
                              quantize_tables=True, city_bounded=True)
    qu = RecommendationEngine(bundle, main_df, friendships,
                              quantize_tables=True, city_bounded=False)
    assert qb._city_bounded and not qu._city_bounded
    for u in [int(x) for x in uni.user_ids[:6]]:
        for mode, lam in (("friends", 0.7), ("personal", 1.0)):
            assert qb.recommend(u, uni.cities[0], mode, lam) == \
                qu.recommend(u, uni.cities[0], mode, lam), (u, mode, lam)


def test_city_bounded_composes_with_candidate_cap(engine_setup):
    """candidate_cap nests inside the city-bounded program (lax.cond in
    rows space) — responses stay identical to the unbounded engine."""
    engine, main_df, friendships, bundle = engine_setup
    uni = engine.gen.universe
    both = RecommendationEngine(bundle, main_df, friendships,
                                candidate_cap=16, city_bounded=True)
    assert both._city_bounded and both._cap == 16
    for u in [int(x) for x in uni.user_ids[:8]]:
        for mode in ("friends", "personal"):
            a = engine.recommend(u, uni.cities[0], mode, 0.6)
            b = both.recommend(u, uni.cities[0], mode, 0.6)
            assert a == b, (u, mode)
