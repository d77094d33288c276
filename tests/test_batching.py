"""Dynamic batching: the vmapped batch program matches sequential
recommend exactly, and the BatchingEngine coalesces concurrent callers."""

import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from hhrs_tpu.serve.batcher import BatchingEngine

from tests.test_serve import engine_setup  # noqa: F401 — module fixture


def _requests(engine, n=6):
    uni = engine.gen.universe
    out = []
    for i in range(n):
        out.append((
            int(uni.user_ids[i % len(uni.user_ids)]),
            uni.cities[i % len(uni.cities)],
            "friends" if i % 2 == 0 else "personal",
            [0.7, 1.0][i % 2],
        ))
    return out


def test_recommend_many_matches_sequential(engine_setup):  # noqa: F811
    engine, *_ = engine_setup
    reqs = _requests(engine, 6)
    batched = engine.recommend_many(reqs)
    for req, got in zip(reqs, batched):
        want = engine.recommend(*req)
        assert got == want


def test_recommend_many_empty_and_single(engine_setup):  # noqa: F811
    engine, *_ = engine_setup
    assert engine.recommend_many([]) == []
    req = _requests(engine, 1)[0]
    assert engine.recommend_many([req])[0] == engine.recommend(*req)


def test_batching_engine_concurrent_correctness(engine_setup):  # noqa: F811
    engine, *_ = engine_setup
    front = BatchingEngine(engine, max_batch=8, window_ms=20.0)
    try:
        reqs = _requests(engine, 12)
        expected = [engine.recommend(*r) for r in reqs]

        with ThreadPoolExecutor(max_workers=12) as ex:
            got = list(ex.map(lambda r: front.recommend(*r), reqs))
        assert got == expected

        # delegation of the non-batched surface
        uni = engine.gen.universe
        assert front.similar_items(int(uni.item_ids[0]), 3) == \
            engine.similar_items(int(uni.item_ids[0]), 3)
        assert front.latency.summary()["count"] >= 12
    finally:
        front.close()


def test_batching_engine_propagates_errors(engine_setup):  # noqa: F811
    engine, *_ = engine_setup

    class Boom:
        def recommend_many(self, reqs, pad_to=None):
            raise RuntimeError("boom")

    front = BatchingEngine(Boom(), max_batch=2, window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            front.recommend(1, "X", "friends", 0.7)
    finally:
        front.close()
