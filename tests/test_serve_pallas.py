"""The Pallas-fused serve engine must return the same recommendations as
the jnp engine (BN folding + fused tower are numerics-preserving)."""

import pytest

from hhrs_tpu.serve.engine import RecommendationEngine

from tests.test_serve import engine_setup  # noqa: F401 — module fixture


@pytest.mark.parametrize("lam", [1.0, 0.6])
def test_pallas_engine_matches_jnp_engine(engine_setup, lam):  # noqa: F811
    engine, main_df, friendships, bundle = engine_setup
    pallas_engine = RecommendationEngine(bundle, main_df, friendships, use_pallas=True)

    uni = engine.gen.universe
    checked = 0
    for user_id in uni.user_ids[:6]:
        for city in uni.cities[:2]:
            a = engine.recommend(int(user_id), city, "friends", lam)
            b = pallas_engine.recommend(int(user_id), city, "friends", lam)
            ra = [h["hotel_id"] for h in a.get("ranked_hotels", [])]
            rb = [h["hotel_id"] for h in b.get("ranked_hotels", [])]
            assert ra == rb
            checked += len(ra)
    assert checked > 0


def test_bf16_engine_close_to_f32(engine_setup):  # noqa: F811
    """--bf16 scores in bfloat16 (throughput knob): responses stay valid and
    rankings overlap heavily with the f32 path (ties may reorder)."""
    engine, main_df, friendships, bundle = engine_setup
    bf = RecommendationEngine(bundle, main_df, friendships, bf16=True)
    assert bf._cfg.compute_dtype == "bfloat16"
    uni = engine.gen.universe
    checked = 0
    for user_id in uni.user_ids[:4]:
        a = engine.recommend(int(user_id), uni.cities[0], "friends", 1.0)
        b = bf.recommend(int(user_id), uni.cities[0], "friends", 1.0)
        ra = [h["hotel_id"] for h in a.get("ranked_hotels", [])]
        rb = [h["hotel_id"] for h in b.get("ranked_hotels", [])]
        assert set(ra) == set(rb)  # same candidate set, order may jitter
        if len(ra) >= 5:
            # rank correlation stays high under bf16 rounding
            overlap = len(set(ra[:5]) & set(rb[:5]))
            assert overlap >= 3, (ra[:5], rb[:5])
            checked += 1
    assert checked > 0


def test_pallas_batched_requests_match_jnp(engine_setup):  # noqa: F811
    """recommend_many under the Pallas tower (K·M rows flattened into one
    kernel call) returns the jnp batch path's exact responses — the
    --pallas × dynamic-batching composition (VERDICT r1 item 5)."""
    engine, main_df, friendships, bundle = engine_setup
    pallas_engine = RecommendationEngine(bundle, main_df, friendships, use_pallas=True)
    uni = engine.gen.universe
    reqs = [
        (int(uni.user_ids[i]), uni.cities[i % len(uni.cities)],
         ("friends" if i % 2 else "personal"), (0.6 if i % 3 else 1.0))
        for i in range(5)
    ]
    a = engine.recommend_many(reqs, pad_to=8)
    b = pallas_engine.recommend_many(reqs, pad_to=8)
    assert a == b
    # unpadded power-of-two bucket path too
    assert pallas_engine.recommend_many(reqs[:3]) == engine.recommend_many(reqs[:3])
