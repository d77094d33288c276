"""Serve scoring-mode tests.

The fused Pallas eval tower was RETIRED from serving after the round-2
kernel honesty pass (RESULTS.md): it measured slower than XLA end-to-end at
both reference scale (0.74x) and the scaled config (0.75x at H=512 / 98k
rows). The kernel and its exact-parity tests remain in ops/pallas
(tests/test_pallas_kernels.py) as the documented negative result; here we
pin the retirement semantics (accepted-but-no-op flag) and the bf16
throughput knob."""

import pytest

from hhrs_tpu.serve.engine import RecommendationEngine

from tests.test_serve import engine_setup  # noqa: F401 — module fixture


def test_use_pallas_retired_is_noop(engine_setup):  # noqa: F811
    """use_pallas=True warns, falls back to the jnp path, and returns the
    default engine's exact responses (no silent behavior change for old
    callers)."""
    engine, main_df, friendships, bundle = engine_setup
    legacy = RecommendationEngine(bundle, main_df, friendships, use_pallas=True)
    assert legacy.use_pallas is False
    uni = engine.gen.universe
    for user_id in uni.user_ids[:4]:
        for lam in (1.0, 0.6):
            a = engine.recommend(int(user_id), uni.cities[0], "friends", lam)
            b = legacy.recommend(int(user_id), uni.cities[0], "friends", lam)
            assert a == b


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
