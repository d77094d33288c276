"""int8 table quantization: round-trip fidelity, lookup equivalence, and
ranking impact on a trained item table (top-k overlap + logit closeness)."""

import jax
import jax.numpy as jnp
import numpy as np

from hhrs_tpu.ops.quant import (
    QuantizedTable,
    dequantize,
    quantization_error,
    quantize_table,
    quantized_lookup,
)
from hhrs_tpu.retrieval.similarity import cosine_topk, normalize_rows


def test_round_trip_error_small():
    table = jax.random.normal(jax.random.PRNGKey(0), (500, 16))
    assert quantization_error(table) < 0.02  # <2% row-norm error at int8

    qt = quantize_table(table)
    assert qt.values.dtype == jnp.int8
    # ~3.2x at D=16 (per-row scale overhead); → 4x as D grows
    assert qt.nbytes() < table.size * 4 / 3


def test_zero_row_safe():
    table = jnp.zeros((4, 8)).at[1].set(1.0)
    deq = dequantize(quantize_table(table))
    np.testing.assert_allclose(np.asarray(deq[0]), 0.0)
    np.testing.assert_allclose(np.asarray(deq[1]), np.asarray(table[1]), atol=1e-2)


def test_lookup_matches_dequant_gather():
    table = jax.random.normal(jax.random.PRNGKey(1), (64, 12))
    qt = quantize_table(table)
    ids = jnp.asarray([0, 5, 5, 63, 17])
    np.testing.assert_allclose(
        np.asarray(quantized_lookup(qt, ids)),
        np.asarray(dequantize(qt)[ids]),
        rtol=1e-6,
    )


def test_topk_neighbors_survive_quantization():
    """Cosine top-10 neighbor sets overlap ≥80% after int8."""
    rng = jax.random.PRNGKey(2)
    table = jax.random.normal(rng, (300, 16))
    tn = normalize_rows(table)
    qn = normalize_rows(dequantize(quantize_table(table)))
    _, ref_idx = cosine_topk(tn, table[:50], 11)
    _, q_idx = cosine_topk(qn, dequantize(quantize_table(table))[:50], 11)
    overlaps = [
        len(set(np.asarray(ref_idx)[i, 1:]) & set(np.asarray(q_idx)[i, 1:])) / 10
        for i in range(50)
    ]
    assert float(np.mean(overlaps)) >= 0.8


def test_quantized_table_is_a_jit_friendly_pytree():
    """QuantizedTable must pass through jit as an ARGUMENT (the engine's
    device state is an explicit jit arg, never a closure — CLAUDE.md)."""
    table = jax.random.normal(jax.random.PRNGKey(3), (64, 12))
    qt = quantize_table(table)

    @jax.jit
    def f(q, ids):
        return quantized_lookup(q, ids)

    ids = jnp.asarray([1, 2, 3])
    np.testing.assert_allclose(
        np.asarray(f(qt, ids)), np.asarray(quantized_lookup(qt, ids)), rtol=1e-6
    )
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 2  # values + scales, nothing static


def test_table_lookup_dispatch():
    from hhrs_tpu.ops.quant import table_lookup

    table = jax.random.normal(jax.random.PRNGKey(4), (32, 8))
    ids = jnp.asarray([0, 31, 7])
    np.testing.assert_allclose(
        np.asarray(table_lookup(table, ids)), np.asarray(table[ids]), rtol=0
    )
    qt = quantize_table(table)
    np.testing.assert_allclose(
        np.asarray(table_lookup(qt, ids)), np.asarray(quantized_lookup(qt, ids)), rtol=0
    )


def test_quantized_params_logit_fidelity():
    """apply_dcn over a params tree with int8 embedding tables: same program,
    logits within the quantization error envelope of the f32 run."""
    from hhrs_tpu.config import ModelConfig
    from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
    from hhrs_tpu.ops.quant import quantize_embedding_params

    cfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=2, n_res_blocks=1)
    dims = ModelDims(
        n_users=200, n_items=80, cat_dims=(("city", 12), ("hotel_type", 5)),
        n_num_features=11,
    )
    params, state = init_dcn(jax.random.PRNGKey(5), dims, cfg)
    qparams = quantize_embedding_params(params)

    rng = jax.random.PRNGKey(6)
    B = 256
    users = jax.random.randint(rng, (B,), 0, dims.n_users)
    items = jax.random.randint(rng, (B,), 0, dims.n_items)
    cats = jnp.stack(
        [jax.random.randint(rng, (B,), 0, c) for _, c in dims.cat_dims], axis=1
    )
    nums = jax.random.uniform(rng, (B, dims.n_num_features))

    lo, _ = apply_dcn(params, state, users, items, cats, nums, cfg=cfg, train=False)
    lq, _ = apply_dcn(qparams, state, users, items, cats, nums, cfg=cfg, train=False)
    lo, lq = np.asarray(lo), np.asarray(lq)
    scale = max(float(np.std(lo)), 1e-6)
    assert float(np.max(np.abs(lq - lo))) / scale < 0.15
    # rank order of clearly-separated logits is preserved
    assert float(np.corrcoef(lo, lq)[0, 1]) > 0.995


def test_quantized_engine_end_to_end(tmp_path):
    """The serve engine with --quantize-tables: identical candidate SETS
    (retrieval is untouched), near-identical rankings, well-formed payloads."""
    import pandas as pd

    from hhrs_tpu.config import ModelConfig, TrainConfig
    from hhrs_tpu.data import add_engineered_features, Preprocessor
    from hhrs_tpu.data.ingest import noise_filter
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset
    from hhrs_tpu.models.dcn import ModelDims
    from hhrs_tpu.serve.engine import RecommendationEngine
    from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
    from hhrs_tpu.train.trainer import train_dcn

    ds = generate_synthetic_dataset(n_users=120, n_items=60, n_reviews=2500, seed=33)
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(noise_filter(main_df.copy()))
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1)
    result = train_dcn(splits, dims, mcfg, TrainConfig(lr=3e-3, batch_size=256, n_epochs=2))
    out = str(tmp_path / "artifacts")
    export_artifacts(out, result.params, result.bn_state, mcfg, dims, art, result.final_metrics)
    bundle = load_artifact_bundle(out)

    f32 = RecommendationEngine(bundle, main_df, ds.friendships)
    q8 = RecommendationEngine(bundle, main_df, ds.friendships, quantize_tables=True)

    uni = f32.gen.universe
    checked = 0
    for user in uni.user_ids[:20]:
        for city in uni.cities[:3]:
            a = f32.recommend(int(user), city, "friends", 1.0)
            b = q8.recommend(int(user), city, "friends", 1.0)
            # λ=1.0 returns the full candidate list: retrieval is f32 in both
            # engines, so the SETS must be identical; ordering may differ
            # only among near-tied logits.
            ids_a = [h["hotel_id"] for h in a["ranked_hotels"]]
            ids_b = [h["hotel_id"] for h in b["ranked_hotels"]]
            assert set(ids_a) == set(ids_b), (user, city)
            if ids_a:
                checked += 1
                # top-5 overlap: int8 error is <2% per row — heavy reordering
                # would mean the wiring is wrong, not the rounding
                k = min(5, len(ids_a))
                assert len(set(ids_a[:k]) & set(ids_b[:k])) >= k - 1, (user, city)
    assert checked >= 5

    # /similar_items runs on the f32 retrieval table: bit-identical
    some = list(bundle.preproc.item_id_mapping.keys())[:5]
    for ext in some:
        assert f32.similar_items(ext, 5) == q8.similar_items(ext, 5)
