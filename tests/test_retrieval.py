"""Retrieval-engine tests: similarity vs sklearn, candidate-gen and MMR vs
pure-Python oracles that independently implement the reference semantics
(thresholds >=8 / <=4, 10-neighbor expansion with drop-first, <20 popularity
fallback, city intersection, negative subtraction; SURVEY.md C12-C14, C17).
"""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from hhrs_tpu.config import RetrievalConfig
from hhrs_tpu.data import add_engineered_features, Preprocessor
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.ops.mmr import mmr_rerank, NEG_INF
from hhrs_tpu.retrieval.candidates import CandidateGenerator
from hhrs_tpu.retrieval.graph import FriendGraph
from hhrs_tpu.retrieval.similarity import build_neighbor_table, cosine_topk, normalize_rows


# --------------------------------------------------------------------- #
# oracles: independent plain-python implementations of the reference math
# --------------------------------------------------------------------- #

def oracle_friends(friendships: pd.DataFrame, user_id: int) -> set:
    out = set(friendships.loc[friendships["user_id_1"] == user_id, "user_id_2"])
    out |= set(friendships.loc[friendships["user_id_2"] == user_id, "user_id_1"])
    return out


def oracle_candidates(main_df, friendships, item_map, embeddings, user_id, city, mode):
    from sklearn.neighbors import NearestNeighbors

    if mode == "friends":
        src = oracle_friends(friendships, user_id)
        rows = main_df[main_df["user_id"].isin(src)] if src else main_df.iloc[0:0]
    else:
        rows = main_df[main_df["user_id"] == user_id]
    pos = rows.loc[rows["rating_overall"] >= 8, "item_id"].unique().tolist()
    neg = set(rows.loc[rows["rating_overall"] <= 4, "item_id"].unique())

    cand = set(pos)
    if len(embeddings):
        knn = NearestNeighbors(n_neighbors=11, metric="cosine", algorithm="brute").fit(embeddings)
        rev = {v: k for k, v in item_map.items()}
        for ext in pos:
            ti = item_map.get(ext)
            if ti is None:
                continue
            _, ind = knn.kneighbors(embeddings[ti].reshape(1, -1), n_neighbors=11)
            cand.update(rev[i] for i in ind.ravel()[1:] if i in rev)
    if len(cand) < 20:
        top = (
            main_df[main_df["city"] == city]
            .sort_values("user_reviews_count", ascending=False, kind="stable")
            .head(100)["item_id"]
            .tolist()
        )
        cand.update(top)
    cand &= set(main_df.loc[main_df["city"] == city, "item_id"].unique())
    cand -= neg
    return cand


def oracle_mmr(score_by_item: dict, emb_by_item: dict, lam: float, top_k: int = 20) -> list:
    order = sorted(score_by_item, key=lambda i: -score_by_item[i])
    remaining = list(order)
    chosen = [remaining.pop(0)]
    while len(chosen) < min(top_k, len(score_by_item)):
        best, best_val = None, -np.inf
        sel_vecs = [emb_by_item[c] for c in chosen if c in emb_by_item]
        for c in remaining:
            if c not in emb_by_item:
                continue
            if sel_vecs:
                v = emb_by_item[c]
                sims = [
                    float(v @ s / (np.linalg.norm(v) * np.linalg.norm(s))) for s in sel_vecs
                ]
                ms = max(sims)
            else:
                ms = 0.0
            val = lam * score_by_item[c] - (1 - lam) * ms
            if val > best_val:
                best, best_val = c, val
        if best is None:
            break
        chosen.append(best)
        remaining.remove(best)
    return chosen


# --------------------------------------------------------------------- #

def test_cosine_topk_matches_sklearn():
    from sklearn.neighbors import NearestNeighbors

    rng = np.random.default_rng(0)
    table = rng.normal(size=(80, 16)).astype(np.float32)
    queries = rng.normal(size=(7, 16)).astype(np.float32)
    knn = NearestNeighbors(n_neighbors=5, metric="cosine", algorithm="brute").fit(table)
    dist, idx_sk = knn.kneighbors(queries, n_neighbors=5)
    _, idx = cosine_topk(normalize_rows(jnp.asarray(table)), jnp.asarray(queries), 5)
    np.testing.assert_array_equal(np.asarray(idx), idx_sk)


def test_neighbor_table_drop_first():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(30, 8)).astype(np.float32)
    nbr = build_neighbor_table(emb, 4)
    assert nbr.shape == (30, 4)
    for i in range(30):
        assert i not in nbr[i]  # self dropped (first hit)


def test_friend_graph_undirected():
    pairs = pd.DataFrame({"user_id_1": [1, 2, 1], "user_id_2": [2, 3, 4]})
    g = FriendGraph.from_pairs(pairs, {1: 0, 2: 1, 3: 2, 4: 3})
    assert set(g.friends_of(1)) == {2, 4}
    assert set(g.friends_of(2)) == {1, 3}
    assert set(g.friends_of(3)) == {2}
    assert set(g.friends_of(99)) == set()
    padded = g.padded_friend_indices(1, pad=5, dump=4)
    assert sorted(padded[:2].tolist()) == [1, 3]
    assert (padded[2:] == 4).all()


@pytest.fixture(scope="module")
def serving_setup():
    ds = generate_synthetic_dataset(n_users=300, n_items=150, n_reviews=8000, seed=11)
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    # train vocab comes from the FILTERED data (reference builds the item map
    # in train.py after the noise filter), serve operates on the full CSV
    filtered = noise_filter(main_df.copy())
    _, art = Preprocessor().fit_transform(filtered)
    rng = np.random.default_rng(2)
    embeddings = rng.normal(size=(art.n_items, 16)).astype(np.float32)
    gen = CandidateGenerator(main_df, art.item_id_mapping, embeddings)
    graph = FriendGraph.from_pairs(ds.friendships, gen.universe.user_index)
    return main_df, ds.friendships, art, embeddings, gen, graph


@pytest.mark.parametrize("mode", ["friends", "personal"])
def test_candidates_match_oracle(serving_setup, mode):
    main_df, friendships, art, embeddings, gen, graph = serving_setup
    cities = gen.universe.cities[:3]
    users = list(gen.universe.user_ids[:8]) + [999999]  # incl. unknown user
    checked = 0
    for city in cities:
        for user in users:
            expected = oracle_candidates(
                main_df, friendships, art.item_id_mapping, embeddings, user, city, mode
            )
            mask, count = gen.generate(int(user), city, mode, graph)
            got = set(gen.universe.item_ids[np.nonzero(mask)[0]].tolist())
            assert got == expected, (user, city, mode, got ^ expected)
            assert count == len(expected)
            checked += 1
    assert checked == 27


def test_unknown_city_returns_empty(serving_setup):
    _, _, _, _, gen, graph = serving_setup
    mask, count = gen.generate(1, "Atlantis", "friends", graph)
    assert count == 0 and not mask.any()


def test_mmr_matches_oracle():
    rng = np.random.default_rng(3)
    M, d = 60, 8
    emb = rng.normal(size=(M, d)).astype(np.float32)
    cand = rng.uniform(size=M) < 0.5
    embedded = np.ones(M, bool)
    embedded[rng.choice(M, 6, replace=False)] = False  # some items lack embeddings
    scores = rng.normal(size=M).astype(np.float32)

    for lam in (0.0, 0.3, 0.7, 1.0):
        got = np.asarray(
            mmr_rerank(
                jnp.where(jnp.asarray(cand), jnp.asarray(scores), NEG_INF),
                normalize_rows(jnp.asarray(emb)),
                jnp.asarray(cand),
                jnp.asarray(embedded),
                jnp.float32(lam),
                top_k=20,
            )
        )
        got = got[got >= 0].tolist()

        score_by_item = {i: float(scores[i]) for i in range(M) if cand[i]}
        emb_by_item = {i: emb[i] for i in range(M) if embedded[i]}
        expected = oracle_mmr(score_by_item, emb_by_item, lam)
        assert got == expected, (lam, got, expected)


def test_mmr_single_candidate():
    M, d = 10, 4
    emb = np.eye(M, d, dtype=np.float32)
    cand = np.zeros(M, bool)
    cand[3] = True
    scores = np.zeros(M, np.float32)
    out = np.asarray(
        mmr_rerank(
            jnp.where(jnp.asarray(cand), jnp.asarray(scores), NEG_INF),
            normalize_rows(jnp.asarray(emb)),
            jnp.asarray(cand),
            jnp.ones(M, dtype=bool),
            jnp.float32(0.5),
        )
    )
    assert out[0] == 3 and (out[1:] == -1).all()


def test_mmr_no_candidates():
    M = 8
    out = np.asarray(
        mmr_rerank(
            jnp.full(M, NEG_INF),
            jnp.zeros((M, 4)),
            jnp.zeros(M, bool),
            jnp.ones(M, bool),
            jnp.float32(0.5),
        )
    )
    assert (out == -1).all()


def test_neighbor_table_tiny_catalog():
    """Catalogs with <= expand_neighbors trained items must not crash at
    startup (lax.top_k k > N); missing neighbor columns pad with the dump
    slot N (similarity.build_neighbor_table)."""
    from hhrs_tpu.retrieval.similarity import build_neighbor_table

    emb = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
    t = build_neighbor_table(emb, 10)
    assert t.shape == (4, 10)
    assert (t[:, :3] < 4).all()  # the 3 real non-self neighbors
    assert (t[:, 3:] == 4).all()  # padding -> dump slot N
    assert build_neighbor_table(np.zeros((0, 8), np.float32), 10).shape == (0, 10)


def test_padded_friend_indices_raises_on_overflow():
    """Truncating a friend list would silently drop positives AND
    negatives (the reference uses ALL friends) — the helper refuses."""
    from hhrs_tpu.retrieval.graph import FriendGraph

    pairs = pd.DataFrame({"user_id_1": [1, 1, 1], "user_id_2": [2, 3, 4]})
    g = FriendGraph.from_pairs(pairs, {1: 0, 2: 1, 3: 2, 4: 3})
    assert len(g.padded_friend_indices(1, pad=4, dump=9)) == 4
    with pytest.raises(ValueError, match="friends > source width"):
        g.padded_friend_indices(1, pad=2, dump=9)


def test_mmr_tie_breaks_by_relevance_order():
    """Equal-MMR candidates must resolve like the reference loop (descending
    relevance, first strict improvement wins — main.py:148-166), not by
    lowest index. λ=0 with mutually orthogonal embeddings makes every
    unselected candidate's MMR exactly 0 → pure tie."""
    e = jnp.eye(3, 4)
    scores = jnp.array([5.0, 1.0, 2.0])
    out = np.asarray(
        mmr_rerank(scores, e, jnp.ones(3, bool), jnp.ones(3, bool),
                   jnp.float32(0.0), top_k=3)
    )
    assert out.tolist() == [0, 2, 1]  # ties follow relevance, not index


def test_quantized_lookup_2d_ids():
    """table_lookup with [B, K] ids must scale along the embedding axis."""
    from hhrs_tpu.ops.quant import quantize_table, table_lookup, dequantize

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32) * 3)
    qt = quantize_table(table)
    ids = jnp.asarray([[1, 2, 3], [4, 5, 6]])
    got = table_lookup(qt, ids)
    want = dequantize(qt)[ids]
    assert got.shape == (2, 3, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


def test_batchnorm_batch_of_one_raises():
    """torch BatchNorm1d parity: training on a single-example batch fails
    loudly instead of silently decaying running var toward zero."""
    from hhrs_tpu.ops.nn import batchnorm_apply

    params = {"scale": jnp.ones(4), "bias": jnp.zeros(4)}
    state = {"mean": jnp.zeros(4), "var": jnp.ones(4)}
    with pytest.raises(ValueError, match=">1 example"):
        batchnorm_apply(params, state, jnp.ones((1, 4)), train=True)


def test_phantom_neighbors_count_toward_fallback_threshold():
    """Reference parity on REFRESHED serve data (main.py:196-207): kNN
    neighbors that are train-vocab items absent from the serve frame join
    candidate_hotels BEFORE the <min_candidates check (the city
    intersection that drops them comes later), so they must suppress the
    popularity fallback even though they can never be candidates."""
    import numpy as np
    import pandas as pd

    from hhrs_tpu.config import RetrievalConfig
    from hhrs_tpu.retrieval.candidates import CandidateGenerator

    rows = []
    # user 10 loves item 1; items 2..6 exist via other users (popularity pool)
    rows.append((10, 1, "X", 9.0, 50))
    for it in range(2, 7):
        rows.append((90 + it, it, "X", 6.0, 100 + it))
    main_df = pd.DataFrame(rows, columns=["user_id", "item_id", "city",
                                          "rating_overall", "user_reviews_count"])
    main_df["hotel_type"] = "h"

    emb_dim = 4
    rng = np.random.default_rng(0)

    def build(mapping, n_train):
        emb = rng.standard_normal((n_train, emb_dim)).astype(np.float32)
        # make ext item 1 (internal 0) nearest to the LAST 10 internals
        emb[0] = 1.0
        for j in range(n_train - 10, n_train):
            emb[j] = 1.0 + 1e-3 * rng.standard_normal(emb_dim)
        cfg = RetrievalConfig(expand_neighbors=10, min_candidates=5,
                              popular_pool=100)
        return CandidateGenerator(main_df, mapping, emb, cfg)

    # train vocab = serve items 1..6 PLUS 15 phantom ext ids 100..114
    mapping_phantom = {it: i for i, it in enumerate(range(1, 7))}
    for g, ext in enumerate(range(100, 115)):
        mapping_phantom[ext] = 6 + g
    gen_p = build(mapping_phantom, 21)
    assert gen_p.n_ghosts == 15

    # train vocab = serve items only (no phantoms)
    mapping_plain = {it: i for i, it in enumerate(range(1, 7))}
    gen_0 = build(mapping_plain, 6)
    assert gen_0.n_ghosts == 0

    cand_p, count_p = gen_p.generate(10, "X", "personal", None)
    cand_0, count_0 = gen_0.generate(10, "X", "personal", None)
    # phantoms push the pre-fallback count past min_candidates: NO
    # popularity fallback, so only the user's own positive survives
    assert count_p == 1, (count_p, cand_p.nonzero())
    # without phantoms the count stays below 5 and the city's popularity
    # pool floods in
    assert count_0 > count_p
