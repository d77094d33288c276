"""Two-stage recommendation engine: on-device retrieval → DCN-R ranking → MMR.

The serve path of the reference (main.py:233-357) rebuilt TPU-first. All
request-independent state is device-resident and built once at startup:

  * review/item masks and the kNN expansion table (CandidateGenerator);
  * the full serve-item feature matrix [M, ·] (train-internal ids with the
    reference's unknown→0 fallback, categorical codes, scaled numericals);
  * normalized item embeddings for similarity + MMR.

A request executes ONE jitted program with static shapes: friend scatter →
candidate masks → DCN-R scoring (a single MXU batch; the reference instead
materializes a pandas sub-frame and runs a dynamic-size torch batch) →
masked MMR. By default scoring covers only the request city's item rows —
exact, since candidates are a subset of the city's items by construction —
so per-request compute and D2H are O(max city size), not O(catalog); under
a mesh the full row-sharded item axis is scored instead. The host only does id translation and JSON
assembly. Fallback/edge semantics match the reference exactly:
unknown user → n_users//2 model id; empty candidates → message response;
λ=1.0 returns the full sorted candidate list, λ<1 the MMR top-20.
"""

from __future__ import annotations

import dataclasses
import logging
import time


import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from hhrs_tpu.config import RetrievalConfig
from hhrs_tpu.data import schema
from hhrs_tpu.data.features import add_engineered_features
from hhrs_tpu.data.ingest import load_friendships_csv, load_reviews_csv
from hhrs_tpu.models.dcn import apply_dcn
from hhrs_tpu.ops.mmr import NEG_INF, mmr_rerank
from hhrs_tpu.retrieval.candidates import CandidateGenerator, ServeUniverse
from hhrs_tpu.retrieval.graph import FriendGraph
from hhrs_tpu.retrieval.similarity import cosine_topk, normalize_rows
from hhrs_tpu.train.artifacts import ArtifactBundle, load_artifact_bundle
from hhrs_tpu.utils.logging import LatencyHistogram

log = logging.getLogger(__name__)


class RecommendationEngine:
    def __init__(
        self,
        bundle: ArtifactBundle,
        main_df: pd.DataFrame,
        friendships: pd.DataFrame,
        retrieval_cfg: RetrievalConfig | None = None,
        use_pallas: bool = False,
        mesh=None,
        bf16: bool = False,
        quantize_tables: bool = False,
        candidate_cap: int = 0,
        city_bounded: bool = True,
        retrieval_embeddings=None,
    ):
        if retrieval_embeddings is not None:
            # Opt-in learned retriever (retrieval/two_tower.py): substitute
            # the retrieval-trained item vectors for the ranker's item
            # table in EVERY similarity surface — candidate kNN expansion,
            # /similar_items, and MMR diversity — one vector source, no
            # mixed spaces. Rows are internal item ids (the ranker
            # artifact's item_embeddings row space); width may differ (all
            # consumers are dim-agnostic cosine/top-k). The RANKING model
            # is untouched. Changes responses by design — never a default.
            import numpy as _np

            re_arr = _np.asarray(retrieval_embeddings, _np.float32)
            if re_arr.shape[0] != bundle.item_embeddings.shape[0]:
                raise ValueError(
                    "retrieval_embeddings rows "
                    f"({re_arr.shape[0]}) != the artifact's internal item "
                    f"count ({bundle.item_embeddings.shape[0]})")
            bundle = dataclasses.replace(bundle, item_embeddings=re_arr)
        self.bundle = bundle
        self.retrieval_cfg = retrieval_cfg or RetrievalConfig()
        self.main_df = main_df
        self.latency = LatencyHistogram()
        self.use_pallas = use_pallas
        self.mesh = mesh
        if mesh is not None and candidate_cap:
            # The capped branch gathers feature rows at arbitrary
            # nonzero(cand) indices — out of row-sharded arrays that would
            # insert cross-device collectives into every request program
            # (the same pathology city-bounding auto-disables itself for).
            log.warning("candidate_cap is ignored under --mesh (arbitrary-row "
                        "gathers from sharded arrays); the row-sharded "
                        "full-universe program is the mesh fast path")
            candidate_cap = 0
        self._cap = int(candidate_cap)
        if quantize_tables:
            # Opt-in: hold the model's embedding tables (user/item/cats) as
            # per-row int8 on device (ops/quant.py) — 4x less table HBM and
            # 4x fewer gather bytes per request. The scoring program is
            # unchanged (table_lookup dispatches on the table type; the
            # dequant multiply fuses into the consumer). Rankings of
            # near-tied items can differ from f32 (<2% row-norm error) —
            # a scale knob, not the parity default. The retrieval-side
            # item_embeddings (kNN/MMR) stay f32: candidate sets and
            # /similar_items remain bit-identical to the f32 engine.
            from hhrs_tpu.ops.quant import quantize_embedding_params

            bundle = dataclasses.replace(
                bundle, params=quantize_embedding_params(bundle.params)
            )
            self.bundle = bundle
        if bf16:
            # Opt-in: score the catalog in bfloat16 on the MXU (params stay
            # f32; logits accumulate f32). Rankings of near-tied items can
            # differ from the f32 path by design — this is a serve-throughput
            # knob, not the parity default.
            bundle = dataclasses.replace(
                bundle, model_cfg=dataclasses.replace(
                    bundle.model_cfg, compute_dtype="bfloat16")
            )
            self.bundle = bundle
        art = bundle.preproc
        # Graph first: the source-vector width must cover the largest friend
        # list (the reference uses ALL friends, main.py:172-178 — truncation
        # would silently drop their positives AND negatives). Rounded up for
        # compile-shape stability across restarts with similar graphs.
        uni = ServeUniverse.from_df(main_df)
        self.graph = FriendGraph.from_pairs(friendships, uni.user_index)
        from hhrs_tpu.utils.shapes import round_up

        max_sources = max(256, round_up(self.graph.max_degree, 64))
        self.gen = CandidateGenerator(
            main_df, art.item_id_mapping, bundle.item_embeddings, self.retrieval_cfg,
            max_sources=max_sources, universe=uni, mesh=mesh,
        )
        M = uni.n_items

        # --- serve-item feature matrix (first-occurrence row per item,
        #     matching the reference's drop_duplicates ranking frame) ---
        items_df = main_df.drop_duplicates(subset=[schema.ITEM_COL]).set_index(
            schema.ITEM_COL, drop=False
        )
        items_df = items_df.loc[uni.item_ids]  # serve-index order
        self.items_df = items_df

        # ONE featurizer shared with per-request ranking/eval — the
        # engine's startup item matrix can't drift from it.
        from hhrs_tpu.data.preprocess import encode_item_features

        _, X_cat, X_num = encode_item_features(art, items_df)

        # Program-space item axis is the generator's (mesh-padded) M; pad
        # the ranking-side arrays to match (padded rows are never candidates
        # and score NEG_INF, so they can't surface).
        Mp = self.gen._M
        pad = Mp - M
        item_internal = np.pad(self.gen.s2t_np, (0, pad))  # unknown → 0 (fallback parity)
        X_cat = np.pad(X_cat, ((0, pad), (0, 0)))
        X_num = np.pad(X_num, ((0, pad), (0, 0)))
        embedded = np.pad(self.gen.s2t_valid_np, (0, pad))
        # normalized embeddings in serve-item space (junk rows masked by 'embedded')
        emb_serve = bundle.item_embeddings[np.clip(item_internal, 0, None)]
        emb_norm_serve = np.asarray(
            normalize_rows(jnp.asarray(emb_serve, jnp.float32))
        )

        rank_host = {
            "item_internal": item_internal.astype(np.int32),
            "X_cat": X_cat.astype(np.int32),
            "X_num": X_num.astype(np.float32),
            "embedded": embedded,
            "emb_norm": emb_norm_serve,
            "params": bundle.params,
            "bn_state": bundle.bn_state,
        }
        # ONE batched device_put of the whole ranking-state pytree: per-array
        # puts each pay the tunneled backend's fixed per-call latency, and
        # the engine build used to make ~dozens of them (measured: warm
        # 100k-catalog build 7.2-8.5s before batching — RESULTS.md r5).
        if mesh is None:
            self._dev = jax.device_put(rank_host)
        else:
            from hhrs_tpu.parallel.mesh import row_shardings

            row1, row2, _, rep = row_shardings(mesh)
            rank_host = {
                "item_internal": np.asarray(item_internal, np.int32),
                "X_cat": np.asarray(X_cat, np.int32),
                "X_num": np.asarray(X_num, np.float32),
                "embedded": np.asarray(embedded),
                "emb_norm": np.asarray(emb_norm_serve),
                "params": bundle.params,
                "bn_state": bundle.bn_state,
            }
            self._dev = jax.device_put(rank_host, {
                "item_internal": row1, "X_cat": row2, "X_num": row2,
                "embedded": row1, "emb_norm": row2,
                # the dense model is tiny — replicated on every device
                "params": jax.tree.map(lambda _: rep, bundle.params),
                "bn_state": jax.tree.map(lambda _: rep, bundle.bn_state),
            })
        self._dev["gen"] = self.gen.dev

        self._table_norm_train = normalize_rows(jnp.asarray(bundle.item_embeddings, jnp.float32))
        self._emb_train = jnp.asarray(bundle.item_embeddings, jnp.float32)
        self._reverse_item_map = {v: k for k, v in art.item_id_mapping.items()}
        self._similar_sharded = None
        if mesh is not None:
            # /similar_items under the mesh: the train-item table row-shards
            # over all mesh axes and queries run through the exact per-shard
            # top-k + merge (retrieval/sharded.py).
            from hhrs_tpu.parallel.mesh import pad_to_shards, row_shardings

            _, row2d, _, _ = row_shardings(mesh)
            Nt = int(self._table_norm_train.shape[0])
            Ntp = pad_to_shards(Nt, mesh)
            tab = jax.device_put(
                jnp.pad(self._table_norm_train, ((0, Ntp - Nt), (0, 0))), row2d,
            )
            self._similar_sharded = (tab, Nt, tuple(mesh.axis_names))

        # recommended_by source: positive review rows in frame order,
        # pre-bucketed per item (deduped users, frame order preserved;
        # set-based dedup keeps the build O(rows)).
        pos_rows = main_df[main_df["rating_overall"] >= 8]
        self._pos_users_by_item: dict = {}
        seen_by_item: dict = {}
        for it, u in zip(
            pos_rows[schema.ITEM_COL].to_numpy().tolist(),
            pos_rows[schema.USER_COL].to_numpy().tolist(),
        ):
            seen = seen_by_item.setdefault(it, set())
            if u not in seen:
                seen.add(u)
                self._pos_users_by_item.setdefault(it, []).append(u)

        # Columnar payload fields (avoids per-request pandas .iloc).
        self._payload_city = items_df["city"].to_numpy(object)
        self._payload_price = items_df["price_rub"].to_numpy(np.float64)
        self._payload_stars = items_df["stars"].to_numpy(np.float64)

        self._cfg = bundle.model_cfg
        self._unknown_user = art.unknown_user_id
        self._user_map = art.user_id_mapping
        if self.use_pallas:
            # RETIRED (kernel honesty pass, RESULTS.md round 2): the fused
            # Pallas eval tower measured SLOWER than XLA end-to-end at both
            # reference scale (0.74x) and the scaled config (0.75x at
            # H=512, 98k rows) — XLA's own gather+tower fusion beats the
            # kernel composition, which must materialize x0 to HBM between
            # the gather half and the kernel. The kernel and its parity
            # tests remain in ops/pallas as the documented negative result.
            log.warning("use_pallas is retired (measured slower than XLA; "
                        "RESULTS.md round-2 kernel honesty pass) — jnp path used")
            self.use_pallas = False
        # City-bounded ranking: the candidate mask is built as
        # `... & city_item[city_idx]` (candidates.py), so candidates are
        # PROVABLY a subset of the request city's items — ranking only the
        # city's rows is exact, O(max city size) compute and D2H instead of
        # O(catalog) per request, and it vmaps (unlike the candidate_cap
        # lax.cond, whose batched lowering would pay both branches).
        # Disabled under a mesh: there the full-universe program row-shards
        # the item axis — which IS the mesh fast path — and arbitrary-row
        # gathers would insert collectives.
        W = int(self.gen.city_rows_np.shape[1])
        self._city_bounded = bool(city_bounded and mesh is None and W < self.gen._M)
        # width of the packed `order` section the host unpacks (_assemble)
        self._order_width = W if self._city_bounded else self.gen._M
        if self._city_bounded:
            self._dev["city_rows"] = jnp.asarray(self.gen.city_rows_np)
            self._recommend_jit = jax.jit(self._recommend_rows_impl)
            self._recommend_batch_jit = jax.jit(
                jax.vmap(
                    lambda dev, s, c, u, l: self._recommend_rows_impl(
                        dev, s, c, u, l, use_cap=False
                    ),
                    in_axes=(None, 0, 0, 0, 0),
                )
            )
        else:
            self._recommend_jit = jax.jit(self._recommend_impl)
            # Batched request program: one dispatch + ONE device→host
            # transfer for K coalesced requests (serve/batcher.py; the D2H
            # latency floor amortizes K-fold): vmap of the single-request
            # impl (the device state broadcasts via in_axes None so its
            # shardings hold). Full-universe only: vmapping the
            # candidate-cap cond would lower to select (both branches
            # execute) and cost full + capped.
            self._recommend_batch_jit = jax.jit(
                jax.vmap(
                    lambda dev, s, c, u, l: self._recommend_impl(
                        dev, s, c, u, l, use_cap=False
                    ),
                    in_axes=(None, 0, 0, 0, 0),
                )
            )

    # ------------------------------------------------------------------ #

    def _recommend_impl(self, dev, padded_sources, city_idx, user_internal, lam,
                        use_cap: bool = True):
        """The fused two-stage program: retrieval + rank + MMR. ``dev`` is
        the engine device state — an explicit argument so mesh shardings
        are respected (closed-over constants lose them).

        With ``serve.candidate_cap`` set, requests whose candidate set fits
        the cap take a compiled fast path that gathers and scores ONLY the
        candidate rows — O(cap) instead of O(catalog) ranking work (a 100k-
        item catalog costs ~100ms/request full-universe; typical candidate
        sets are a few hundred). The overflow branch is the exact full
        program, so semantics never change — `lax.cond` picks per request
        on device. The batched (vmapped) program always uses the full path:
        under vmap a cond lowers to both-branches + select, which would pay
        full + capped.
        """
        cand, _neg, count = self.gen._generate_impl(dev["gen"], padded_sources, city_idx)
        cap = self._cap
        if use_cap and 0 < cap < self.gen._M:
            M = self.gen._M
            return jax.lax.cond(
                count <= cap,
                lambda: self._rank_capped(dev, cand, count, user_internal, lam, M),
                lambda: self._rank_full(dev, cand, count, user_internal, lam),
            )
        return self._rank_full(dev, cand, count, user_internal, lam)

    def _rank_full(self, dev, cand, count, user_internal, lam):
        M = self.gen._M
        users = jnp.full((M,), user_internal, jnp.int32)
        logits, _ = apply_dcn(
            dev["params"],
            dev["bn_state"],
            users,
            dev["item_internal"],
            dev["X_cat"],
            dev["X_num"],
            cfg=self._cfg,
            train=False,
        )
        scores = jnp.where(cand, logits, NEG_INF)
        mmr_idx = mmr_rerank(
            scores,
            dev["emb_norm"],
            cand,
            dev["embedded"],
            lam,
            top_k=self.retrieval_cfg.mmr_top_k,
        )
        # Descending stable order computed on device so the host needs no
        # score transfer (parity with np.argsort(-scores, kind='stable')).
        order = jnp.argsort(-scores)
        # ONE packed int32 vector → one device→host transfer per request
        # (per-transfer overhead on the tunneled backend dwarfs the bytes).
        return jnp.concatenate([
            order.astype(jnp.int32),
            mmr_idx.astype(jnp.int32),
            count.astype(jnp.int32)[None],
        ])

    def _rank_capped(self, dev, cand, count, user_internal, lam, width):
        """Candidate-only ranking for a lax.cond fast branch: gather the
        ≤cap candidate rows via nonzero, rank in capped space, pad the
        order section back to ``width`` (the cond's shape contract with
        the other branch — M for the full program, W for the city-bounded
        one). The host reads only the first `count` order entries and the
        ≥0 MMR picks, so the padding never surfaces."""
        cap = self._cap
        idx = jnp.nonzero(cand, size=cap, fill_value=self.gen._M)[0]  # ascending
        packed = self._rank_rows(dev, cand, count, user_internal, lam, idx)
        order = jnp.zeros((width,), jnp.int32).at[:cap].set(packed[:cap])
        return jnp.concatenate([order, packed[cap:]])

    def _recommend_rows_impl(self, dev, padded_sources, city_idx, user_internal,
                             lam, use_cap: bool = True):
        """The city-bounded request program: retrieval over the full item
        axis (cheap masks), then ranking + MMR over ONLY the request
        city's rows — exact because candidates are a subset of the city's
        items by construction (candidates.py builds the mask as
        `... & city_item[city_idx]`). Packed output is [W + K + 1] with
        W = max city size, so the per-request D2H payload also drops from
        O(catalog) to O(W). With serve.candidate_cap < W, a lax.cond
        further restricts fitting requests to their nonzero candidate rows
        (single-request program only; under vmap cond pays both branches)."""
        cand, _neg, count = self.gen._generate_impl(dev["gen"], padded_sources, city_idx)
        C = len(self.gen.universe.cities)
        rows = dev["city_rows"][jnp.minimum(city_idx, C)]
        W = rows.shape[0]
        cap = self._cap
        if use_cap and 0 < cap < W:
            return jax.lax.cond(
                count <= cap,
                lambda: self._rank_capped(dev, cand, count, user_internal, lam, W),
                lambda: self._rank_rows(dev, cand, count, user_internal, lam, rows),
            )
        return self._rank_rows(dev, cand, count, user_internal, lam, rows)

    def _rank_rows(self, dev, cand, count, user_internal, lam, idx):
        """Ranking + MMR restricted to the rows ``idx`` (ascending serve
        indices, padded with Mp). Exact iff every candidate is in ``idx`` —
        callers pass either the request city's item rows (candidates are a
        subset by construction) or the nonzero(cand) rows. Returns a packed
        [len(idx) + K + 1] int32 vector; stable tie-breaks match the full
        program (idx ascending == serve-index ascending)."""
        Mp = self.gen._M
        K = self.retrieval_cfg.mmr_top_k
        Wr = idx.shape[0]
        safe = jnp.minimum(idx, Mp - 1).astype(jnp.int32)
        valid = jnp.logical_and(idx < Mp, cand[safe])
        users = jnp.full((Wr,), user_internal, jnp.int32)
        logits_c, _ = apply_dcn(
            dev["params"],
            dev["bn_state"],
            users,
            dev["item_internal"][safe],
            dev["X_cat"][safe],
            dev["X_num"][safe],
            cfg=self._cfg,
            train=False,
        )
        scores_c = jnp.where(valid, logits_c, NEG_INF)
        mmr_c = mmr_rerank(
            scores_c,
            dev["emb_norm"][safe],
            valid,
            jnp.logical_and(dev["embedded"][safe], valid),
            lam,
            top_k=K,
        )
        # row→serve index maps. Stable argsort ties break by row position
        # == ascending serve index, matching the full path.
        order_c = idx[jnp.argsort(-scores_c)].astype(jnp.int32)
        mmr_idx = jnp.where(
            mmr_c >= 0, idx[jnp.maximum(mmr_c, 0)].astype(jnp.int32), -1
        )
        return jnp.concatenate([
            order_c,
            mmr_idx.astype(jnp.int32),
            count.astype(jnp.int32)[None],
        ])

    # ------------------------------------------------------------------ #

    def _host_inputs(self, user_id: int, city: str, mode: str):
        uni = self.gen.universe
        return (
            self.gen.sources_for(user_id, mode, self.graph),
            uni.city_index.get(city, len(uni.cities)),
            self._user_map.get(user_id, self._unknown_user),
        )

    def _assemble(self, user_id: int, lambda_param: float, packed: np.ndarray) -> dict:
        """Host-side response assembly from one packed program output."""
        W = self._order_width
        order, mmr_idx, count = packed[:W], packed[W:-1], int(packed[-1])
        if count == 0:
            return {"ranked_hotels": [], "message": "No suitable candidates found."}

        if lambda_param < 1.0:
            ranked_serve_idx = mmr_idx[mmr_idx >= 0]
        else:
            ranked_serve_idx = order[:count]

        ranked_ext = self.gen.universe.item_ids[ranked_serve_idx]
        friends = set(self.graph.friends_of(user_id).tolist())
        response = [
            self._hotel_payload(int(si), int(ext), friends)
            for si, ext in zip(ranked_serve_idx, ranked_ext)
        ]
        return {"ranked_hotels": response}

    def recommend(self, user_id: int, city: str, mode: str = "friends",
                  lambda_param: float = 0.7) -> dict:
        t0 = time.perf_counter()
        sources, city_i, user_i = self._host_inputs(user_id, city, mode)
        packed = jax.device_get(
            self._recommend_jit(
                self._dev, jnp.asarray(sources), jnp.asarray(city_i, jnp.int32),
                jnp.asarray(user_i, jnp.int32), jnp.float32(lambda_param),
            )
        )  # ONE device→host transfer for the whole request
        out = self._assemble(user_id, lambda_param, packed)
        self.latency.observe(time.perf_counter() - t0)
        return out

    def recommend_many(self, requests: list, pad_to: int | None = None) -> list:
        """Batched requests: [(user_id, city, mode, lambda_param), …] →
        list of responses. One vmapped program dispatch + one D2H for the
        whole batch. ``pad_to`` fixes the program shape (the dynamic
        batcher always pads to its max_batch, so exactly ONE batched
        program ever compiles — XLA compiles cost minutes on the tunneled
        chip); otherwise the batch pads to a power-of-two bucket."""
        t0 = time.perf_counter()
        K = len(requests)
        if K == 0:
            return []
        if pad_to is not None and pad_to >= K:
            Kp = pad_to
        else:
            Kp = 1
            while Kp < K:
                Kp *= 2

        S = self.gen.max_sources
        sources = np.empty((Kp, S), np.int32)
        city_i = np.empty(Kp, np.int32)
        user_i = np.empty(Kp, np.int32)
        lam = np.empty(Kp, np.float32)
        for k, (u, c, mode, l) in enumerate(requests):
            sources[k], city_i[k], user_i[k] = self._host_inputs(u, c, mode)
            lam[k] = l
        if Kp > K:  # pad rows copy the last real row (no recompute)
            sources[K:] = sources[K - 1]
            city_i[K:] = city_i[K - 1]
            user_i[K:] = user_i[K - 1]
            lam[K:] = lam[K - 1]

        packed = jax.device_get(
            self._recommend_batch_jit(
                self._dev, jnp.asarray(sources), jnp.asarray(city_i),
                jnp.asarray(user_i), jnp.asarray(lam),
            )
        )
        dt = time.perf_counter() - t0
        out = []
        for k, (u, _c, _m, l) in enumerate(requests):
            out.append(self._assemble(u, l, packed[k]))
            self.latency.observe(dt)  # whole-batch wall time per request
        return out

    def _hotel_payload(self, serve_idx: int, ext_id: int, friends: set) -> dict:
        recommended_by = []
        if friends:
            recommended_by = [
                int(u) for u in self._pos_users_by_item.get(ext_id, ()) if u in friends
            ]
        city = self._payload_city[serve_idx]
        price = self._payload_price[serve_idx]
        stars = self._payload_stars[serve_idx]
        return {
            "hotel_id": ext_id,
            "city": None if pd.isna(city) else str(city),
            "price_rub": None if pd.isna(price) else float(price),
            "stars": None if pd.isna(stars) else float(stars),
            "recommended_by": recommended_by,
        }

    # ------------------------------------------------------------------ #

    def similar_items(self, item_id: int, n: int = 10) -> list | None:
        """Top-n similar items; None if the item is unknown (→ 404 upstream)."""
        internal = self.bundle.preproc.item_id_mapping.get(item_id)
        if internal is None:
            return None
        query = self._emb_train[internal][None, :]
        if self._similar_sharded is not None:
            from hhrs_tpu.retrieval.sharded import sharded_cosine_topk

            tab, Nt, axes = self._similar_sharded
            _, idx = sharded_cosine_topk(
                self.mesh, tab, query, n + 1, model_axis=axes, n_valid=Nt
            )
        else:
            _, idx = cosine_topk(self._table_norm_train, query, n + 1)
        neighbor_train_ids = np.asarray(idx)[0, 1:]  # drop first hit (self)
        return [
            int(self._reverse_item_map[t])
            for t in neighbor_train_ids.tolist()
            if t in self._reverse_item_map
        ]

    # ------------------------------------------------------------------ #

    @classmethod
    def from_dirs(cls, artifacts_dir: str, data_dir: str, retrieval_cfg=None,
                  use_pallas: bool = False, mesh=None, bf16: bool = False,
                  quantize_tables: bool = False,
                  candidate_cap: int = 0,
                  city_bounded: bool = True,
                  frames: tuple | None = None,
                  retrieval_embeddings_path: str | None = None) -> "RecommendationEngine":
        """Startup loader (reference load_artifacts, main.py:233-277).

        ``frames=(main_df, friendships)`` skips the CSV parse — the CLI
        loads the data ONCE and shares it across the primary/shadow/canary
        stacks (identical data_dir; parsing is seconds-to-minutes of
        startup each). The hot-reload pollers also pass frames — parsed
        from a consistent temp SNAPSHOT of possibly-refreshed data
        (serve/reload.py); ``frames=None`` reads the live files directly
        and is the simple path for tests/embedding."""
        import os

        bundle = load_artifact_bundle(artifacts_dir)
        if frames is not None:
            main_df, friendships = frames
        else:
            main_df = load_reviews_csv(os.path.join(data_dir, "hackathon_augmented_data.csv"))
            main_df = add_engineered_features(main_df)
            friendships = load_friendships_csv(os.path.join(data_dir, "friendships.csv"))
        retrieval_embeddings = None
        if retrieval_embeddings_path:
            import numpy as _np

            retrieval_embeddings = _np.load(retrieval_embeddings_path)
        eng = cls(bundle, main_df, friendships, retrieval_cfg, use_pallas=use_pallas,
                  mesh=mesh, bf16=bf16, quantize_tables=quantize_tables,
                  candidate_cap=candidate_cap, city_bounded=city_bounded,
                  retrieval_embeddings=retrieval_embeddings)
        # Which artifacts this engine serves — surfaced in /healthz and used
        # by the hot-reload poller (serve/reload.py) to detect changes.
        eng.artifacts_dir = artifacts_dir
        return eng

    def warmup(self, batch_pad: int | None = None) -> None:
        """Compile the request program(s) before accepting traffic —
        ``batch_pad`` also warms the batched shape the dynamic batcher
        uses. Warmup samples (dominated by XLA compile) must not pollute
        the latency histogram the /metrics endpoint reports."""
        uni = self.gen.universe
        if uni.n_users and len(uni.cities):
            self.recommend(int(uni.user_ids[0]), uni.cities[0], "friends", 0.7)
            self.recommend(int(uni.user_ids[0]), uni.cities[0], "personal", 1.0)
            if batch_pad:
                self.recommend_many(
                    [(int(uni.user_ids[0]), uni.cities[0], "friends", 0.7)],
                    pad_to=batch_pad,
                )
        self.latency = LatencyHistogram()
