"""On-device hybrid candidate generation.

The TPU-native replacement for the reference's per-request pandas set
algebra (reference main.py:181-212). Exact semantics preserved:

  1. source reviews = friends' rows (mode 'friends') or the user's own rows
     (mode 'personal') over the UNFILTERED serve dataframe;
  2. positives = items those sources rated >= 8; negatives = items rated <= 4;
  3. each positive with a trained embedding is expanded with its 10 nearest
     cosine neighbors (drop-first-hit semantics, main.py:200-203);
  4. if fewer than 20 candidates so far, the top-100 rows of the target city
     by user_reviews_count are unioned in (main.py:204-207);
  5. intersect with the target city's items, subtract negatives.

Everything is a fixed-shape masked computation over the serve-item universe
(all M items appearing in the serve CSV): friend ids scatter into a user
mask, review rows segment-scatter into item masks, the kNN expansion is one
precomputed [M, 10] gather + scatter-max, and the popularity fallback is a
`jnp.where` on the candidate count. One jitted program, zero host round
trips, no dynamic shapes.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from hhrs_tpu.config import RetrievalConfig
from hhrs_tpu.data import schema
from hhrs_tpu.retrieval.similarity import build_neighbor_table


@dataclass
class ServeUniverse:
    """Host-side vocabularies of the serve dataset (unfiltered CSV)."""

    item_ids: np.ndarray  # [M] external ids, order of first appearance
    user_ids: np.ndarray  # [U] external ids
    cities: list  # [C] city names
    item_index: dict  # ext item -> 0..M-1
    user_index: dict  # ext user -> 0..U-1
    city_index: dict  # name -> 0..C-1

    @property
    def n_items(self) -> int:
        return len(self.item_ids)

    @property
    def n_users(self) -> int:
        return len(self.user_ids)

    @classmethod
    def from_df(cls, main_df: pd.DataFrame) -> "ServeUniverse":
        item_ids = main_df[schema.ITEM_COL].drop_duplicates().to_numpy()
        user_ids = main_df[schema.USER_COL].drop_duplicates().to_numpy()
        cities = list(pd.unique(main_df["city"].dropna()))
        try:
            item_index = {int(v): i for i, v in enumerate(item_ids)}
            user_index = {int(v): i for i, v in enumerate(user_ids)}
        except (TypeError, ValueError) as e:
            # fail at startup with the real reason: the REST contract types
            # user_id/hotel_id as integers (serve/schemas.py; reference
            # main.py:23-47), so non-integral ids in the serve CSV can
            # never be requested or returned — surface that instead of a
            # bare int() traceback
            raise ValueError(
                "serve data contains non-integral user/item ids "
                f"({e}); the REST contract types ids as integers"
            ) from e
        return cls(
            item_ids=item_ids,
            user_ids=user_ids,
            cities=cities,
            item_index=item_index,
            user_index=user_index,
            city_index={c: i for i, c in enumerate(cities)},
        )


class CandidateGenerator:
    """Builds device-resident masks/tables once; serves fixed-shape queries.

    With ``mesh`` the per-item state (masks, kNN table, review arrays) pads
    to the mesh size and shards over ALL mesh axes flat — the serve path's
    "large axis" is the item axis (SURVEY.md §5), and the jitted program
    consumes the state as an explicit argument so the shardings are
    respected (a closed-over constant loses them)."""

    def __init__(
        self,
        main_df: pd.DataFrame,
        item_id_mapping: dict,  # train vocab: ext item -> train internal
        item_embeddings: np.ndarray,  # [n_train, emb]
        cfg: RetrievalConfig | None = None,
        max_sources: int = 256,
        universe: ServeUniverse | None = None,
        mesh=None,
    ):
        self.cfg = cfg or RetrievalConfig()
        self.universe = universe if universe is not None else ServeUniverse.from_df(main_df)
        uni = self.universe
        M, U, C = uni.n_items, uni.n_users, len(uni.cities)
        self.max_sources = max_sources
        self.mesh = mesh

        # --- review arrays (length R) ---
        r_user = main_df[schema.USER_COL].map(uni.user_index).to_numpy(np.int32)
        r_item = main_df[schema.ITEM_COL].map(uni.item_index).to_numpy(np.int32)
        r_rating = main_df["rating_overall"].to_numpy(np.float32)

        # --- serve item -> train internal id (+validity) ---
        s2t = np.zeros(M, np.int32)
        s2t_valid = np.zeros(M, bool)
        for ext, si in uni.item_index.items():
            ti = item_id_mapping.get(ext)
            if ti is not None:
                s2t[si] = ti
                s2t_valid[si] = True
        self.s2t_np = s2t
        self.s2t_valid_np = s2t_valid

        # --- kNN expansion table in serve-item space: [M, expand] ---
        n_train = item_embeddings.shape[0]
        nbr_train = build_neighbor_table(item_embeddings, self.cfg.expand_neighbors)
        # train internal -> serve index (every train item exists in the serve
        # universe since the train vocab is a filtered subset of the CSV)
        reverse = {v: k for k, v in item_id_mapping.items()}
        # slot n_train is the dump for build_neighbor_table's tiny-catalog
        # padding (neighbor index n_train → serve dump M)
        t2s = np.full(n_train + 1, M, np.int32)  # M = dump slot
        # PHANTOM neighbors: train items absent from the serve frame (a
        # refreshed serve CSV). They can never be candidates, but the
        # reference counts their ext ids in candidate_hotels BEFORE the
        # <min_candidates popularity-fallback check (main.py:196-207 — the
        # city intersection that drops them comes later), so each absent
        # train item gets a GHOST id counted toward the threshold. G=0
        # whenever serve data ⊇ train vocab (the common case).
        t2ghost = np.full(n_train + 1, 0, np.int32)
        n_ghosts = 0
        for ti in range(n_train):
            ext = reverse.get(ti)
            if ext is not None and ext in uni.item_index:
                t2s[ti] = uni.item_index[ext]
            else:
                t2ghost[ti] = n_ghosts
                n_ghosts += 1
        self.n_ghosts = G = n_ghosts
        t2ghost = np.where(t2s[: n_train + 1] == M, t2ghost, G)
        t2ghost[n_train] = G  # padding slot is never a phantom
        nbr_serve_by_train = t2s[nbr_train]  # [n_train, expand]
        ghost_by_train = t2ghost[nbr_train]  # [n_train, expand], G = dump
        nbr_by_serve = np.full((M, self.cfg.expand_neighbors), M, np.int32)
        nbr_by_serve[s2t_valid] = nbr_serve_by_train[s2t[s2t_valid]]
        ghost_by_serve = np.full((M, self.cfg.expand_neighbors), G, np.int32)
        ghost_by_serve[s2t_valid] = ghost_by_train[s2t[s2t_valid]]
        self.nbr_by_serve_np = nbr_by_serve

        # --- per-city masks: membership + popularity fallback pool.
        # Built in O(R log R), not O(C·R): one vectorized scatter for
        # membership, one stable argsort + searchsorted split for the
        # per-city row groups (identical rows/order to the per-city
        # nonzero scans this replaces — stable sort keeps frame order
        # within a city, which the top-100 tie-break depends on).
        city_item_mask = np.zeros((C + 1, M), bool)  # last row = unknown city
        city_pop_mask = np.zeros((C + 1, M), bool)
        counts = main_df["user_reviews_count"].to_numpy(np.float64)
        city_codes = main_df["city"].map(uni.city_index).fillna(C).to_numpy(np.int32)
        city_item_mask[city_codes, r_item] = True
        city_item_mask[C] = False  # NaN-city rows never form a servable city
        row_order = np.argsort(city_codes, kind="stable")
        bounds = np.searchsorted(city_codes[row_order], np.arange(C + 1))
        for c in range(C):
            rows = row_order[bounds[c]: bounds[c + 1]]
            top_rows = rows[np.argsort(-counts[rows], kind="stable")[: self.cfg.popular_pool]]
            city_pop_mask[c, r_item[top_rows]] = True

        # --- pad to the mesh size (uneven explicit shardings are not
        #     supported by device_put) and build the device state dict ---
        from hhrs_tpu.parallel.mesh import pad_to_shards

        Mp = pad_to_shards(M, mesh)
        R = len(r_user)
        Rp = pad_to_shards(R, mesh)
        self._M_real = M
        self._M = Mp  # program-space item axis (padded rows never candidates)
        self._U = U

        # dump slot moves from M to Mp; padded kNN rows point at the dump
        nbr = np.where(nbr_by_serve == M, Mp, nbr_by_serve)
        nbr = np.concatenate(
            [nbr, np.full((Mp - M, self.cfg.expand_neighbors), Mp, np.int32)]
        )
        ghost_nbr = np.concatenate(
            [ghost_by_serve,
             np.full((Mp - M, self.cfg.expand_neighbors), G, np.int32)]
        )
        # padded review rows: user 0 but neither positive nor negative → inert
        r_pad = Rp - R
        host = {
            "r_user": np.concatenate([r_user, np.zeros(r_pad, np.int32)]),
            "r_item": np.concatenate([r_item, np.zeros(r_pad, np.int32)]),
            "r_pos": np.concatenate([r_rating >= 8.0, np.zeros(r_pad, bool)]),
            "r_neg": np.concatenate([r_rating <= 4.0, np.zeros(r_pad, bool)]),
            "s2t_valid": np.concatenate([s2t_valid, np.zeros(Mp - M, bool)]),
            "nbr": nbr,
            "ghost_nbr": ghost_nbr,
            "city_item": np.pad(city_item_mask, ((0, 0), (0, Mp - M))),
            "city_pop": np.pad(city_pop_mask, ((0, 0), (0, Mp - M))),
        }
        # --- per-city item-row table (ascending serve indices, Mp-padded).
        # The final intersection in _generate_impl makes every candidate a
        # subset of city_item[city_idx], so a request's ranking work is
        # bounded by its city's item count — the serve engine exploits this
        # with an EXACT city-bounded program (engine._rank_rows) that is
        # O(max city size) instead of O(catalog). Width rounds up for
        # compile-shape stability across restarts with similar catalogs.
        cc, items_in_city = np.nonzero(city_item_mask)  # row-major → per-city ascending
        city_counts = np.bincount(cc, minlength=C + 1)
        maxc = int(city_counts.max()) if city_counts.size else 0
        from hhrs_tpu.utils.shapes import round_up

        W = min(Mp, max(64, round_up(maxc, 64)))
        city_rows = np.full((C + 1, W), Mp, np.int32)
        starts = np.concatenate([[0], np.cumsum(city_counts)[:-1]])
        city_rows[cc, np.arange(len(cc)) - starts[cc]] = items_in_city
        self.city_rows_np = city_rows
        self.max_city_items = maxc

        # ONE batched device_put for the whole state dict (per-array puts
        # each pay the tunneled backend's fixed per-call latency — the same
        # lesson as the trainer's batched epoch upload; device_put
        # canonicalizes dtypes exactly like jnp.asarray under x64=off).
        if mesh is None:
            self.dev = jax.device_put(host)
        else:
            from hhrs_tpu.parallel.mesh import row_shardings

            row1, row2, by_col, _ = row_shardings(mesh)
            sh = {
                "r_user": row1, "r_item": row1, "r_pos": row1, "r_neg": row1,
                "s2t_valid": row1, "nbr": row2, "ghost_nbr": row2,
                "city_item": by_col, "city_pop": by_col,
            }
            self.dev = jax.device_put(host, sh)

        self._generate = jax.jit(self._generate_impl)

    # ------------------------------------------------------------------ #

    def _generate_impl(self, dev: dict, padded_sources: jnp.ndarray, city_idx: jnp.ndarray):
        """padded_sources: [max_sources] serve-user indices (dump = U).
        Returns (cand_mask [M], neg_mask [M], count). ``dev`` is the device
        state from __init__ (explicit argument so mesh shardings hold)."""
        M, U = self._M, self._U
        user_mask = jnp.zeros(U + 1, bool).at[padded_sources].set(True)[:U]

        row_sel = user_mask[dev["r_user"]]
        pos_rows = row_sel & dev["r_pos"]
        neg_rows = row_sel & dev["r_neg"]
        pos_mask = jnp.zeros(M, bool).at[dev["r_item"]].max(pos_rows)
        neg_mask = jnp.zeros(M, bool).at[dev["r_item"]].max(neg_rows)

        # kNN expansion of positives that have trained embeddings
        contrib = pos_mask & dev["s2t_valid"]  # [M]
        expanded = (
            jnp.zeros(M + 1, bool)
            .at[dev["nbr"]]
            .max(jnp.broadcast_to(contrib[:, None], dev["nbr"].shape))[:M]
        )

        cand = pos_mask | expanded
        # phantom neighbors (train items absent from the serve frame) count
        # toward the reference's <min_candidates check as UNIQUE ext ids
        # (set semantics — one ghost slot per absent train item) though
        # they can never be candidates
        ghosts = (
            jnp.zeros(self.n_ghosts + 1, bool)
            .at[dev["ghost_nbr"]]
            .max(jnp.broadcast_to(contrib[:, None], dev["ghost_nbr"].shape))[: self.n_ghosts]
        )
        count_before = jnp.sum(cand) + jnp.sum(ghosts)
        pop = dev["city_pop"][city_idx]
        cand = cand | ((count_before < self.cfg.min_candidates) & pop)

        cand = cand & dev["city_item"][city_idx] & ~neg_mask
        return cand, neg_mask, jnp.sum(cand)

    # ------------------------------------------------------------------ #

    def sources_for(self, user_id: int, mode: str, friend_graph) -> np.ndarray:
        """Host-side source selection → padded serve-user index vector."""
        U = self._U
        if mode == "friends":
            return friend_graph.padded_friend_indices(user_id, self.max_sources, dump=U)
        out = np.full(self.max_sources, U, np.int32)
        own = self.universe.user_index.get(int(user_id))
        if own is not None:
            out[0] = own
        return out

    def generate(self, user_id: int, city: str, mode: str, friend_graph) -> tuple:
        """Full candidate generation → (cand_mask [M_real] np.bool_, count int)."""
        sources = jnp.asarray(self.sources_for(user_id, mode, friend_graph))
        city_idx = jnp.asarray(
            self.universe.city_index.get(city, len(self.universe.cities)), jnp.int32
        )
        cand, _neg, count = self._generate(self.dev, sources, city_idx)
        return np.asarray(cand)[: self._M_real], int(count)
