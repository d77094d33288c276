"""Social graph: friend lookup as padded adjacency.

Replaces the reference's per-request pandas scans over friendships.csv
(reference main.py:172-178) with a prebuilt undirected adjacency. External
friend ids are kept for response assembly ('recommended_by'); serve-user
indices (positions in the review table's user vocabulary) drive the
on-device candidate masks.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd


@dataclass
class FriendGraph:
    # ext user id -> np.ndarray of ext friend ids (union over both columns)
    adjacency_ext: dict
    # ext user id -> np.ndarray of serve-user indices (friends present in reviews)
    adjacency_idx: dict
    max_degree: int

    @classmethod
    def from_pairs(cls, friendships: pd.DataFrame, serve_user_index: dict) -> "FriendGraph":
        adj_ext: dict = {}
        a = friendships["user_id_1"].to_numpy()
        b = friendships["user_id_2"].to_numpy()
        for x, y in zip(a, b):
            adj_ext.setdefault(int(x), set()).add(int(y))
            adj_ext.setdefault(int(y), set()).add(int(x))
        adjacency_ext = {}
        adjacency_idx = {}
        max_deg = 1
        for u, friends in adj_ext.items():
            fr = np.fromiter(friends, dtype=np.int64)
            adjacency_ext[u] = fr
            idx = np.asarray(
                [serve_user_index[f] for f in fr if f in serve_user_index], dtype=np.int32
            )
            adjacency_idx[u] = idx
            max_deg = max(max_deg, len(idx))
        return cls(adjacency_ext=adjacency_ext, adjacency_idx=adjacency_idx, max_degree=max_deg)

    def friends_of(self, user_id: int) -> np.ndarray:
        """External ids of the user's friends (reference main.py:172-178)."""
        return self.adjacency_ext.get(int(user_id), np.empty(0, np.int64))

    def friend_indices(self, user_id: int) -> np.ndarray:
        return self.adjacency_idx.get(int(user_id), np.empty(0, np.int32))

    def padded_friend_indices(self, user_id: int, pad: int, dump: int) -> np.ndarray:
        """Fixed-width friend index list; unused slots point at `dump`
        (a scatter slot past the last real user, dropped on device).

        Raises rather than truncate: dropping overflow friends would
        silently lose their positives AND negatives (the reference uses
        ALL friends, main.py:172-178). Callers size `pad` from
        `max_degree` (serve/engine.py does)."""
        idx = self.friend_indices(user_id)
        if len(idx) > pad:
            raise ValueError(
                f"user {user_id} has {len(idx)} friends > source width {pad}; "
                f"size max_sources from graph.max_degree ({self.max_degree})"
            )
        out = np.full(pad, dump, dtype=np.int32)
        out[: len(idx)] = idx
        return out
