"""Item-embedding similarity: exact brute-force cosine top-k on device.

The reference uses sklearn NearestNeighbors(metric='cosine',
algorithm='brute') over the trained item table (reference main.py:268-270).
On TPU the same exact computation is a normalized matmul (MXU) followed by
``jax.lax.top_k`` — no index structure needed at these catalog sizes, and
the whole query batch runs in one fused program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def normalize_rows(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


@partial(jax.jit, static_argnames=("k",))
def cosine_topk(table_norm: jnp.ndarray, queries: jnp.ndarray, k: int):
    """Top-k cosine neighbors of each query row against a pre-normalized table.

    table_norm: [N, d] L2-normalized. queries: [Q, d] (raw; normalized here).
    Returns (scores [Q, k], indices [Q, k]) sorted descending.
    """
    q = normalize_rows(queries)
    sims = jnp.dot(q, table_norm.T, preferred_element_type=jnp.float32)  # [Q, N]
    return jax.lax.top_k(sims, k)


def build_neighbor_table(embeddings: np.ndarray, k: int, batch: int = 1024) -> np.ndarray:
    """All-pairs neighbor table: for each item, its top-k neighbors
    *excluding the first hit* (the reference drops element 0 of the kNN
    result assuming it is self — main.py:201,301 — we reproduce that exact
    drop-first semantics). Returns [N, k] int32 indices.

    Catalogs with ≤ k items (or none) can't supply k+1 hits — lax.top_k
    would reject k+1 > N at engine STARTUP (the reference only failed
    lazily per request); the short columns pad with N, the caller's dump
    slot (candidates.py maps N → the inert Mp row)."""
    emb = jnp.asarray(embeddings, jnp.float32)
    n = int(emb.shape[0])
    if n == 0:
        return np.zeros((0, k), np.int32)
    kk = min(k + 1, n)
    table_norm = normalize_rows(emb)
    # Chunks accumulate ON DEVICE and ship in ONE D2H at the end: the old
    # per-chunk np.asarray paid a full tunnel round trip per 1024 rows
    # (~98 transfers at a 100k catalog — seconds of engine build/reload
    # time), and the unjitted per-chunk program re-dispatched op-by-op.
    # The last chunk pads to the common shape so ONE compiled program
    # serves every chunk.
    topk_idx = jax.jit(lambda q: cosine_topk(table_norm, q, kk)[1])
    n_pad = (-n) % batch
    emb_p = jnp.pad(emb, ((0, n_pad), (0, 0))) if n_pad else emb
    chunks = [topk_idx(emb_p[s:s + batch])
              for s in range(0, n + n_pad, batch)]
    idx = jnp.concatenate(chunks, axis=0)[:n, 1:]
    table = np.asarray(idx).astype(np.int32)
    if table.shape[1] < k:  # tiny catalog: pad missing neighbors with N
        pad = np.full((n, k - table.shape[1]), n, np.int32)
        table = np.concatenate([table, pad], axis=1)
    return table
