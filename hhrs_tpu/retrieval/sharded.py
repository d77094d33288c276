"""Sharded similarity retrieval: row-sharded item table, per-shard top-k,
global merge (SURVEY.md §7.6 — the scaled-catalog configuration).

At reference scale the item table is a single matmul (retrieval/similarity);
at production scale the catalog shards its row axis over the ``model`` mesh
axis. The exact-top-k identity used here: global top-k over N rows equals
top-k over the union of each shard's local top-k (k per shard) — so each
shard computes a [Q, N/m] score panel (MXU) and a local ``lax.top_k``, only
[m, Q, k] scores/indices ever cross the interconnect, and a final top-k
merges them. Bandwidth is O(m·Q·k) instead of O(Q·N).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hhrs_tpu.retrieval.similarity import normalize_rows


def sharded_cosine_topk(
    mesh: Mesh,
    table_norm: jnp.ndarray,  # [N, d], L2-normalized, N divisible by the shard axes
    queries: jnp.ndarray,  # [Q, d] raw
    k: int,
    model_axis: str | tuple = "model",
    n_valid: int | None = None,
):
    """Exact top-k over a row-sharded table. Returns (scores, idx) [Q, k],
    identical (up to tie order) to cosine_topk on the unsharded table.
    ``model_axis`` may be a tuple of mesh axes (e.g. all serve-mesh axes
    flat) — the table then shards over their product. ``n_valid`` masks
    padding rows (global index >= n_valid scores -inf), so a table padded
    up to the shard count stays exact."""
    import math

    if isinstance(model_axis, tuple):
        m = math.prod(mesh.shape[a] for a in model_axis)
    else:
        m = mesh.shape[model_axis]
    rows_per = table_norm.shape[0] // m
    # Each shard can contribute at most its own rows_per candidates; the
    # global merge over m·k_local per-shard candidates is still exact top-k
    # whenever m·k_local >= k (each true top-k row is its shard's local
    # top-min(k, rows_per)).
    k_local = min(k, rows_per)
    if m * k_local < k:
        raise ValueError(
            f"top-k {k} impossible: table has {table_norm.shape[0]} rows "
            f"({rows_per} per shard x {m} shards = {m * rows_per} candidates)"
        )
    q = normalize_rows(queries)

    def shard_index():
        if isinstance(model_axis, tuple):  # row-major linearized multi-axis index
            idx = jax.lax.axis_index(model_axis[0])
            for a in model_axis[1:]:
                idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
            return idx
        return jax.lax.axis_index(model_axis)

    def local_topk(table_local, q_rep):
        sims = jnp.dot(q_rep, table_local.T, preferred_element_type=jnp.float32)
        offset = shard_index() * rows_per
        if n_valid is not None:
            gidx = offset + jnp.arange(rows_per)
            sims = jnp.where((gidx < n_valid)[None, :], sims, -jnp.inf)
        vals, idx = jax.lax.top_k(sims, k_local)  # [Q, k_local] local
        return vals[None], (idx + offset)[None]  # leading shard axis for the merge

    # Per-shard candidates come back sharded over the model axis; the merge
    # below is a plain (auto-sharded) top-k over m·k candidates per query.
    vals_s, idx_s = shard_map(
        local_topk,
        mesh=mesh,
        in_specs=(P(model_axis, None), P(None, None)),
        out_specs=(P(model_axis, None, None), P(model_axis, None, None)),
    )(table_norm, q)

    Q = q.shape[0]
    all_vals = jnp.swapaxes(vals_s, 0, 1).reshape(Q, m * k_local)
    all_idx = jnp.swapaxes(idx_s, 0, 1).reshape(Q, m * k_local)
    best_vals, best_pos = jax.lax.top_k(all_vals, k)
    best_idx = jnp.take_along_axis(all_idx, best_pos, axis=1)
    return best_vals, best_idx


def make_sharded_topk_fn(mesh: Mesh, k: int, model_axis: str | tuple = "model",
                         n_valid: int | None = None):
    """Jitted closure with the table placed row-sharded on the mesh.
    ``n_valid`` MUST be passed whenever the table was padded up to the
    shard count (pad_to_shards) — otherwise zero-vector padding rows
    (cosine 0.0) would beat any true all-negative neighborhood."""
    from jax.sharding import NamedSharding

    table_sharding = NamedSharding(mesh, P(model_axis, None))

    @partial(jax.jit, static_argnames=())
    def fn(table_norm, queries):
        return sharded_cosine_topk(mesh, table_norm, queries, k, model_axis,
                                   n_valid=n_valid)

    return fn, table_sharding
