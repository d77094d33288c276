"""Row-sharded embedding lookups with explicit collectives (shard_map).

The reference's embedding lookups are single-device ``nn.Embedding`` calls
(reference train.py:156-158). At production scale the tables are the only
large state in this model family, so they live row-sharded across the
``model`` mesh axis. Two hand-written exchange strategies:

  * ``psum_lookup`` — every model shard gathers the rows it owns (masked)
    and the partial results are psum-reduced. Bandwidth: B·D per shard pair,
    i.e. the reduction moves m·B·D total. Simple, latency-optimal for small
    batches; this is also essentially what XLA generates for a pjit gather
    from a row-sharded table.

  * ``all_to_all_lookup`` — the classic two-hop ID/vector exchange: the ID
    vector is sharded over the model axis too, each shard buckets its IDs by
    owning shard, ``all_to_all`` sends IDs to their owners, owners gather
    locally, a second ``all_to_all`` returns the vectors; the result stays
    sharded over both axes. Traffic honesty: XLA's untyped all_to_all needs
    STATIC bucket shapes, and this implementation sizes every bucket at the
    worst case (capacity b = all local ids owned by one shard), so its
    wire bytes are the same m·B·D as the psum variant — what it avoids is
    the psum's m-fold [B, D] compute/reduction work per shard and its
    result replication (the output here stays sharded over both axes).
    A bandwidth-optimal exchange needs skew-bounded buckets (capacity
    ≈ B/m with load balancing) — noted as the production extension for
    tables too big for this; the exactness contract below is why the
    worst-case capacity is the default.

Both are exact: they produce bit-identical results to an unsharded
``table[ids]`` gather (tests/test_parallel.py asserts this on an 8-device
CPU mesh) — for ids in ``[0, rows)``. Out-of-range ids are a caller bug
and the three paths (unsharded clamp, psum zeros, all_to_all clamped row)
intentionally do NOT agree on them.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pad_table(table: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Pad the row axis up to a multiple of ``n_shards`` (shard_map needs
    even splits; pjit/GSPMD pads internally but shard_map does not)."""
    rows = table.shape[0]
    pad = (-rows) % n_shards
    if pad == 0:
        return table
    return jnp.pad(table, ((0, pad), (0, 0)))


def psum_lookup(mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray,
                model_axis: str = "model", data_axis: str = "data") -> jnp.ndarray:
    """Masked-gather + psum row-sharded lookup.

    table: [R, D] sharded P(model, None) (R must divide the model axis;
    use ``pad_table``). ids: [B] sharded P(data). Returns [B, D] P(data, None).
    """

    def f(table_local, ids_local):
        rows_per = table_local.shape[0]
        start = jax.lax.axis_index(model_axis) * rows_per
        local = ids_local - start
        owned = (local >= 0) & (local < rows_per)
        emb = table_local[jnp.clip(local, 0, rows_per - 1)]
        emb = jnp.where(owned[:, None], emb, 0)
        return jax.lax.psum(emb, model_axis)

    return shard_map(
        f,
        mesh=mesh,
        in_specs=(P(model_axis, None), P(data_axis)),
        out_specs=P(data_axis, None),
    )(table, ids)


def all_to_all_lookup(mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray,
                      model_axis: str = "model", data_axis: str = "data") -> jnp.ndarray:
    """Two-hop all-to-all ID/vector exchange lookup.

    table: [R, D] sharded P(model, None); ids: [B] sharded over BOTH axes
    P((data, model)) — each device owns B/(d·m) lookups. Returns [B, D]
    sharded P((data, model), None).
    """
    m = mesh.shape[model_axis]

    def f(table_local, ids_local):
        rows_per = table_local.shape[0]
        b = ids_local.shape[0]
        owner = jnp.clip(ids_local // rows_per, 0, m - 1)  # [b]

        # Deterministic bucketing with static capacity b (worst case: every
        # local id owned by one shard). one_hot is [b, m] — tiny.
        oh = jax.nn.one_hot(owner, m, dtype=jnp.int32)
        rank = (jnp.cumsum(oh, axis=0) * oh).sum(axis=1) - 1  # [b] pos in bucket

        send_ids = jnp.zeros((m, b), jnp.int32).at[owner, rank].set(ids_local - owner * rows_per)
        send_valid = jnp.zeros((m, b), jnp.bool_).at[owner, rank].set(True)

        # Hop 1: ids travel to their owning shard.
        recv_ids = jax.lax.all_to_all(send_ids, model_axis, 0, 0, tiled=False)
        recv_valid = jax.lax.all_to_all(send_valid, model_axis, 0, 0, tiled=False)

        served = table_local[jnp.clip(recv_ids, 0, rows_per - 1)]  # [m, b, D]
        served = jnp.where(recv_valid[:, :, None], served, 0)

        # Hop 2: vectors travel back to the requesting shard.
        back = jax.lax.all_to_all(served, model_axis, 0, 0, tiled=False)  # [m, b, D]
        return back[owner, rank]  # [b, D]

    return shard_map(
        f,
        mesh=mesh,
        in_specs=(P(model_axis, None), P((data_axis, model_axis))),
        out_specs=P((data_axis, model_axis), None),
    )(table, ids)


def capped_all_to_all_lookup(
    mesh: Mesh,
    table: jnp.ndarray,
    ids: jnp.ndarray,
    capacity_factor: float = 1.25,
    model_axis: str = "model",
    data_axis: str = "data",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Skew-BOUNDED two-hop exchange: capacity ``c = ceil(b/m ·
    capacity_factor)`` ids per (source, destination) pair instead of the
    exact variant's worst-case ``b``.

    This is the bandwidth-optimal production form ``all_to_all_lookup``'s
    docstring promises: wire bytes drop from ``m·b·(4 + D·4)`` per shard to
    ``≈ b·capacity_factor·(4 + D·4)`` — an ``m/capacity_factor``× cut (6.4×
    on an 8-way model axis at factor 1.25), visible directly in the
    compiled HLO's all-to-all operand shapes (tests/test_parallel.py).

    The trade, exactly as in production TPU embedding systems (DLRM-class
    trainers, MoE token routing): ids beyond a bucket's capacity are
    DROPPED — their output row is 0 — so this is an opt-in approximation
    for skew-tolerant workloads, never a silent default. Returns
    ``(vectors [B, D], dropped [B] bool mask)`` so callers can count/log
    the overflow rate; with uniformly-hashed ids at factor ≥1.25 overflow
    is rare, and ``capacity_factor = m`` recovers the exact variant.
    """
    m = mesh.shape[model_axis]

    def f(table_local, ids_local):
        rows_per = table_local.shape[0]
        b = ids_local.shape[0]
        # ceil(b/m · factor), matching the docstring's formula exactly —
        # flooring the product would under-provision fractional capacities
        c = min(b, max(1, math.ceil(b / m * capacity_factor)))
        owner = jnp.clip(ids_local // rows_per, 0, m - 1)  # [b]

        oh = jax.nn.one_hot(owner, m, dtype=jnp.int32)
        rank = (jnp.cumsum(oh, axis=0) * oh).sum(axis=1) - 1  # [b] pos in bucket
        kept = rank < c

        # mode='drop': scatter indices with rank >= c fall out of bounds on
        # the capacity axis and are dropped — the capacity bound itself.
        send_ids = jnp.zeros((m, c), jnp.int32).at[owner, rank].set(
            ids_local - owner * rows_per, mode="drop")
        send_valid = jnp.zeros((m, c), jnp.bool_).at[owner, rank].set(
            True, mode="drop")

        recv_ids = jax.lax.all_to_all(send_ids, model_axis, 0, 0, tiled=False)
        recv_valid = jax.lax.all_to_all(send_valid, model_axis, 0, 0, tiled=False)

        served = table_local[jnp.clip(recv_ids, 0, rows_per - 1)]  # [m, c, D]
        served = jnp.where(recv_valid[:, :, None], served, 0)

        back = jax.lax.all_to_all(served, model_axis, 0, 0, tiled=False)
        out = back[owner, jnp.clip(rank, 0, c - 1)]  # [b, D]
        out = jnp.where(kept[:, None], out, 0)
        return out, ~kept

    return shard_map(
        f,
        mesh=mesh,
        in_specs=(P(model_axis, None), P((data_axis, model_axis))),
        out_specs=(P((data_axis, model_axis), None), P((data_axis, model_axis))),
    )(table, ids)


def explicit_x0(
    mesh: Mesh,
    params: dict,
    user_ids: jnp.ndarray,
    item_ids: jnp.ndarray,
    cat_features: jnp.ndarray,
    num_features: jnp.ndarray,
    *,
    kind: str = "all_to_all",
    capacity_factor: float = 1.25,
    model_axis: str = "model",
    data_axis: str = "data",
):
    """Assemble the DCN-R input ``x0`` with EXPLICIT exchange lookups.

    The GSPMD default (``models.dcn.apply_dcn``) writes ``table[ids]``
    global-view and trusts XLA to lower the row-sharded gather to
    collectives — verified by the HLO assertions in
    tests/test_hlo_lowering.py. This is the hand-written fallback/north-star
    form (SURVEY.md §2 parallelism row: "row-sharded embedding tables with
    all-to-all ID exchange"): each table that is actually row-sharded
    (rows divide the model axis — the same rule ``parallel.sharding.
    param_shardings`` uses) goes through the explicit shard_map exchange;
    replicated tiny tables (uneven categorical vocabularies) use a local
    gather. Differentiable: the exchange transposes to a scatter-add onto
    the owning shard, so table gradients stay sharded.

    kind: 'all_to_all' (two-hop ID/vector exchange), 'psum'
    (masked-gather + reduction), or 'capped' (skew-bounded two-hop,
    ``capacity_factor`` ids per shard pair — the bandwidth-optimal
    production form; see ``capped_all_to_all_lookup``).

    Return: ``x0`` for the exact kinds; ``(x0, overflow)`` for 'capped',
    where ``overflow`` is ``int32[2] = (dropped, total)`` id-instances
    summed over every row-sharded lookup in this batch — the trainer logs
    the per-epoch drop rate from it (an id dropped by the cap contributes
    a ZERO embedding block to its x0 row and zero gradient to its table
    row; the quality trade is documented in docs/MODEL.md).
    """
    if kind not in ("all_to_all", "psum", "capped"):
        raise ValueError(
            f"unknown exchange kind {kind!r}; expected 'all_to_all', "
            "'psum' or 'capped'"
        )
    capped = kind == "capped"
    lookup = all_to_all_lookup if kind == "all_to_all" else psum_lookup
    m = mesh.shape.get(model_axis, 1)
    dropped_counts = []
    total = 0

    def one(table, ids):
        nonlocal total
        if m > 1 and table.shape[0] % m == 0:
            if capped:
                vec, dropped = capped_all_to_all_lookup(
                    mesh, table, ids, capacity_factor, model_axis, data_axis)
                dropped_counts.append(jnp.sum(dropped, dtype=jnp.int32))
                total += ids.shape[0]
                return vec
            return lookup(mesh, table, ids, model_axis, data_axis)
        return table[ids]

    user_emb = one(params["user_embedding"], user_ids)
    item_emb = one(params["item_embedding"], item_ids)
    cat_embs = [
        one(tab, cat_features[:, i])
        for i, tab in enumerate(params["cat_embeddings"])
    ]
    x0 = jnp.concatenate([user_emb, item_emb, *cat_embs, num_features], axis=1)
    if not capped:
        return x0
    dropped = (jnp.sum(jnp.stack(dropped_counts)) if dropped_counts
               else jnp.zeros((), jnp.int32))
    return x0, jnp.stack([dropped, jnp.asarray(total, jnp.int32)])
