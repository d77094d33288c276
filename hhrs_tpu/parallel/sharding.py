"""Partitioning rules for the DCN-R parameter pytree.

The only parameters big enough to shard in this model family are the
embedding tables (reference train.py:136-141 — user/item/per-categorical
``nn.Embedding``); at production scale they dominate memory by orders of
magnitude, so they are **row-sharded over the ``model`` axis**. Everything
else (cross stack, residual MLP, final head) is tiny and replicated — the
standard recommender-systems layout (DP for the dense tower, table-wise
model parallelism for embeddings).

Sharding a table's row axis means a lookup from a data-sharded ID vector
compiles to a cross-shard gather; under pjit XLA lowers it to the
appropriate collective over ICI. The hand-written shard_map variants with
explicit psum / all_to_all live in ``parallel.embedding``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Param-dict keys holding embedding tables ([rows, dim] arrays) in
# models.dcn.init_dcn's pytree.
_TABLE_KEYS = ("user_embedding", "item_embedding", "cat_embeddings")


def _is_table_path(path) -> bool:
    for entry in path:
        key = getattr(entry, "key", getattr(entry, "name", None))
        if key in _TABLE_KEYS:
            return True
    return False


def param_pspecs(params: dict, model_axis: str | None = "model") -> dict:
    """PartitionSpec pytree: embedding tables row-sharded, rest replicated.

    Tables whose row count is smaller than the model-axis size would shard
    to empty on some devices; GSPMD pads those internally, which is fine.
    """

    def spec_of(path, leaf):
        if model_axis is not None and _is_table_path(path) and leaf.ndim == 2:
            return P(model_axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_of, params)


def param_shardings(params: dict, mesh: Mesh, model_axis: str | None = "model") -> dict:
    """Concrete NamedShardings. Tables whose row count does not divide the
    model-axis size (tiny categorical vocabularies) are replicated instead —
    explicit device_put, unlike GSPMD, cannot pad uneven shards, and a
    6-row table gains nothing from sharding anyway."""
    specs = param_pspecs(params, model_axis)
    axis_size = mesh.shape[model_axis] if model_axis in mesh.shape else 1

    def to_sharding(leaf, spec):
        if spec and spec[0] == model_axis and leaf.shape[0] % axis_size != 0:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree.map(to_sharding, params, specs)


def batch_pspec(ndim: int, data_axis: str = "data") -> P:
    """Batch arrays shard their leading axis over ``data``."""
    return P(data_axis, *([None] * (ndim - 1)))


def batch_shardings(mesh: Mesh, batch: dict, data_axis: str = "data") -> dict:
    return jax.tree.map(lambda x: NamedSharding(mesh, batch_pspec(x.ndim, data_axis)), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree(tree, shardings):
    """device_put a pytree with a matching sharding pytree."""
    return jax.tree.map(jax.device_put, tree, shardings)


def opt_state_shardings(opt_state, params, params_shardings, mesh: Mesh):
    """Optimizer state mirrors param shardings by TREE PATH: optax moment
    subtrees (Adam mu/nu — and LazyOptState's m/v table dicts) replicate
    the param tree's structure, so a state leaf whose path SUFFIX equals a
    param's full path takes that param's sharding (longest suffix wins).
    Matching by (shape, dtype) instead would silently replicate a table's
    moments — the two largest optimizer arrays — whenever any dense param
    happened to share its shape. Scalars/step counters replicate."""

    def path_key(path):
        return tuple(str(e) for e in path)

    param_leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    shard_leaves = jax.tree_util.tree_flatten_with_path(
        params_shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    )[0]
    param_map = {
        path_key(pp): s for (pp, _), (_, s) in zip(param_leaves, shard_leaves)
    }
    max_len = max((len(k) for k in param_map), default=0)

    def of(path, leaf):
        if hasattr(leaf, "shape"):
            keys = path_key(path)
            # longest matching suffix first
            for start in range(max(0, len(keys) - max_len), len(keys)):
                hit = param_map.get(keys[start:])
                if hit is not None:
                    return hit
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(of, opt_state)
