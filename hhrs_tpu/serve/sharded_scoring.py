"""Scaled-config serve scoring: the candidate axis sharded over the mesh.

At reference scale a request scores the whole item universe in one MXU
batch (serve/engine.py). When the catalog outgrows one chip, the item axis
is the serve path's "large axis" (SURVEY.md §5): this module shards the
item-feature matrices over the mesh and pjit's the same DCN-R forward —
each device scores its slice of the catalog, XLA all-gathers only the
[M]-vector of logits (or, with ``top_k``, only [devices·k] after a
per-shard top-k — the same merge identity as retrieval/sharded.py).

Works with BOTH mesh axes as a flat shard axis (a serve fleet has no
gradient sync, so every device can hold catalog rows).
"""

from __future__ import annotations


import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hhrs_tpu.config import ModelConfig
from hhrs_tpu.models.dcn import apply_dcn


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class ShardedItemScorer:
    """Device-resident sharded catalog + jitted scoring program.

    item arrays: item_internal [M], X_cat [M, C], X_num [M, F] — padded to a
    multiple of the mesh size with masked dummy rows and device_put row-
    sharded across every mesh device.
    """

    def __init__(
        self,
        mesh: Mesh,
        params: dict,
        bn_state: dict,
        model_cfg: ModelConfig,
        item_internal,
        X_cat,
        X_num,
    ):
        self.mesh = mesh
        self.cfg = model_cfg
        n_shards = mesh.devices.size
        self.M = int(item_internal.shape[0])
        Mp = _round_up(self.M, n_shards)
        pad = Mp - self.M

        axes = tuple(mesh.axis_names)
        row_shard = NamedSharding(mesh, P(axes))  # flat over all mesh axes
        row_shard2 = NamedSharding(mesh, P(axes, None))
        rep = NamedSharding(mesh, P())

        self._valid = jax.device_put(
            jnp.asarray(np.r_[np.ones(self.M, bool), np.zeros(pad, bool)]), row_shard
        )
        self._item = jax.device_put(
            jnp.pad(jnp.asarray(item_internal, jnp.int32), (0, pad)), row_shard
        )
        self._cat = jax.device_put(
            jnp.pad(jnp.asarray(X_cat, jnp.int32), ((0, pad), (0, 0))), row_shard2
        )
        self._num = jax.device_put(
            jnp.pad(jnp.asarray(X_num, jnp.float32), ((0, pad), (0, 0))), row_shard2
        )
        self._params = jax.device_put(params, rep)
        self._bn = jax.device_put(bn_state, rep)

        def score(params, bn, item, cat, num, valid, user_internal):
            users = jnp.full(item.shape, user_internal, jnp.int32)
            logits, _ = apply_dcn(
                params, bn, users, item, cat, num, cfg=model_cfg, train=False
            )
            return jnp.where(valid, logits, -jnp.inf)

        self._score = jax.jit(score, out_shardings=rep)

    def score_all(self, user_internal: int) -> jnp.ndarray:
        """[M] logits for one user against the full sharded catalog."""
        out = self._score(
            self._params, self._bn, self._item, self._cat, self._num,
            self._valid, jnp.asarray(user_internal, jnp.int32),
        )
        return out[: self.M]

    def top_k(self, user_internal: int, k: int):
        """(scores, indices) of the user's global top-k items."""
        logits = self.score_all(user_internal)
        return jax.lax.top_k(logits, k)
