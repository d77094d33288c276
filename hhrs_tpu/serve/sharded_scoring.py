"""Scaled-config serve scoring: the candidate axis sharded over the mesh.

At reference scale a request scores the whole item universe in one MXU
batch (serve/engine.py). When the catalog outgrows one chip, the item axis
is the serve path's "large axis" (SURVEY.md §5): this module shards the
item-feature matrices over the mesh and pjit's the same DCN-R forward —
each device scores its slice of the catalog; ``score_all`` all-gathers
the [M] logits vector, while ``top_k`` reduces each shard to its local
top-k FIRST so only [devices·k] score/index pairs cross the mesh — the
same merge identity as retrieval/sharded.py.

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


from hhrs_tpu.utils.shapes import round_up as _round_up


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

    def _topk_program(self, k: int):
        """Jitted score + PER-SHARD top-k + merge for one static k.

        The module's bandwidth contract, implemented for real (it
        previously all-gathered the full [M] logits and ran a replicated
        top_k — r4 review finding): every global top-k item is in its own
        shard's local top-k, so each shard reduces its slice to k
        candidates FIRST and the all-gather moves only [shards·k] score/
        index pairs instead of the O(M) logits vector. Exact — same merge
        identity as retrieval/sharded.py."""
        from jax import shard_map

        axes = tuple(self.mesh.axis_names)
        n_shards = self.mesh.devices.size
        mesh = self.mesh
        cfg = self.cfg

        def local_merge(logits_local, gids_local):
            k_local = min(k, logits_local.shape[0])
            v, i = jax.lax.top_k(logits_local, k_local)
            g = gids_local[i]
            v_all = jax.lax.all_gather(v, axes, tiled=True)  # [shards·k_local]
            g_all = jax.lax.all_gather(g, axes, tiled=True)
            vv, ii = jax.lax.top_k(v_all, k)
            return vv, g_all[ii]

        # check_vma=False: the outputs ARE replicated (both come out of
        # an all_gather over every mesh axis + identical pure math), but
        # the static varying-axes checker cannot infer that through the
        # gather.
        sm = shard_map(
            local_merge, mesh=mesh,
            in_specs=(P(axes), P(axes)),
            out_specs=(P(), P()),
            check_vma=False,
        )

        def run(params, bn, item, cat, num, valid, user_internal):
            users = jnp.full(item.shape, user_internal, jnp.int32)
            logits, _ = apply_dcn(
                params, bn, users, item, cat, num, cfg=cfg, train=False
            )
            logits = jnp.where(valid, logits, -jnp.inf)
            gids = jnp.arange(item.shape[0], dtype=jnp.int32)
            gids = jax.lax.with_sharding_constraint(
                gids, NamedSharding(mesh, P(axes)))
            return sm(logits, gids)

        return jax.jit(run), n_shards

    def top_k(self, user_internal: int, k: int):
        """(scores, indices) of the user's global top-k items — per-shard
        top-k + merge; only [shards·k] values cross the mesh."""
        if k > self.M:
            raise ValueError(f"k={k} > catalog size {self.M}")
        cache = getattr(self, "_topk_cache", None)
        if cache is None:
            cache = self._topk_cache = {}
        if k not in cache:
            cache[k], _ = self._topk_program(k)
        return cache[k](
            self._params, self._bn, self._item, self._cat, self._num,
            self._valid, jnp.asarray(user_internal, jnp.int32),
        )
