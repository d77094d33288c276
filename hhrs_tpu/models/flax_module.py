"""Flax linen wrapper around the pure-function DCN-R.

The core model is deliberately framework-free (models/dcn.py: explicit
param pytrees → trivially shardable, checkpointable, Pallas-swappable).
This module is the ecosystem adapter: a ``linen.Module`` with params in the
standard ``params`` collection and BatchNorm statistics in ``batch_stats``,
so the model composes with flax tooling (optax wrappers, linen surgery,
model inspection) unchanged. The forward math delegates to ``apply_dcn`` —
one implementation, two faces.
"""

from __future__ import annotations

import flax.linen as nn

from hhrs_tpu.config import ModelConfig
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_bn_state, init_dcn


class DCNR(nn.Module):
    dims: ModelDims
    cfg: ModelConfig
    # Mesh/pmap axis for sync-BN: the native trainer psum-averages batch
    # stats across data-parallel shards; set this so the flax face does
    # the same at DP degree > 1 (None = single-device semantics).
    axis_name: str | None = None

    @nn.compact
    def __call__(self, user_ids, item_ids, cat_features, num_features, train: bool = False):
        # One flax param holding the whole native pytree: flax sees a normal
        # (nested) parameter collection; the math path is identical to the
        # pure-function API.
        params = self.param(
            "dcn",
            lambda rng: init_dcn(rng, self.dims, self.cfg)[0],
        )
        bn = self.variable("batch_stats", "dcn", lambda: init_bn_state(self.cfg))
        rng = self.make_rng("dropout") if train and self.cfg.dropout > 0 else None
        logits, new_state = apply_dcn(
            params, bn.value, user_ids, item_ids, cat_features, num_features,
            cfg=self.cfg, train=train, rng=rng, axis_name=self.axis_name,
        )
        if train and not self.is_initializing():
            bn.value = new_state
        return logits


def params_to_flax(params: dict, bn_state: dict) -> dict:
    """Wrap native (params, bn_state) pytrees as flax variable collections."""
    return {"params": {"dcn": params}, "batch_stats": {"dcn": bn_state}}


def params_from_flax(variables: dict) -> tuple[dict, dict]:
    return variables["params"]["dcn"], variables["batch_stats"]["dcn"]
