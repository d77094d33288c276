"""pjit'ed data+model-parallel train step.

Layout (SURVEY.md §2, parallelism rows):
  * batch sharded over ``data`` → XLA psum-reduces gradients across the data
    axis automatically (the program is written global-view; the mean over
    the batch axis *is* the global mean, so sync-BN also falls out for free);
  * embedding tables row-sharded over ``model`` → lookups compile to
    cross-shard gathers over ICI; their gradients stay sharded (scatter-add
    onto the owning shard, no replication of table grads);
  * dense tower replicated; its gradients are psum'ed.

The step is a pure function ``(params, bn, opt, batch, rng) → (params, bn,
opt, loss)`` jitted once with explicit in/out shardings and donated state —
params update in place in HBM, nothing round-trips to host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
from jax.sharding import Mesh

from hhrs_tpu.config import ModelConfig
from hhrs_tpu.models.dcn import apply_dcn
from hhrs_tpu.parallel.sharding import (
    batch_shardings,
    opt_state_shardings,
    param_shardings,
    replicated,
)
from hhrs_tpu.train.metrics import bce_with_logits


@dataclass
class ParallelTrainState:
    params: Any
    bn_state: Any
    opt_state: Any
    shardings: Any  # dict: params / bn_state / opt_state sharding pytrees


def shard_train_state(
    mesh: Mesh,
    params,
    bn_state,
    opt_state,
    model_axis: str | None = "model",
) -> ParallelTrainState:
    """device_put the train state with row-sharded tables + replicated rest."""
    p_sh = param_shardings(params, mesh, model_axis)
    rep = replicated(mesh)
    bn_sh = jax.tree.map(lambda _: rep, bn_state)
    opt_sh = opt_state_shardings(opt_state, params, p_sh, mesh)
    return ParallelTrainState(
        params=jax.tree.map(jax.device_put, params, p_sh),
        bn_state=jax.device_put(bn_state, rep),
        opt_state=jax.tree.map(jax.device_put, opt_state, opt_sh),
        shardings={"params": p_sh, "bn_state": bn_sh, "opt_state": opt_sh},
    )


def make_parallel_train_step(
    mesh: Mesh,
    model_cfg: ModelConfig,
    tx_update: Callable,
    state: ParallelTrainState,
    data_axis: str = "data",
    donate: bool = True,
    exchange: str | None = None,
    capacity_factor: float = 1.25,
):
    """Jit the full train step with explicit shardings.

    ``batch`` is a dict of arrays (user/item/cat/num/y) whose leading axis
    is sharded over ``data``; the rng key is replicated.

    ``exchange`` ('all_to_all' | 'psum' | 'capped') swaps the global-view
    table lookups for the explicit shard_map exchange kernels
    (parallel/embedding.py); default None trusts GSPMD's lowering, which
    tests/test_hlo_lowering.py pins (no full-table all-gathers). 'capped'
    (skew-bounded buckets of ``capacity_factor``; parallel/embedding.py)
    returns ``(loss, overflow int32[2]=(dropped, total))`` in the loss
    slot so callers can count the drop rate.
    """
    rep = replicated(mesh)
    capped = exchange == "capped"

    def step(params, bn_state, opt_state, batch, rng):
        def loss_fn(p):
            if exchange:
                from hhrs_tpu.models.dcn import apply_dcn_from_x0
                from hhrs_tpu.parallel.embedding import explicit_x0

                x0 = explicit_x0(
                    mesh, p, batch["user"], batch["item"], batch["cat"],
                    batch["num"], kind=exchange, data_axis=data_axis,
                    capacity_factor=capacity_factor,
                )
                overflow = None
                if capped:
                    x0, overflow = x0
                logits, new_bn = apply_dcn_from_x0(
                    p, bn_state, x0, cfg=model_cfg, train=True, rng=rng,
                )
                return bce_with_logits(logits, batch["y"]), (new_bn, overflow)
            logits, new_bn = apply_dcn(
                p,
                bn_state,
                batch["user"],
                batch["item"],
                batch["cat"],
                batch["num"],
                cfg=model_cfg,
                train=True,
                rng=rng,
            )
            return bce_with_logits(logits, batch["y"]), (new_bn, None)

        (loss, (new_bn, overflow)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx_update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        if capped:
            return new_params, new_bn, new_opt, (loss, overflow)
        return new_params, new_bn, new_opt, loss

    def batch_shardings_of(batch):
        return batch_shardings(mesh, batch, data_axis)

    def jit_for(batch_example):
        return jax.jit(
            step,
            in_shardings=(
                state.shardings["params"],
                state.shardings["bn_state"],
                state.shardings["opt_state"],
                batch_shardings_of(batch_example),
                rep,
            ),
            out_shardings=(
                state.shardings["params"],
                state.shardings["bn_state"],
                state.shardings["opt_state"],
                rep,
            ),
            donate_argnums=(0, 2) if donate else (),
        )

    return jit_for
