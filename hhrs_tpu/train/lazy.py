"""Lazy (sparse-row) embedding-table updates — O(B·d) table traffic/step.

Why: with ``jax.grad`` over the whole params tree, the gradient of an
embedding gather is a DENSE [n_rows, d] scatter-add, and Adam then reads
and writes every row's param + both moments every step — O(n_rows · d)
HBM traffic regardless of batch size. The flagship train step is
HBM-bound (RESULTS.md roofline: ≤2% MXU, ~72% of v5e bandwidth), so at
production table sizes (the reference's own domain: one row per user) the
dense update IS the step cost. Lazy mode differentiates w.r.t. the
GATHERED rows ([B, d], via models/dcn.apply_dcn_from_x0), segment-sums
duplicate ids, and updates only the touched rows: O(B · d).

Semantics (documented divergence, like torch.optim.SparseAdam's): moments
decay and weight decay apply only to rows touched by the batch; bias
correction uses the global step count. When every row is touched every
step the update is IDENTICAL to the dense optimizer (tests/test_lazy.py
asserts bit-level agreement for both 'adam' and 'adamw'); the default
(`train.lazy_table_updates=false`) stays the dense reference-parity path.

The per-row formulas mirror train/optimizers.py exactly:
* adamw — decoupled: upd = -lr·(m̂/(√v̂+eps) + wd·p)   (optax.adamw, eps_root=0)
* adam  — torch L2-coupled: g += wd·p before the moment updates
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from hhrs_tpu.models.dcn import apply_dcn_from_x0
from hhrs_tpu.train.metrics import bce_with_logits

B1, B2, EPS = 0.9, 0.999, 1e-8  # optax/torch Adam defaults (reference uses them)

TABLE_KEYS = ("user_embedding", "item_embedding", "cat_embeddings")


@dataclass
class LazyOptState:
    """Optimizer state in lazy mode: the dense subtree's optax state plus
    per-table moments and the global step count. Threaded through the
    trainer wherever a plain optax state would be (it is a pytree, so
    donation / device_put / orbax checkpointing work unchanged)."""

    dense: Any  # optax state for the non-table params
    m: dict     # {"user_embedding": [N,d], "item_embedding": ..., "cat_embeddings": [...]}
    v: dict
    count: jnp.ndarray  # scalar int32 — global optimizer step


jax.tree_util.register_pytree_node(
    LazyOptState,
    lambda s: ((s.dense, s.m, s.v, s.count), None),
    lambda _, c: LazyOptState(dense=c[0], m=c[1], v=c[2], count=c[3]),
)


def split_params(params: dict) -> tuple[dict, dict]:
    """(dense subtree, tables subtree). Table leaves must NOT appear in the
    dense part — jax.grad would materialize dense zero cotangents for them,
    which is exactly the O(n_rows·d) traffic lazy mode exists to avoid."""
    dense = {k: v for k, v in params.items() if k not in TABLE_KEYS}
    tables = {k: params[k] for k in TABLE_KEYS}
    return dense, tables


def init_lazy_opt(tx, params: dict) -> LazyOptState:
    dense, tables = split_params(params)
    zeros = jax.tree.map(jnp.zeros_like, tables)
    return LazyOptState(
        dense=tx.init(dense),
        m=zeros,
        v=jax.tree.map(jnp.zeros_like, tables),
        count=jnp.zeros((), jnp.int32),
    )


def _lazy_row_adam(table, m, v, ids, g_rows, *, t, lr, wd, coupled_wd: bool):
    """Touched-row Adam/AdamW update for one table.

    ids may contain duplicates: cotangents segment-sum per unique row
    (== the dense scatter-add), then each row updates ONCE. The unique()
    pad slot is n_rows — out of range, so its gathers clip (harmless) and
    its scatters DROP (mode='drop'), making the pad a no-op.
    """
    n = table.shape[0]
    b = ids.shape[0]
    uids, inv = jnp.unique(ids, size=b, fill_value=n, return_inverse=True)
    g = jax.ops.segment_sum(g_rows, inv.reshape(-1), num_segments=b)

    p_rows = table[jnp.clip(uids, 0, n - 1)]
    m_rows = m[jnp.clip(uids, 0, n - 1)]
    v_rows = v[jnp.clip(uids, 0, n - 1)]
    if coupled_wd:  # torch-style L2 'adam': decay enters the gradient
        g = g + wd * p_rows
    nm = B1 * m_rows + (1.0 - B1) * g
    nv = B2 * v_rows + (1.0 - B2) * jnp.square(g)
    tf = t.astype(jnp.float32)
    mhat = nm / (1.0 - B1**tf)
    vhat = nv / (1.0 - B2**tf)
    upd = mhat / (jnp.sqrt(vhat) + EPS)
    if not coupled_wd:  # adamw: decoupled decay on the touched rows
        upd = upd + wd * p_rows
    new_table = table.at[uids].add(-lr * upd, mode="drop")
    new_m = m.at[uids].set(nm, mode="drop")
    new_v = v.at[uids].set(nv, mode="drop")
    return new_table, new_m, new_v


def make_lazy_update(cfg, train_cfg):
    """Build update(params, bn_state, opt: LazyOptState, tx_update, batch,
    rng) → (new_params, new_bn, new_opt, loss).

    Drop-in for the dense grad/update block of the train step builders
    (train/trainer.py): same loss, same dense-subtree optimizer (via the
    closed-over optax ``tx_update`` — the injected learning rate is read
    from the dense state's hyperparams so plateau LR changes reach the
    table rows too), lazy row updates for the tables.
    """
    coupled = train_cfg.optimizer.lower() == "adam"
    wd = train_cfg.weight_decay

    def update(params, bn_state, opt: LazyOptState, tx_update, batch, rng):
        dense, tables = split_params(params)
        u_rows = tables["user_embedding"][batch["user"]]
        i_rows = tables["item_embedding"][batch["item"]]
        c_rows = [tab[batch["cat"][:, i]] for i, tab in enumerate(tables["cat_embeddings"])]

        def loss_fn(dense_p, ur, ir, cr):
            x0 = jnp.concatenate([ur, ir, *cr, batch["num"]], axis=1)
            logits, new_bn = apply_dcn_from_x0(
                dense_p, bn_state, x0, cfg=cfg, train=True, rng=rng
            )
            return bce_with_logits(logits, batch["y"]), new_bn

        (loss, new_bn), (gd, gu, gi, gc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True
        )(dense, u_rows, i_rows, c_rows)

        updates, new_dense_opt = tx_update(gd, opt.dense, dense)
        new_dense = jax.tree.map(lambda p, u: p + u, dense, updates)

        t = opt.count + 1
        lr = opt.dense.hyperparams["learning_rate"]
        row = partial(_lazy_row_adam, t=t, lr=lr, wd=wd, coupled_wd=coupled)
        nu, nmu, nvu = row(tables["user_embedding"], opt.m["user_embedding"],
                           opt.v["user_embedding"], batch["user"], gu)
        ni, nmi, nvi = row(tables["item_embedding"], opt.m["item_embedding"],
                           opt.v["item_embedding"], batch["item"], gi)
        cats, mcs, vcs = [], [], []
        for i, tab in enumerate(tables["cat_embeddings"]):
            nc, nmc, nvc = row(tab, opt.m["cat_embeddings"][i],
                               opt.v["cat_embeddings"][i], batch["cat"][:, i], gc[i])
            cats.append(nc)
            mcs.append(nmc)
            vcs.append(nvc)

        new_params = dict(new_dense)
        new_params["user_embedding"] = nu
        new_params["item_embedding"] = ni
        new_params["cat_embeddings"] = cats
        new_opt = LazyOptState(
            dense=new_dense_opt,
            m={"user_embedding": nmu, "item_embedding": nmi, "cat_embeddings": mcs},
            v={"user_embedding": nvu, "item_embedding": nvi, "cat_embeddings": vcs},
            count=t,
        )
        return new_params, new_bn, new_opt, loss

    return update
