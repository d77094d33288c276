"""DCN-R: Deep & Cross Network with Residual blocks — the ranking tower.

Architecture (matches reference train.py:125-170 for parity):

    x0 = [user_emb ⊕ item_emb ⊕ cat_embs… ⊕ num_features]        # [B, D]
    deep  = ResBlock^n ( Linear(D→H) x0 )                         # [B, H]
    cross = CrossStack^L (x0)                                     # [B, D]
    logit = Linear([deep ⊕ cross]) → [B]

Categorical embedding dim uses the reference heuristic ⌊√n_cat⌋+1
(train.py:139); input_dim = 2·emb + Σcat_dims + n_num (train.py:141);
final_dim = hidden + input_dim (train.py:152).

Implemented as pure functions over an explicit param pytree (no module
framework): ``init_dcn`` builds (params, state), ``apply_dcn`` is a pure
function of them — directly jit/pjit-able, trivially shardable, and the
batch-stats plumbing for sync-BN under data parallelism is explicit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from hhrs_tpu.config import ModelConfig
from hhrs_tpu.ops.cross import cross_stack_apply, cross_stack_init
from hhrs_tpu.ops.nn import (
    batchnorm_init,
    dropout,
    embedding_init,
    linear_apply,
    linear_init,
    rate_may_be_positive,
)
from hhrs_tpu.ops.quant import table_lookup
from hhrs_tpu.ops.resblock import resblock_apply, resblock_init


@dataclass(frozen=True)
class ModelDims:
    n_users: int
    n_items: int
    cat_dims: tuple  # tuple of (col_name, n_categories), order fixed
    n_num_features: int

    @classmethod
    def from_artifacts(cls, artifacts) -> "ModelDims":
        return cls(
            n_users=artifacts.n_users,
            n_items=artifacts.n_items,
            cat_dims=tuple(artifacts.cat_dims.items()),
            n_num_features=len(artifacts.numerical_cols),
        )

    def to_dict(self) -> dict:
        return {
            "n_users": self.n_users,
            "n_items": self.n_items,
            "cat_dims": list(self.cat_dims),
            "n_num_features": self.n_num_features,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ModelDims":
        return cls(
            n_users=d["n_users"],
            n_items=d["n_items"],
            cat_dims=tuple((c, n) for c, n in d["cat_dims"]),
            n_num_features=d["n_num_features"],
        )


def input_dim_of(dims: ModelDims, cfg: ModelConfig) -> int:
    cat_sum = sum(cfg.cat_emb_dim(n) for _, n in dims.cat_dims)
    return cfg.emb_dim * 2 + cat_sum + dims.n_num_features


_ARCHS = ("dcnr", "cross_only", "deep_only", "dcn_mlp")


def init_dcn(rng, dims: ModelDims, cfg: ModelConfig) -> tuple[dict, dict]:
    keys = jax.random.split(rng, 6 + len(dims.cat_dims) + cfg.n_res_blocks)
    ki = iter(range(len(keys)))
    if cfg.arch not in _ARCHS:
        raise ValueError(f"unknown model.arch {cfg.arch!r}; expected one of {_ARCHS}")
    has_deep = cfg.arch in ("dcnr", "deep_only", "dcn_mlp")
    has_cross = cfg.arch in ("dcnr", "cross_only", "dcn_mlp")

    params: dict = {}
    params["user_embedding"] = embedding_init(keys[next(ki)], dims.n_users, cfg.emb_dim)
    params["item_embedding"] = embedding_init(keys[next(ki)], dims.n_items, cfg.emb_dim)
    params["cat_embeddings"] = [
        embedding_init(keys[next(ki)], n_cat, cfg.cat_emb_dim(n_cat))
        for _, n_cat in dims.cat_dims
    ]

    d_in = input_dim_of(dims, cfg)
    res_params, res_state = [], []
    if has_deep:
        params["initial_deep"] = linear_init(keys[next(ki)], d_in, cfg.hidden_dim)
        for _ in range(cfg.n_res_blocks):
            if cfg.arch == "dcn_mlp":
                # plain-MLP ablation: Linear only, no BN/residual
                p = {"layer": linear_init(keys[next(ki)], cfg.hidden_dim, cfg.hidden_dim)}
                s = {}
            else:
                p, s = resblock_init(keys[next(ki)], cfg.hidden_dim)
            res_params.append(p)
            res_state.append(s)
        params["res_blocks"] = res_params

    if has_cross:
        params["cross"] = cross_stack_init(keys[next(ki)], cfg.n_cross_layers, d_in)

    final_in = (cfg.hidden_dim if has_deep else 0) + (d_in if has_cross else 0)
    params["final"] = linear_init(keys[next(ki)], final_in, 1)

    state = {"res_blocks": res_state}
    return params, state


def init_bn_state(cfg: ModelConfig) -> dict:
    """BatchNorm state alone (deterministic zeros/ones) — avoids a full
    init_dcn (which samples every embedding table) when only the state
    skeleton is needed.

    Arch-aware so the structure matches what ``apply_dcn`` returns: no deep
    tower → no blocks; 'dcn_mlp' blocks are stateless (empty dicts). This
    keeps flax ``batch_stats`` structurally stable across train steps.
    """

    has_deep = cfg.arch in ("dcnr", "deep_only", "dcn_mlp")
    if not has_deep:
        return {"res_blocks": []}
    if cfg.arch == "dcn_mlp":
        return {"res_blocks": [{} for _ in range(cfg.n_res_blocks)]}
    return {
        "res_blocks": [
            {"bn1": batchnorm_init(cfg.hidden_dim)[1], "bn2": batchnorm_init(cfg.hidden_dim)[1]}
            for _ in range(cfg.n_res_blocks)
        ]
    }


def apply_dcn(
    params: dict,
    state: dict,
    user_ids: jnp.ndarray,  # [B] int
    item_ids: jnp.ndarray,  # [B] int
    cat_features: jnp.ndarray,  # [B, C] int
    num_features: jnp.ndarray,  # [B, F] float
    *,
    cfg: ModelConfig,
    train: bool = False,
    rng=None,
    axis_name: str | None = None,
    dropout_rate=None,
) -> tuple[jnp.ndarray, dict]:
    """Forward pass → ([B] logits, new batch-norm state)."""
    # table_lookup dispatches on the table type, so the same program serves
    # f32 tables and the int8-quantized serve params (ops/quant.py).
    user_emb = table_lookup(params["user_embedding"], user_ids)
    item_emb = table_lookup(params["item_embedding"], item_ids)
    cat_embs = [
        table_lookup(tab, cat_features[:, i])
        for i, tab in enumerate(params["cat_embeddings"])
    ]
    x0 = jnp.concatenate([user_emb, item_emb, *cat_embs, num_features], axis=1)
    return apply_dcn_from_x0(
        params, state, x0, cfg=cfg, train=train, rng=rng, axis_name=axis_name,
        dropout_rate=dropout_rate,
    )


def apply_dcn_from_x0(
    params: dict,
    state: dict,
    x0: jnp.ndarray,  # [B, d_in] the concatenated embedding+numeric input
    *,
    cfg: ModelConfig,
    train: bool = False,
    rng=None,
    axis_name: str | None = None,
    dropout_rate=None,
) -> tuple[jnp.ndarray, dict]:
    """The tower half of the forward pass, from an already-assembled x0.

    Split out so the lazy-table trainer (train/lazy.py) can differentiate
    w.r.t. the GATHERED embedding rows instead of the whole tables — the
    dense table gradient is an O(n_rows · d) scatter-add per step that the
    roofline shows is pure HBM traffic at production table sizes. ``params``
    needs only the tower entries (initial_deep/res_blocks/cross/final);
    table entries are ignored if present.

    ``dropout_rate`` overrides ``cfg.dropout`` and may be a TRACED scalar —
    the vectorized-HPO runner (hpo/vectorized.py) vmaps it across trials so
    one compiled program trains K trials with K different dropout
    probabilities. ``None`` → the static ``cfg.dropout`` (every existing
    path, byte-identical programs).
    """
    if cfg.compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"unknown model.compute_dtype {cfg.compute_dtype!r}; "
            "expected 'float32' or 'bfloat16'"
        )
    if cfg.storage_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"unknown model.storage_dtype {cfg.storage_dtype!r}; "
            "expected 'float32' or 'bfloat16'"
        )
    if cfg.storage_dtype == "bfloat16" and cfg.compute_dtype != "bfloat16":
        raise ValueError(
            "model.storage_dtype='bfloat16' requires "
            "model.compute_dtype='bfloat16' (bf16-stored activations imply "
            "bf16 matmul inputs)"
        )
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    # bf16 activation STORAGE: the [B, ·] tensors between fusions and the
    # autodiff residuals carry half the HBM bytes; BN stats and the logits
    # stay f32 (ops/nn.py). The step is HBM-bound (roofline, RESULTS.md).
    storage_dtype = jnp.bfloat16 if cfg.storage_dtype == "bfloat16" else None
    if storage_dtype is not None:
        x0 = x0.astype(storage_dtype)
    drop_rate = cfg.dropout if dropout_rate is None else dropout_rate
    drop_on = rate_may_be_positive(drop_rate)

    towers = []
    new_res_state = []
    if train and drop_on and rng is None and "initial_deep" in params:
        # Silently training unregularized (dropout gated on rng presence)
        # would diverge from torch semantics with no signal — fail at trace.
        raise ValueError("train=True with dropout > 0 requires an rng")
    if "initial_deep" in params:
        deep = linear_apply(params["initial_deep"], x0, compute_dtype, storage_dtype)
        blocks = params["res_blocks"]
        if train and rng is not None:
            block_rngs = jax.random.split(rng, max(len(blocks), 1))
        else:
            block_rngs = [None] * max(len(blocks), 1)
        if len(blocks) != len(state["res_blocks"]):
            raise ValueError(
                f"params have {len(blocks)} deep blocks but bn_state has "
                f"{len(state['res_blocks'])} — params/state from different configs"
            )
        for i, (bp, bs) in enumerate(zip(blocks, state["res_blocks"])):
            # Dispatch on the PARAMS structure, not cfg.arch: a cfg/params
            # mismatch (dcnr checkpoint + dcn_mlp override or vice versa)
            # must fail on the params' own keys, never silently skip
            # BN/residual math.
            if "layer" in bp:
                # plain-MLP ablation block: Linear → ReLU → Dropout
                deep = jax.nn.relu(
                    linear_apply(bp["layer"], deep, compute_dtype, storage_dtype)
                )
                if train and drop_on and block_rngs[i] is not None:
                    deep = dropout(deep, drop_rate, block_rngs[i])
                ns = {}
            else:
                deep, ns = resblock_apply(
                    bp,
                    bs,
                    deep,
                    train=train,
                    dropout_rate=drop_rate,
                    rng=block_rngs[i],
                    momentum=cfg.bn_momentum,
                    eps=cfg.bn_eps,
                    axis_name=axis_name,
                    compute_dtype=compute_dtype,
                    out_dtype=storage_dtype,
                )
            new_res_state.append(ns)
        towers.append(deep)

    if "cross" in params:
        towers.append(cross_stack_apply(params["cross"], x0,
                                        variant=cfg.cross_variant,
                                        compute_dtype=compute_dtype))

    final_in = jnp.concatenate(towers, axis=1)
    logits = linear_apply(params["final"], final_in, compute_dtype)[:, 0]
    return logits, {"res_blocks": new_res_state}
