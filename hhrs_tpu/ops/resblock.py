"""Residual MLP block: Linear→BN→ReLU→Dropout→Linear→BN (+identity) →ReLU.

Structure matches the reference block (reference train.py:102-122); BN uses
torch BatchNorm1d semantics via ops.nn.batchnorm_apply, including sync-BN
across the data axis under pjit (``axis_name``). Both matmuls are
[B, H]·[H, H] — MXU-shaped when H is a multiple of 128 — and XLA fuses the
BN/ReLU/dropout elementwise tail into the matmul epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hhrs_tpu.ops.nn import (
    batchnorm_apply,
    batchnorm_init,
    dropout,
    linear_apply,
    linear_init,
    rate_may_be_positive,
)


def resblock_init(rng, hidden_dim: int, dtype=jnp.float32) -> tuple[dict, dict]:
    r1, r2 = jax.random.split(rng)
    bn1_p, bn1_s = batchnorm_init(hidden_dim, dtype)
    bn2_p, bn2_s = batchnorm_init(hidden_dim, dtype)
    params = {
        "layer1": linear_init(r1, hidden_dim, hidden_dim, dtype),
        "bn1": bn1_p,
        "layer2": linear_init(r2, hidden_dim, hidden_dim, dtype),
        "bn2": bn2_p,
    }
    state = {"bn1": bn1_s, "bn2": bn2_s}
    return params, state


def resblock_apply(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    *,
    train: bool,
    dropout_rate: float,
    rng=None,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: str | None = None,
    compute_dtype=None,
    out_dtype=None,
) -> tuple[jnp.ndarray, dict]:
    identity = x
    h = linear_apply(params["layer1"], x, compute_dtype, out_dtype)
    h, bn1_s = batchnorm_apply(
        params["bn1"], state["bn1"], h, train=train, momentum=momentum, eps=eps, axis_name=axis_name
    )
    h = jax.nn.relu(h)
    if train and rng is not None and rate_may_be_positive(dropout_rate):
        h = dropout(h, dropout_rate, rng)
    h = linear_apply(params["layer2"], h, compute_dtype, out_dtype)
    h, bn2_s = batchnorm_apply(
        params["bn2"], state["bn2"], h, train=train, momentum=momentum, eps=eps, axis_name=axis_name
    )
    out = jax.nn.relu(h + identity)
    return out, {"bn1": bn1_s, "bn2": bn2_s}
