"""Feature-cross stack.

Two variants, selected by config (SURVEY.md C4):

* ``code`` — the math the reference actually implements
  (reference train.py:96-99 / main.py:67-70): each layer applies a
  per-example scalar gate computed from the *current* layer input,

      x_{l+1} = x_l + x_l * (w_l · x_l) + b_l

* ``canonical`` — the x0-anchored DCN cross its documentation describes
  (reference Documentation.md:100):

      x_{l+1} = x_0 * (w_l · x_l) + b_l + x_l

Parameters for all L layers are stacked ([L, d] weight / [L, d] bias) so a
single pytree leaf covers the whole stack; the layer loop is unrolled at
trace time (L ≤ 6), letting XLA fuse the entire stack into a handful of
VPU ops — each layer is one d-length dot plus elementwise work, far below
MXU granularity, so fusion (not a matmul library call) is the right shape
on TPU. A fused Pallas kernel for the scaled config lives in
``hhrs_tpu/ops/pallas/cross_kernel.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_stack_init(rng, n_layers: int, input_dim: int, dtype=jnp.float32) -> dict:
    bound = 1.0 / jnp.sqrt(input_dim)
    w = jax.random.uniform(rng, (n_layers, input_dim), dtype, -bound, bound)
    b = jnp.zeros((n_layers, input_dim), dtype)
    return {"w": w, "b": b}


def cross_stack_apply(
    params: dict, x0: jnp.ndarray, variant: str = "code", compute_dtype=None
) -> jnp.ndarray:
    """Apply the full cross stack. x0: [B, d] → [B, d]. ``compute_dtype``
    casts inputs/params for the gate einsum and elementwise work (bf16 on
    the MXU/VPU) like linear_apply does — so the bf16 knob covers the
    cross tower too, not just the deep/final matmuls."""
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x0 = x0.astype(compute_dtype)
        w = w.astype(compute_dtype)
        b = b.astype(compute_dtype)
    n_layers = w.shape[0]
    x = x0
    for l in range(n_layers):
        gate = jnp.einsum("bd,d->b", x, w[l])[:, None]  # [B, 1] scalar gate
        if variant == "code":
            x = x + x * gate + b[l]
        elif variant == "canonical":
            x = x0 * gate + b[l] + x
        else:
            raise ValueError(f"unknown cross variant {variant!r}")
    return x
