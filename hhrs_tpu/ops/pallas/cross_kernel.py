"""Fused cross-stack Pallas kernel.

The jnp reference (ops/cross.py) emits L sequential (dot → elementwise)
stages; under jit XLA usually keeps them fused, but at large batch the
activation still round-trips HBM between layers. This kernel runs the whole
stack per batch tile inside VMEM: load x0 once, apply all L layers, store
once. Math matches ops.cross.cross_stack_apply exactly for both variants
(reference train.py:96-99 'code'; Documentation.md:100 'canonical').

Backward: custom VJP that replays the jnp reference through jax.vjp —
recompute is ~free at these widths and keeps the gradients bit-identical
to the unfused path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hhrs_tpu.ops.cross import cross_stack_apply


from hhrs_tpu.utils.shapes import round_up as _round_up


def _kernel(x0_ref, w_ref, b_ref, out_ref, *, n_layers: int, variant: str):
    x0 = x0_ref[:]
    x = x0
    for l in range(n_layers):  # static unroll, L ≤ 6
        gate = jnp.sum(x * w_ref[l, :][None, :], axis=1, keepdims=True)
        if variant == "code":
            x = x + x * gate + b_ref[l, :][None, :]
        else:  # canonical, x0-anchored
            x = x0 * gate + b_ref[l, :][None, :] + x
    out_ref[:] = x


def _forward(params: dict, x0: jnp.ndarray, variant: str, interpret: bool) -> jnp.ndarray:
    w, b = params["w"], params["b"]
    L, d = w.shape
    B = x0.shape[0]
    dp = _round_up(d, 128)
    TB = 256
    bp = _round_up(B, TB)

    # Zero padding is semantics-preserving: padded lanes of x0/w/b are zero,
    # so gates are unchanged and padded lanes stay zero through every layer.
    x0p = jnp.pad(x0, ((0, bp - B), (0, dp - d)))
    wp = jnp.pad(w, ((0, 0), (0, dp - d)))
    bpad = jnp.pad(b, ((0, 0), (0, dp - d)))

    out = pl.pallas_call(
        partial(_kernel, n_layers=L, variant=variant),
        out_shape=jax.ShapeDtypeStruct((bp, dp), x0.dtype),
        grid=(bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x0p, wp, bpad)
    return out[:B, :d]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cross_stack_pallas(params: dict, x0: jnp.ndarray, variant: str = "code",
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused replacement for ops.cross.cross_stack_apply."""
    return _forward(params, x0, variant, interpret)


def _fwd(params, x0, variant, interpret):
    return _forward(params, x0, variant, interpret), (params, x0)


def _bwd(variant, interpret, res, g):
    params, x0 = res
    _, vjp = jax.vjp(lambda p, x: cross_stack_apply(p, x, variant), params, x0)
    return vjp(g)


cross_stack_pallas.defvjp(_fwd, _bwd)
