"""Fused eval-mode DCN-R tower kernel.

One pallas_call scores a whole candidate batch: x0 tile → initial linear →
R residual blocks (eval BatchNorm FOLDED into the linear weights, so each
block is exactly two MXU matmuls + VPU epilogue) → L cross layers → final
head, producing logits without materializing any intermediate in HBM.
Mirrors apply_dcn(train=False) (models/dcn.py; reference main.py:93-127)
bit-for-bit at float32.

Weight layout: everything padded to lane multiples of 128 with zeros —
padded hidden lanes provably stay zero through ReLU/identity because the
folded biases of padded lanes are zero, and padded cross lanes stay zero
because x0/w/b pads are zero.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from hhrs_tpu.utils.shapes import round_up as _round_up


def fold_eval_params(params: dict, state: dict, eps: float = 1e-5) -> dict:
    """Fold eval-mode BatchNorm into the adjacent linear layers.

    BN(x)_j = a_j x_j + c_j with a = scale/sqrt(var+eps), c = bias − mean·a;
    Linear→BN therefore becomes W'_ij = W_ij a_j, b'_j = a_j b_j + c_j.
    Returns a flat dict of folded weights for the tower kernel.
    """

    missing = {"initial_deep", "res_blocks", "cross", "final"} - set(params)
    if missing:
        raise ValueError(
            "fold_eval_params supports arch='dcnr' params only (needs "
            "initial_deep/res_blocks/cross/final; got keys "
            f"{sorted(params)})"
        )

    def fold(lin, bn_p, bn_s):
        a = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
        c = bn_p["bias"] - bn_s["mean"] * a
        return lin["kernel"] * a[None, :], lin["bias"] * a + c

    blocks = []
    for bp, bs in zip(params["res_blocks"], state["res_blocks"]):
        w1, b1 = fold(bp["layer1"], bp["bn1"], bs["bn1"])
        w2, b2 = fold(bp["layer2"], bp["bn2"], bs["bn2"])
        blocks.append({"w1": w1, "b1": b1, "w2": w2, "b2": b2})
    return {
        "w0": params["initial_deep"]["kernel"],
        "b0": params["initial_deep"]["bias"],
        "blocks": blocks,
        "cross_w": params["cross"]["w"],
        "cross_b": params["cross"]["b"],
        "final_w": params["final"]["kernel"][:, 0],
        "final_b": params["final"]["bias"][0],
    }


def _kernel(x0_ref, w0_ref, b0_ref, rw1_ref, rb1_ref, rw2_ref, rb2_ref,
            cw_ref, cb_ref, fwd_ref, fwc_ref, fb_ref, out_ref,
            *, n_res: int, n_cross: int, variant: str):
    x0 = x0_ref[:]  # [TB, Dp]

    # Deep tower: initial linear + folded residual blocks.
    deep = jnp.dot(x0, w0_ref[:], preferred_element_type=jnp.float32) + b0_ref[0, :][None, :]
    for r in range(n_res):  # static unroll
        h = jnp.dot(deep, rw1_ref[r], preferred_element_type=jnp.float32) + rb1_ref[r][None, :]
        h = jnp.maximum(h, 0.0)
        h = jnp.dot(h, rw2_ref[r], preferred_element_type=jnp.float32) + rb2_ref[r][None, :]
        deep = jnp.maximum(h + deep, 0.0)

    # Cross stack on x0.
    x = x0
    for l in range(n_cross):
        gate = jnp.sum(x * cw_ref[l, :][None, :], axis=1, keepdims=True)
        if variant == "code":
            x = x + x * gate + cb_ref[l, :][None, :]
        else:
            x = x0 * gate + cb_ref[l, :][None, :] + x

    # Final head as VPU reductions (output width 1 ≪ MXU tile).
    logit = (
        jnp.sum(deep * fwd_ref[0, :][None, :], axis=1, keepdims=True)
        + jnp.sum(x * fwc_ref[0, :][None, :], axis=1, keepdims=True)
        + fb_ref[0, 0]
    )
    out_ref[:] = jnp.broadcast_to(logit, out_ref.shape)


def dcnr_tower_eval_pallas(folded: dict, x0: jnp.ndarray, variant: str = "code",
                           interpret: bool = False, tile_b: int = 256) -> jnp.ndarray:
    """Score a [B, d_in] feature batch → [B] logits (eval mode)."""
    d = x0.shape[1]
    H = folded["w0"].shape[1]
    B = x0.shape[0]
    n_res = len(folded["blocks"])
    L = folded["cross_w"].shape[0]

    dp = _round_up(d, 128)
    hp = _round_up(H, 128)
    TB = tile_b
    bp = _round_up(B, TB)

    x0p = jnp.pad(x0, ((0, bp - B), (0, dp - d)))
    w0 = jnp.pad(folded["w0"], ((0, dp - d), (0, hp - H)))
    b0 = jnp.pad(folded["b0"], (0, hp - H))[None, :]
    if n_res:
        rw1 = jnp.stack([jnp.pad(bl["w1"], ((0, hp - H), (0, hp - H))) for bl in folded["blocks"]])
        rb1 = jnp.stack([jnp.pad(bl["b1"], (0, hp - H)) for bl in folded["blocks"]])
        rw2 = jnp.stack([jnp.pad(bl["w2"], ((0, hp - H), (0, hp - H))) for bl in folded["blocks"]])
        rb2 = jnp.stack([jnp.pad(bl["b2"], (0, hp - H)) for bl in folded["blocks"]])
    else:
        rw1 = jnp.zeros((1, hp, hp), x0.dtype)
        rb1 = jnp.zeros((1, hp), x0.dtype)
        rw2, rb2 = rw1, rb1
    cw = jnp.pad(folded["cross_w"], ((0, 0), (0, dp - d)))
    cb = jnp.pad(folded["cross_b"], ((0, 0), (0, dp - d)))
    fwd_ = jnp.pad(folded["final_w"][:H], (0, hp - H))[None, :]
    fwc = jnp.pad(folded["final_w"][H:], (0, dp - d))[None, :]
    fb = jnp.reshape(folded["final_b"], (1, 1))

    Rk = max(n_res, 1)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_kernel, n_res=n_res, n_cross=L, variant=variant),
        out_shape=jax.ShapeDtypeStruct((bp, 128), jnp.float32),
        grid=(bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            rep((dp, hp)), rep((1, hp)),
            rep((Rk, hp, hp)), rep((Rk, hp)), rep((Rk, hp, hp)), rep((Rk, hp)),
            rep((L, dp)), rep((L, dp)),
            rep((1, hp)), rep((1, dp)), rep((1, 1)),
        ],
        out_specs=pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x0p, w0, b0, rw1, rb1, rw2, rb2, cw, cb, fwd_, fwc, fb)
    return out[:B, 0]


def build_x0(params: dict, user_ids, item_ids, cat_features, num_features) -> jnp.ndarray:
    """The embedding-gather + concat front half (XLA handles gathers well;
    the kernel covers the FLOP-dense tower). Mirrors apply_dcn's x0 via
    the SAME table_lookup dispatch, so quantized tables work here too."""
    from hhrs_tpu.ops.quant import table_lookup

    user_emb = table_lookup(params["user_embedding"], user_ids)
    item_emb = table_lookup(params["item_embedding"], item_ids)
    cat_embs = [table_lookup(tab, cat_features[:, i])
                for i, tab in enumerate(params["cat_embeddings"])]
    return jnp.concatenate([user_emb, item_emb, *cat_embs, num_features], axis=1)
