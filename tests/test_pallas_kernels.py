"""Pallas kernel parity tests (interpret mode on CPU): the fused cross
stack and the fused eval tower must match the jnp reference ops exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
from hhrs_tpu.ops.cross import cross_stack_apply, cross_stack_init
from hhrs_tpu.ops.pallas.cross_kernel import cross_stack_pallas
from hhrs_tpu.ops.pallas.tower_kernel import (
    build_x0,
    dcnr_tower_eval_pallas,
    fold_eval_params,
)

DIMS = ModelDims(n_users=50, n_items=40, cat_dims=(("city", 6), ("hotel_type", 5)), n_num_features=11)


@pytest.mark.parametrize("variant", ["code", "canonical"])
@pytest.mark.parametrize("B,d,L", [(64, 57, 3), (300, 128, 1)])
def test_cross_kernel_matches_reference(variant, B, d, L):
    params = cross_stack_init(jax.random.PRNGKey(0), L, d)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, d))
    ref = cross_stack_apply(params, x0, variant)
    out = cross_stack_pallas(params, x0, variant, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_cross_kernel_gradients_match():
    params = cross_stack_init(jax.random.PRNGKey(0), 2, 33)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (32, 33))

    def loss_ref(p, x):
        return jnp.sum(cross_stack_apply(p, x, "code") ** 2)

    def loss_pal(p, x):
        return jnp.sum(cross_stack_pallas(p, x, "code", True) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x0)
    gp = jax.grad(loss_pal, argnums=(0, 1))(params, x0)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_res,n_cross,hidden", [(1, 2, 64), (2, 3, 96), (0, 1, 32)])
def test_tower_kernel_matches_apply_dcn(n_res, n_cross, hidden):
    cfg = ModelConfig(emb_dim=8, hidden_dim=hidden, n_cross_layers=n_cross,
                      n_res_blocks=n_res, dropout=0.3)
    params, state = init_dcn(jax.random.PRNGKey(2), DIMS, cfg)
    # Perturb BN state so folding is non-trivial.
    state = jax.tree.map(lambda x: x + 0.1 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape) / x.size, state)

    B = 200
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    user = jax.random.randint(ks[0], (B,), 0, DIMS.n_users)
    item = jax.random.randint(ks[1], (B,), 0, DIMS.n_items)
    cat = jnp.stack([jax.random.randint(ks[2], (B,), 0, 6),
                     jax.random.randint(ks[2], (B,), 0, 5)], axis=1)
    num = jax.random.normal(ks[3], (B, 11))

    ref, _ = apply_dcn(params, state, user, item, cat, num, cfg=cfg, train=False)
    folded = fold_eval_params(params, state, eps=cfg.bn_eps)
    x0 = build_x0(params, user, item, cat, num)
    out = dcnr_tower_eval_pallas(folded, x0, cfg.cross_variant, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_tower_kernel_jit_composes():
    cfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1)
    params, state = init_dcn(jax.random.PRNGKey(0), DIMS, cfg)
    folded = fold_eval_params(params, state)
    B = 100
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    user = jax.random.randint(ks[0], (B,), 0, DIMS.n_users)
    item = jax.random.randint(ks[1], (B,), 0, DIMS.n_items)
    cat = jnp.stack([jax.random.randint(ks[2], (B,), 0, 6),
                     jax.random.randint(ks[2], (B,), 0, 5)], axis=1)
    num = jax.random.normal(ks[3], (B, 11))

    @jax.jit
    def f(folded, u, i, c, n):
        return dcnr_tower_eval_pallas(folded, build_x0(params, u, i, c, n), interpret=True)

    out = f(folded, user, item, cat, num)
    assert out.shape == (B,)
    assert np.all(np.isfinite(np.asarray(out)))
