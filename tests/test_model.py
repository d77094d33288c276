"""Model-core tests: cross/resblock math vs numpy oracles, BN semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn, input_dim_of
from hhrs_tpu.ops.cross import cross_stack_apply, cross_stack_init
from hhrs_tpu.ops.nn import batchnorm_apply, batchnorm_init
from hhrs_tpu.ops.resblock import resblock_apply, resblock_init


def test_cross_code_variant_matches_oracle():
    """Oracle: x_{l+1} = x_l + x_l*(w·x_l) + b  (the reference's implemented math)."""
    rng = np.random.default_rng(0)
    B, d, L = 7, 5, 3
    x = rng.normal(size=(B, d)).astype(np.float32)
    w = rng.normal(size=(L, d)).astype(np.float32)
    b = rng.normal(size=(L, d)).astype(np.float32)

    expected = x.copy()
    for l in range(L):
        gate = expected @ w[l]  # [B]
        expected = expected + expected * gate[:, None] + b[l]

    got = cross_stack_apply({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x), "code")
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)


def test_cross_canonical_variant_matches_oracle():
    rng = np.random.default_rng(1)
    B, d, L = 4, 6, 2
    x0 = rng.normal(size=(B, d)).astype(np.float32)
    w = rng.normal(size=(L, d)).astype(np.float32)
    b = rng.normal(size=(L, d)).astype(np.float32)

    expected = x0.copy()
    for l in range(L):
        gate = expected @ w[l]
        expected = x0 * gate[:, None] + b[l] + expected

    got = cross_stack_apply({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x0), "canonical")
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)


def test_batchnorm_train_eval_semantics():
    """Torch BatchNorm1d semantics: biased var normalizes, unbiased updates running."""
    rng = np.random.default_rng(2)
    B, d = 32, 4
    x = rng.normal(2.0, 3.0, size=(B, d)).astype(np.float32)
    params, state = batchnorm_init(d)

    y, new_state = batchnorm_apply(params, state, jnp.asarray(x), train=True)
    mean = x.mean(0)
    var_b = x.var(0)
    var_u = x.var(0, ddof=1)
    np.testing.assert_allclose(np.asarray(y), (x - mean) / np.sqrt(var_b + 1e-5), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), 0.9 * 0 + 0.1 * mean, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["var"]), 0.9 * 1 + 0.1 * var_u, rtol=1e-4)

    # eval mode uses running stats, state unchanged
    y2, s2 = batchnorm_apply(params, new_state, jnp.asarray(x), train=False)
    expect = (x - np.asarray(new_state["mean"])) / np.sqrt(np.asarray(new_state["var"]) + 1e-5)
    np.testing.assert_allclose(np.asarray(y2), expect, rtol=1e-4)
    assert s2 is new_state


def test_resblock_eval_oracle():
    """Eval-mode resblock vs a step-by-step numpy recomputation."""
    key = jax.random.PRNGKey(0)
    H = 8
    params, state = resblock_init(key, H)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (5, H)))

    out, _ = resblock_apply(params, state, jnp.asarray(x), train=False, dropout_rate=0.5)

    def np_bn(p, s, v):
        return (v - np.asarray(s["mean"])) / np.sqrt(np.asarray(s["var"]) + 1e-5) * np.asarray(
            p["scale"]
        ) + np.asarray(p["bias"])

    h = x @ np.asarray(params["layer1"]["kernel"]) + np.asarray(params["layer1"]["bias"])
    h = np.maximum(np_bn(params["bn1"], state["bn1"], h), 0)
    h = h @ np.asarray(params["layer2"]["kernel"]) + np.asarray(params["layer2"]["bias"])
    h = np_bn(params["bn2"], state["bn2"], h)
    expected = np.maximum(h + x, 0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def _dims():
    return ModelDims(n_users=20, n_items=15, cat_dims=(("city", 6), ("hotel_type", 4)), n_num_features=11)


def test_dcn_shapes_and_determinism():
    cfg = ModelConfig(emb_dim=16, hidden_dim=32, n_cross_layers=2, n_res_blocks=2, dropout=0.3)
    dims = _dims()
    params, state = init_dcn(jax.random.PRNGKey(0), dims, cfg)

    # expected dims: input = 2*16 + (floor(sqrt(6))+1) + (floor(sqrt(4))+1) + 11 = 32+3+3+11 = 49
    assert input_dim_of(dims, cfg) == 49
    assert params["cross"]["w"].shape == (2, 49)
    assert params["final"]["kernel"].shape == (32 + 49, 1)

    B = 9
    key = jax.random.PRNGKey(3)
    u = jax.random.randint(key, (B,), 0, dims.n_users)
    it = jax.random.randint(key, (B,), 0, dims.n_items)
    cat = jnp.stack([jax.random.randint(key, (B,), 0, 6), jax.random.randint(key, (B,), 0, 4)], axis=1)
    num = jax.random.normal(key, (B, 11))

    logits, new_state = apply_dcn(params, state, u, it, cat, num, cfg=cfg, train=False)
    assert logits.shape == (B,)
    # eval is deterministic and leaves state unchanged
    logits2, _ = apply_dcn(params, state, u, it, cat, num, cfg=cfg, train=False)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(new_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dcn_train_mode_updates_bn_and_uses_dropout():
    cfg = ModelConfig(emb_dim=8, hidden_dim=16, n_cross_layers=1, n_res_blocks=1, dropout=0.5)
    dims = _dims()
    params, state = init_dcn(jax.random.PRNGKey(0), dims, cfg)
    B = 16
    key = jax.random.PRNGKey(4)
    u = jax.random.randint(key, (B,), 0, dims.n_users)
    it = jax.random.randint(key, (B,), 0, dims.n_items)
    cat = jnp.zeros((B, 2), jnp.int32)
    num = jax.random.normal(key, (B, 11))

    l1, s1 = apply_dcn(params, state, u, it, cat, num, cfg=cfg, train=True, rng=jax.random.PRNGKey(7))
    l2, _ = apply_dcn(params, state, u, it, cat, num, cfg=cfg, train=True, rng=jax.random.PRNGKey(8))
    # different dropout rngs → different logits
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
    # BN state moved
    assert not np.allclose(
        np.asarray(s1["res_blocks"][0]["bn1"]["mean"]),
        np.asarray(state["res_blocks"][0]["bn1"]["mean"]),
    )


def test_dcn_jit_compiles():
    cfg = ModelConfig(emb_dim=8, hidden_dim=16, n_cross_layers=1, n_res_blocks=1)
    dims = _dims()
    params, state = init_dcn(jax.random.PRNGKey(0), dims, cfg)

    @jax.jit
    def fwd(params, state, u, it, cat, num):
        return apply_dcn(params, state, u, it, cat, num, cfg=cfg, train=False)[0]

    B = 4
    out = fwd(
        params,
        state,
        jnp.zeros(B, jnp.int32),
        jnp.zeros(B, jnp.int32),
        jnp.zeros((B, 2), jnp.int32),
        jnp.zeros((B, 11), jnp.float32),
    )
    assert out.shape == (B,)


def test_batchnorm_no_nan_at_large_mean_tiny_variance():
    """E[x^2]-E[x]^2 cancels catastrophically (mean~300, var~1e-7 gave a
    NEGATIVE variance and NaN activations — r4 review finding); the
    centered form must match torch and stay finite."""
    import numpy as np
    import torch

    from hhrs_tpu.ops.nn import batchnorm_apply, batchnorm_init

    rng = np.random.default_rng(0)
    x = (300.0 + 2.83e-4 * rng.standard_normal((256, 4))).astype(np.float32)
    params, state = batchnorm_init(4)
    y, new_state = batchnorm_apply(params, state, jnp.asarray(x), train=True)
    assert np.isfinite(np.asarray(y)).all()
    assert (np.asarray(new_state["var"]) >= 0).all()

    tbn = torch.nn.BatchNorm1d(4)
    ty = tbn(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(),
                               rtol=2e-2, atol=2e-2)
