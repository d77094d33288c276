"""Architecture ablation variants (reference Documentation.md:200-212:
Cross-only / Deep-only / DCN-with-plain-MLP) — each trains end-to-end and
learns on synthetic data; structural invariants checked."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data.features import add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.preprocess import Preprocessor
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
from hhrs_tpu.train.trainer import train_dcn

DIMS = ModelDims(n_users=40, n_items=30, cat_dims=(("city", 5), ("hotel_type", 4)), n_num_features=11)


def tiny_inputs(b=32):
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    return (
        jax.random.randint(ks[0], (b,), 0, DIMS.n_users),
        jax.random.randint(ks[1], (b,), 0, DIMS.n_items),
        jnp.stack([jax.random.randint(ks[2], (b,), 0, 5),
                   jax.random.randint(ks[2], (b,), 0, 4)], axis=1),
        jax.random.normal(ks[3], (b, 11)),
    )


@pytest.mark.parametrize("arch", ["dcnr", "cross_only", "deep_only", "dcn_mlp"])
def test_variant_forward_and_grads(arch):
    cfg = ModelConfig(emb_dim=8, hidden_dim=16, n_cross_layers=2, n_res_blocks=2,
                      dropout=0.3, arch=arch)
    params, state = init_dcn(jax.random.PRNGKey(0), DIMS, cfg)
    u, i, c, n = tiny_inputs()

    if arch == "cross_only":
        assert "initial_deep" not in params and "cross" in params
    elif arch == "deep_only":
        assert "cross" not in params and "initial_deep" in params
    if arch == "dcn_mlp":
        assert set(params["res_blocks"][0]) == {"layer"}  # no BN

    logits, new_state = apply_dcn(params, state, u, i, c, n, cfg=cfg, train=True,
                                  rng=jax.random.PRNGKey(2))
    assert logits.shape == (32,)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(p):
        lg, _ = apply_dcn(p, state, u, i, c, n, cfg=cfg, train=False)
        return jnp.mean(lg ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert total > 0


@pytest.mark.parametrize("arch", ["cross_only", "deep_only", "dcn_mlp"])
def test_variant_trains(arch):
    ds = generate_synthetic_dataset(n_users=150, n_items=60, n_reviews=3000, seed=3)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})))
    splits, art = Preprocessor().fit_transform(df)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1,
                       dropout=0.2, arch=arch)
    tcfg = TrainConfig(lr=3e-3, batch_size=256, n_epochs=3, eval_batch_size=1024)
    res = train_dcn(splits, ModelDims.from_artifacts(art), mcfg, tcfg)
    assert res.final_metrics["val_auc"] > 0.6  # learns well above chance
