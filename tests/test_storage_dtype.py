"""bf16 activation storage (model.storage_dtype) — ops/nn.py, models/dcn.py.

A throughput knob for the HBM-bound train step (won both orders of the
flagship A/B, benchmarks/storage_ab.py): activations are stored bf16,
while BN statistics/state, logits, params, and grads stay f32.
"""

import jax
import jax.numpy as jnp
import pytest

from hhrs_tpu.config import ModelConfig
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn

DIMS = ModelDims(50, 30, (("city", 9), ("t", 4)), 11)
B = 64


@pytest.fixture(scope="module")
def batch():
    rng = jax.random.PRNGKey(0)
    return (
        jax.random.randint(rng, (B,), 0, 50),
        jax.random.randint(rng, (B,), 0, 30),
        jnp.stack([jax.random.randint(rng, (B,), 0, 9),
                   jax.random.randint(rng, (B,), 0, 4)], 1),
        jax.random.normal(rng, (B, 11)),
    )


@pytest.mark.parametrize("arch", ["dcnr", "cross_only", "deep_only", "dcn_mlp"])
def test_bf16_storage_close_to_f32_storage(batch, arch):
    """Same weights → logits agree to bf16 rounding; logits/BN state/grads
    stay f32 under bf16 storage."""
    rng = jax.random.PRNGKey(1)
    cfg32 = ModelConfig(arch=arch, compute_dtype="bfloat16")
    cfg16 = ModelConfig(arch=arch, compute_dtype="bfloat16", storage_dtype="bfloat16")
    params, st = init_dcn(rng, DIMS, cfg32)

    l32, _ = apply_dcn(params, st, *batch, cfg=cfg32, train=True, rng=rng)
    l16, s16 = apply_dcn(params, st, *batch, cfg=cfg16, train=True, rng=rng)
    assert l16.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(l32)))
    assert float(jnp.max(jnp.abs(l32 - l16))) < 0.05 * max(scale, 1.0)
    for leaf in jax.tree.leaves(s16):
        assert leaf.dtype == jnp.float32

    g = jax.grad(
        lambda p: jnp.sum(apply_dcn(p, st, *batch, cfg=cfg16, train=True, rng=rng)[0])
    )(params)
    assert all(leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(g))


def test_bf16_storage_eval_mode(batch):
    rng = jax.random.PRNGKey(2)
    cfg16 = ModelConfig(compute_dtype="bfloat16", storage_dtype="bfloat16")
    params, st = init_dcn(rng, DIMS, cfg16)
    logits, new_st = apply_dcn(params, st, *batch, cfg=cfg16, train=False)
    assert logits.dtype == jnp.float32
    assert jax.tree.all(jax.tree.map(lambda a, b: bool((a == b).all()), st, new_st))


def test_bf16_storage_requires_bf16_compute(batch):
    cfg = ModelConfig(storage_dtype="bfloat16")  # compute stays f32
    params, st = init_dcn(jax.random.PRNGKey(0), DIMS, cfg)
    with pytest.raises(ValueError, match="storage_dtype"):
        apply_dcn(params, st, *batch, cfg=cfg, train=False)


def test_unknown_storage_dtype_rejected(batch):
    cfg = ModelConfig(compute_dtype="bfloat16", storage_dtype="fp8")
    params, st = init_dcn(jax.random.PRNGKey(0), DIMS, ModelConfig())
    with pytest.raises(ValueError, match="storage_dtype"):
        apply_dcn(params, st, *batch, cfg=cfg, train=False)


def test_f32_default_unchanged(batch):
    """The default path must be byte-identical to the pre-knob program:
    batchnorm's internal f32 casts are no-ops for f32 inputs."""
    rng = jax.random.PRNGKey(3)
    cfg = ModelConfig()
    params, st = init_dcn(rng, DIMS, cfg)
    l1, s1 = apply_dcn(params, st, *batch, cfg=cfg, train=True, rng=rng)
    l2, s2 = apply_dcn(params, st, *batch, cfg=cfg, train=True, rng=rng)
    assert bool((l1 == l2).all())
    assert l1.dtype == jnp.float32


def test_trainer_runs_with_bf16_storage():
    """train_dcn end-to-end with model.storage_dtype=bfloat16 (the CLI
    override path) — finite losses, f32 exported params."""
    import numpy as np

    from hhrs_tpu.config import TrainConfig
    from hhrs_tpu.data import Preprocessor, add_engineered_features
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset
    from hhrs_tpu.train.trainer import train_dcn

    ds = generate_synthetic_dataset(n_users=150, n_items=60, n_reviews=2500, seed=4)
    df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(df)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, compute_dtype="bfloat16",
                       storage_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=256, n_epochs=2, early_stop_patience=5)
    res = train_dcn(splits, ModelDims.from_artifacts(art), mcfg, tcfg)
    assert np.isfinite(res.best_val_loss)
    assert all(leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(res.params))
