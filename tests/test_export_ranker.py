"""Exported StableHLO ranker (serve/export.py): the eval-mode scoring
program serialized via jax.export — parity with apply_dcn (to f32 fusion noise), symbolic
batch dimension, disk round-trip, CLI."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data import Preprocessor, add_engineered_features
from hhrs_tpu.data.ingest import noise_filter
from hhrs_tpu.data.synthetic import generate_synthetic_dataset
from hhrs_tpu.models.dcn import ModelDims, apply_dcn
from hhrs_tpu.serve.export import (RANKER_FILE, ExportedRanker, main,
                                   save_ranker)
from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle
from hhrs_tpu.train.trainer import train_dcn


@pytest.fixture(scope="module")
def bundle_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export")
    ds = generate_synthetic_dataset(n_users=150, n_items=60, n_reviews=3000, seed=5)
    main_df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    )
    splits, art = Preprocessor().fit_transform(noise_filter(main_df))
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=1, n_res_blocks=1)
    res = train_dcn(splits, dims, mcfg, TrainConfig(lr=3e-3, batch_size=512,
                                                    n_epochs=1))
    out = str(tmp / "art")
    export_artifacts(out, res.params, res.bn_state, mcfg, dims, art,
                     res.final_metrics)
    return out


def _batch(bundle, n, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, bundle.dims.n_users, n).astype(np.int32),
        rng.integers(0, bundle.dims.n_items, n).astype(np.int32),
        np.stack([rng.integers(0, d, n) for _, d in bundle.dims.cat_dims],
                 axis=1).astype(np.int32),
        rng.normal(size=(n, bundle.dims.n_num_features)).astype(np.float32),
    )


def test_roundtrip_parity_and_symbolic_batch(bundle_dir, tmp_path):
    bundle = load_artifact_bundle(bundle_dir)
    path = str(tmp_path / RANKER_FILE)
    # CPU-only lowering in CI (the default tpu,cpu needs no TPU either —
    # cross-platform lowering — but CI only ever CALLS it on cpu)
    save_ranker(bundle, path, platforms=("cpu",))
    ranker = ExportedRanker.load(path)
    assert ranker.platforms == ("cpu",)

    # the ONE exported module serves any batch size (symbolic dim)
    for n in (1, 7, 64):
        u, i, c, f = _batch(bundle, n, seed=n)
        got = np.asarray(ranker(u, i, c, f))
        want, _ = apply_dcn(bundle.params, bundle.bn_state,
                            jnp.asarray(u), jnp.asarray(i), jnp.asarray(c),
                            jnp.asarray(f), cfg=bundle.model_cfg, train=False)
        assert got.shape == (n,)
        # same math, separately compiled programs (symbolic-batch vs
        # concrete-shape lowering) -> f32 fusion-order noise only
        np.testing.assert_allclose(got, np.asarray(want), rtol=2e-6, atol=1e-7)


def test_exported_module_needs_no_model_code(bundle_dir, tmp_path):
    """Deserialization + execution go through jax.export only — no
    hhrs_tpu model reconstruction (weights live IN the module)."""
    bundle = load_artifact_bundle(bundle_dir)
    path = str(tmp_path / RANKER_FILE)
    save_ranker(bundle, path, platforms=("cpu",))
    exported = jax.export.deserialize(bytearray(open(path, "rb").read()))
    u, i, c, f = _batch(bundle, 5)
    logits = exported.call(jnp.asarray(u), jnp.asarray(i), jnp.asarray(c),
                           jnp.asarray(f))
    want, _ = apply_dcn(bundle.params, bundle.bn_state,
                        jnp.asarray(u), jnp.asarray(i), jnp.asarray(c),
                        jnp.asarray(f), cfg=bundle.model_cfg, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-6, atol=1e-7)


def test_export_cli(bundle_dir):
    assert main(["--artifacts", bundle_dir, "--platforms", "cpu"]) == 0
    out = os.path.join(bundle_dir, RANKER_FILE)
    assert os.path.getsize(out) > 0
    ranker = ExportedRanker.load(out)
    bundle = load_artifact_bundle(bundle_dir)
    u, i, c, f = _batch(bundle, 3)
    assert np.asarray(ranker(u, i, c, f)).shape == (3,)
