"""Regression tests for the round-1 advisor findings (ADVICE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from hhrs_tpu.config import ModelConfig


# --------------------------------------------------------------------- #
# ADVICE: native CSV reader must not silently coerce/drop on non-project
# CSVs — counts are surfaced, auto ingest falls back to pandas.
# --------------------------------------------------------------------- #


def _weird_csv(tmp_path):
    """1100 numeric-prefix rows, a string token past the 1000-row inference
    prefix, and one short row — the exact divergence class flagged."""
    p = tmp_path / "weird.csv"
    rows = ["guest_id,val,city"] + [f"{i},{i}.5,Sochi" for i in range(1100)]
    rows[1050] = "1049,oops,Sochi"  # data row 1049: non-numeric in a numeric col
    rows.append("7,1.0")  # field-count mismatch
    p.write_text("\n".join(rows) + "\n")
    return str(p)


@pytest.fixture
def native_lib():
    from hhrs_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime not built (no toolchain)")


def test_native_mismatch_counted_and_strict_raises(tmp_path, native_lib):
    from hhrs_tpu.runtime.csv import NativeParseMismatch, read_csv_native

    path = _weird_csv(tmp_path)
    with pytest.raises(NativeParseMismatch) as ei:
        read_csv_native(path, strict=True)
    assert "1 row(s) dropped" in str(ei.value)
    assert "val" in str(ei.value)

    # non-strict: proceeds, but the divergence is counted, not silent
    nat = read_csv_native(path)
    assert len(nat) == 1100  # short row dropped
    assert pd.isna(nat["val"].iloc[1049])


def test_auto_ingest_falls_back_to_pandas_on_mismatch(tmp_path, native_lib):
    from hhrs_tpu.data.ingest import _read_csv

    path = _weird_csv(tmp_path)
    auto = _read_csv(path, engine="auto")
    ref = pd.read_csv(path)
    assert len(auto) == len(ref)  # pandas keeps (NaN-pads) the short row
    assert str(auto["val"].dtype) == str(ref["val"].dtype)
    assert (auto["val"].astype(str).to_numpy() == ref["val"].astype(str).to_numpy()).all()


def test_clean_project_csv_still_uses_native(tmp_path, native_lib):
    from hhrs_tpu.data.synthetic import write_synthetic_dataset
    from hhrs_tpu.runtime.csv import read_csv_native

    write_synthetic_dataset(str(tmp_path), n_users=50, n_items=30, n_reviews=500, seed=3)
    path = str(tmp_path / "hackathon_augmented_data.csv")
    # strict parse raises nothing on the project schema
    nat = read_csv_native(path, strict=True)
    assert len(nat) == len(pd.read_csv(path))


# --------------------------------------------------------------------- #
# ADVICE: init_bn_state must be arch-aware so the flax batch_stats
# structure is stable across train steps for every ablation arch.
# --------------------------------------------------------------------- #


@pytest.mark.parametrize("arch", ["dcnr", "dcn_mlp", "cross_only", "deep_only"])
def test_flax_batch_stats_structure_stable(arch):
    from hhrs_tpu.models.dcn import ModelDims
    from hhrs_tpu.models.flax_module import DCNR

    dims = ModelDims(20, 15, (("city", 5), ("hotel_type", 4)), 11)
    cfg = ModelConfig(emb_dim=8, hidden_dim=16, n_cross_layers=1, n_res_blocks=2,
                      dropout=0.0, arch=arch)
    module = DCNR(dims, cfg)
    B = 4
    user = jnp.zeros((B,), jnp.int32)
    item = jnp.zeros((B,), jnp.int32)
    cat = jnp.zeros((B, 2), jnp.int32)
    num = jnp.zeros((B, 11), jnp.float32)
    v0 = module.init(jax.random.PRNGKey(0), user, item, cat, num)
    _, mutated = module.apply(
        v0, user, item, cat, num, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
    )
    assert jax.tree_util.tree_structure(v0["batch_stats"]) == jax.tree_util.tree_structure(
        mutated["batch_stats"]
    ), arch


# --------------------------------------------------------------------- #
# ADVICE: sharded_cosine_topk with k > rows-per-shard must clamp (still
# exact) instead of failing at trace time; impossible k raises clearly.
# --------------------------------------------------------------------- #


def test_sharded_topk_k_exceeds_shard_rows(eight_devices):
    from hhrs_tpu.parallel.mesh import make_mesh
    from hhrs_tpu.retrieval.sharded import sharded_cosine_topk
    from hhrs_tpu.retrieval.similarity import cosine_topk, normalize_rows

    mesh = make_mesh(2, 4)  # model axis 4 → 8 rows per shard
    N, d, Q, k = 32, 16, 5, 12  # k > rows_per (8), but m*rows_per >= k
    table = normalize_rows(jax.random.normal(jax.random.PRNGKey(0), (N, d)))
    queries = jax.random.normal(jax.random.PRNGKey(1), (Q, d))
    ref_v, ref_i = cosine_topk(table, queries, k)
    sh_v, sh_i = sharded_cosine_topk(mesh, table, queries, k)
    np.testing.assert_allclose(np.asarray(sh_v), np.asarray(ref_v), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sh_i), np.asarray(ref_i))

    with pytest.raises(ValueError, match="impossible"):
        sharded_cosine_topk(mesh, table, queries, 64)  # > N total rows
