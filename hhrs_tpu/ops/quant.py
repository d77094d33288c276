"""Symmetric int8 quantization for embedding tables (serving memory path).

At production scale the embedding tables dominate serve-time HBM (SURVEY.md
C6); per-row symmetric int8 cuts them 4× with negligible ranking impact
(tests assert top-k neighbor overlap and logit fidelity on a trained
table). Encode is per-row absmax → int8 with round-to-nearest; decode is a
gather + row-scale multiply that XLA fuses into the consuming matmul.

The reference has no quantization story at all — this is a forward-looking
production facility, off by default everywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class QuantizedTable:
    """Per-row symmetric int8: row = values[i] * scales[i]."""

    values: jnp.ndarray  # [N, D] int8
    scales: jnp.ndarray  # [N] float32  (absmax/127 per row)

    @property
    def shape(self):
        return self.values.shape

    def nbytes(self) -> int:
        return self.values.size + self.scales.size * 4


# Registered as a pytree so a QuantizedTable can sit inside the params tree
# everywhere an array table can: jit arguments, device_put (incl. mesh
# shardings), tree.map. Both fields are data leaves; there is no static part.
jax.tree_util.register_pytree_node(
    QuantizedTable,
    lambda qt: ((qt.values, qt.scales), None),
    lambda _, children: QuantizedTable(values=children[0], scales=children[1]),
)


def quantize_table(table: jnp.ndarray) -> QuantizedTable:
    """[N, D] float → per-row int8 + scales. Zero rows get scale 1."""
    absmax = jnp.max(jnp.abs(table), axis=1)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(table / scales[:, None]), -127, 127).astype(jnp.int8)
    return QuantizedTable(values=q, scales=scales.astype(jnp.float32))


def dequantize(qt: QuantizedTable) -> jnp.ndarray:
    return qt.values.astype(jnp.float32) * qt.scales[:, None]


def quantized_lookup(qt: QuantizedTable, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather + dequantize rows; the scale multiply fuses into the consumer.
    ids may have any shape — scales broadcast along the embedding axis."""
    rows = qt.values[ids].astype(jnp.float32)
    return rows * qt.scales[ids][..., None]


def table_lookup(table, ids: jnp.ndarray) -> jnp.ndarray:
    """Row gather that accepts either a plain [N, D] array or a
    QuantizedTable — the single lookup entry point the model uses, so a
    params tree with quantized embedding tables runs through the same
    jitted programs (the isinstance dispatch is trace-time static)."""
    if isinstance(table, QuantizedTable):
        return quantized_lookup(table, ids)
    return table[ids]


def quantize_embedding_params(params: dict) -> dict:
    """Return a copy of a DCN params tree with the embedding tables
    (user, item, per-categorical) quantized to per-row int8 — the serve
    memory/bandwidth opt-in (`--quantize-tables`). Dense tower weights
    stay f32: they are tiny and their matmuls accumulate over the whole
    feature axis where int8 error compounds."""
    out = dict(params)
    out["user_embedding"] = quantize_table(params["user_embedding"])
    out["item_embedding"] = quantize_table(params["item_embedding"])
    out["cat_embeddings"] = [quantize_table(t) for t in params["cat_embeddings"]]
    return out


def quantization_error(table: jnp.ndarray) -> float:
    """Max relative row-norm error of the int8 round trip (diagnostics)."""
    deq = dequantize(quantize_table(table))
    num = jnp.linalg.norm(deq - table, axis=1)
    den = jnp.maximum(jnp.linalg.norm(table, axis=1), 1e-12)
    return float(jnp.max(num / den))
