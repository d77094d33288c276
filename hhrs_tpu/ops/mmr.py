"""Maximal Marginal Relevance diversification, fully on device.

Reference semantics (reference main.py:133-169), reproduced exactly:
  * the top-scored candidate is selected unconditionally first;
  * each subsequent pick maximizes  λ·relevance − (1−λ)·max_cos_sim
    to the already-selected items, where ONLY items with trained
    embeddings participate in similarity (and only such items are
    selectable after the first pick — candidates without an embedding are
    skipped by the reference loop);
  * selection stops at min(top_k, n_candidates).

Implemented as top_k-1 UNROLLED steps (top_k is static and small); each
step is one [M, d]·[d] matvec (VPU/MXU) plus masked argmax — no host
round-trips (the reference does O(k·|C|) sklearn cosine_similarity calls
per request). Unrolling matters: device-side loop iterations carry a
multi-ms fixed cost on the tunneled TPU backend (RESULTS.md), which made
the fori_loop version ~20× the compute cost of the straight-line program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@partial(jax.jit, static_argnames=("top_k",))
def mmr_rerank(
    scores: jnp.ndarray,  # [M] relevance logits; NEG_INF/-inf for non-candidates
    emb_norm: jnp.ndarray,  # [M, d] L2-normalized item embeddings (rows may be junk
    #                         for items without embeddings — masked via `embedded`)
    cand_mask: jnp.ndarray,  # [M] bool candidate set
    embedded: jnp.ndarray,  # [M] bool: item has a trained embedding
    lambda_param: jnp.ndarray,  # scalar in [0, 1]
    top_k: int = 20,
) -> jnp.ndarray:
    """Returns [top_k] selected serve-item indices, -1 padded."""
    M = scores.shape[0]
    n_cand = jnp.sum(cand_mask)
    n_select = jnp.minimum(top_k, n_cand)

    masked_scores = jnp.where(cand_mask, scores, NEG_INF)
    first = jnp.argmax(masked_scores)
    have_any = n_cand > 0

    # Reference tie-break: the loop iterates candidates in DESCENDING
    # relevance order (stable) and keeps the first strict improvement
    # (main.py:148-166), so among equal-MMR candidates the earlier one in
    # that order wins — not the lowest index, which is what a bare argmax
    # would pick. rank = each item's position in that iteration order.
    rank = jnp.zeros(M, jnp.int32).at[jnp.argsort(-masked_scores)].set(
        jnp.arange(M, dtype=jnp.int32)
    )

    selected = jnp.zeros(M, bool).at[first].set(have_any)
    out = jnp.full((top_k,), -1, jnp.int32)
    out = out.at[0].set(jnp.where(have_any, first.astype(jnp.int32), -1))

    # similarity to the selected set so far; only embedded picks contribute
    sim_first = jnp.dot(emb_norm, emb_norm[first], preferred_element_type=jnp.float32)
    max_sim = jnp.where(have_any & embedded[first], sim_first, jnp.zeros(M))

    def body(t, carry):
        out, selected, max_sim = carry
        selectable = cand_mask & ~selected & embedded
        mmr = lambda_param * scores - (1.0 - lambda_param) * max_sim
        mmr = jnp.where(selectable, mmr, NEG_INF)
        # lexicographic argmax: max MMR, ties by earliest reference-order rank
        j = jnp.argmin(jnp.where(mmr == jnp.max(mmr), rank, M + 1))
        ok = (t < n_select) & jnp.any(selectable)
        out = out.at[t].set(jnp.where(ok, j.astype(jnp.int32), -1))
        selected = selected.at[j].set(selected[j] | ok)
        sim_j = jnp.dot(emb_norm, emb_norm[j], preferred_element_type=jnp.float32)
        max_sim = jnp.where(ok, jnp.maximum(max_sim, sim_j), max_sim)
        return out, selected, max_sim

    carry = (out, selected, max_sim)
    for t in range(1, top_k):  # static unroll (top_k ≤ ~20)
        carry = body(t, carry)
    return carry[0]
