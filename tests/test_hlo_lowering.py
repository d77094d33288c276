"""Collective-lowering assertions for the mesh train step (VERDICT r3 §2).

The production mesh step writes global-view ``table[ids]`` lookups on
row-sharded tables and trusts GSPMD to lower them to collectives. Every
numeric test passes on a virtual mesh no matter HOW the lowering happens —
if XLA chose to all-gather a sharded table to full shape, the north-star
memory/bandwidth property would die silently at pod scale. These tests pin
the property in the compiled HLO itself:

  * the GSPMD-default step contains NO all-gather that reconstructs a full
    embedding table (the lookups lower to masked local gathers + the psum
    pattern's all-reduce);
  * the explicit-exchange step (``exchange='all_to_all'``) really lowers to
    ``all-to-all`` collectives — the hand-written two-hop ID/vector
    exchange (parallel/embedding.py) inside a real training forward+backward;
  * all step variants produce the same numbers (grads compared via one
    SGD step — Adam's first-step g/(|g|+eps) amplifies benign
    reduction-order rounding).

Table sizes here are chosen so a full-table shape is unambiguous in the
HLO text (4096x16 user / 1024x16 item, far larger than any [B, ·]
activation this step materializes).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hhrs_tpu.config import ModelConfig
from hhrs_tpu.models.dcn import ModelDims, init_dcn
from hhrs_tpu.parallel.mesh import make_mesh
from hhrs_tpu.parallel.trainer import make_parallel_train_step, shard_train_state
from hhrs_tpu.train.optimizers import make_optimizer

N_USERS, N_ITEMS = 4096, 1024
EMB = 16
DIMS = ModelDims(N_USERS, N_ITEMS, (("city", 64), ("hotel_type", 8)), 11)
B = 256  # divides data*model = 8 (the all_to_all id vector shards over both)


def _batch(seed=0):
    r = np.random.default_rng(seed)
    return {
        "user": jnp.asarray(r.integers(0, N_USERS, B).astype(np.int32)),
        "item": jnp.asarray(r.integers(0, N_ITEMS, B).astype(np.int32)),
        "cat": jnp.asarray(
            np.stack([r.integers(0, d, B) for d in (64, 8)], 1).astype(np.int32)
        ),
        "num": jnp.asarray(r.normal(size=(B, 11)).astype(np.float32)),
        "y": jnp.asarray((r.uniform(size=B) < 0.5).astype(np.float32)),
    }


def _compiled_step(exchange, tx, mesh, capacity_factor=1.25):
    cfg = ModelConfig()
    params, bn = init_dcn(jax.random.PRNGKey(0), DIMS, cfg)
    opt = tx.init(params)
    state = shard_train_state(mesh, params, bn, opt)
    batch = _batch()
    step = make_parallel_train_step(
        mesh, cfg, tx.update, state, donate=False, exchange=exchange,
        capacity_factor=capacity_factor,
    )(batch)
    rng = jax.random.PRNGKey(1)
    lowered = step.lower(state.params, state.bn_state, state.opt_state, batch, rng)
    return step, state, batch, rng, lowered.compile().as_text()


def _allgather_out_shapes(hlo: str) -> list[tuple[int, ...]]:
    """Output dims of every all-gather instruction in the HLO text."""
    shapes = []
    for m in re.finditer(r"=\s*\w+\[([\d,]*)\][^\s]*\s+all-gather\(", hlo):
        dims = tuple(int(d) for d in m.group(1).split(",") if d)
        shapes.append(dims)
    return shapes


def _assert_no_full_table_allgather(hlo: str):
    table_elems = min(N_ITEMS * EMB, N_USERS * EMB)
    for dims in _allgather_out_shapes(hlo):
        elems = int(np.prod(dims)) if dims else 1
        # No all-gather may reconstruct anything table-sized, and none may
        # have a leading dim equal to a full table's row count.
        assert elems < table_elems, f"full-table all-gather in HLO: {dims}"
        assert dims[:1] not in ((N_USERS,), (N_ITEMS,)), dims


def test_gspmd_lookups_lower_without_full_table_allgather(eight_devices):
    mesh = make_mesh(4, 2)
    tx = make_optimizer("adamw", 1e-3, 1e-4)
    _, _, _, _, hlo = _compiled_step(None, tx, mesh)
    _assert_no_full_table_allgather(hlo)
    # The cross-shard exchange is real: the psum-pattern reduction (masked
    # local gather + all-reduce) plus the grad psum must appear.
    assert len(re.findall(r"all-reduce\(", hlo)) >= 1
    # and the local table gathers exist (dynamic-slice/gather family)
    assert re.search(r"\bgather\(|dynamic-slice\(", hlo)


def test_explicit_all_to_all_step_lowers_to_all_to_all(eight_devices):
    mesh = make_mesh(4, 2)
    tx = make_optimizer("adamw", 1e-3, 1e-4)
    _, _, _, _, hlo = _compiled_step("all_to_all", tx, mesh)
    _assert_no_full_table_allgather(hlo)
    # two sharded tables x (ids + valid hops forward, vector hop back) and
    # their transposes in the backward — at least a handful of all-to-alls
    assert len(re.findall(r"all-to-all\(", hlo)) >= 4


@pytest.mark.parametrize("exchange", ["psum", "all_to_all"])
def test_explicit_exchange_grad_parity_vs_gspmd(eight_devices, exchange):
    """One SGD(1.0) step isolates the gradients: params' change IS the grad.

    The explicit shard_map exchanges must produce the same loss and the
    same gradients as GSPMD's own lowering of the global-view lookups.
    """
    mesh = make_mesh(4, 2)
    tx = optax.sgd(1.0)

    outs = {}
    for kind in (None, exchange):
        step, state, batch, rng, _ = _compiled_step(kind, tx, mesh)
        p2, _, _, loss = step(state.params, state.bn_state, state.opt_state, batch, rng)
        outs[kind] = (jax.device_get(p2), float(loss))

    assert outs[exchange][1] == pytest.approx(outs[None][1], rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[None][0]),
        jax.tree_util.tree_leaves(outs[exchange][0]),
    ):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def _alltoall_shapes(hlo: str) -> list[tuple[int, ...]]:
    """Output dims of every all-to-all instruction in the HLO text.

    XLA decomposes the tiled all-to-all into per-peer slices with a TUPLE
    result — ``= (s32[1,32]{1,0}, s32[1,32]{1,0}) all-to-all(...)`` — so
    each tuple element's dims are one bucket: (1, capacity, ...)."""
    shapes = []
    for m in re.finditer(r"=\s*\(([^)]*)\)\s+all-to-all\(", hlo):
        for t in re.finditer(r"\w+\[([\d,]*)\]", m.group(1)):
            shapes.append(tuple(int(d) for d in t.group(1).split(",") if d))
    for m in re.finditer(r"=\s*\w+\[([\d,]*)\][^\s]*\s+all-to-all\(", hlo):
        shapes.append(tuple(int(d) for d in m.group(1).split(",") if d))
    return shapes


def test_capped_exchange_shrinks_all_to_all_operands(eight_devices):
    """VERDICT r4 item 3: the capped exchange's bandwidth saving must be
    visible in the compiled HLO — every all-to-all rides buckets of the
    capped capacity c = ceil(b/m · factor), never the exact variant's
    worst-case b."""
    mesh = make_mesh(4, 2)  # per-device ids b = 256/8 = 32; m = 2
    tx = make_optimizer("adamw", 1e-3, 1e-4)

    _, _, _, _, hlo_exact = _compiled_step("all_to_all", tx, mesh)
    _, _, _, _, hlo_capped = _compiled_step("capped", tx, mesh,
                                            capacity_factor=1.25)
    b, m = 32, 2
    c = -(-b * 125 // (m * 100))  # ceil(32/2 * 1.25) = 20

    exact = _alltoall_shapes(hlo_exact)
    capped = _alltoall_shapes(hlo_capped)
    assert exact and capped
    # exact variant: worst-case per-peer buckets (1, b, ...)
    assert any(s[:2] == (1, b) for s in exact), exact
    # capped variant: every bucket shrank to capacity c — none at b
    assert any(s[:2] == (1, c) for s in capped), capped
    assert all(s[1] <= c for s in capped if len(s) >= 2), capped
    _assert_no_full_table_allgather(hlo_capped)


def test_capped_exchange_at_factor_m_matches_gspmd_grads(eight_devices):
    """capacity_factor = m recovers the exact exchange: loss and one-step
    SGD grads agree with GSPMD's own lowering; overflow counts ZERO."""
    mesh = make_mesh(4, 2)
    tx = optax.sgd(1.0)

    step, state, batch, rng, _ = _compiled_step(None, tx, mesh)
    p_ref, _, _, loss_ref = step(
        state.params, state.bn_state, state.opt_state, batch, rng)

    step, state, batch, rng, _ = _compiled_step("capped", tx, mesh,
                                                capacity_factor=2.0)
    p_cap, _, _, (loss_cap, ovf) = step(
        state.params, state.bn_state, state.opt_state, batch, rng)

    ovf = np.asarray(ovf)
    # FOUR tables row-shard on a 2-way model axis (user, item, and both
    # cat vocabs 64/8 divide 2) → total = 4·B id-instances per step
    assert ovf[0] == 0 and ovf[1] == 4 * B
    assert float(loss_cap) == pytest.approx(float(loss_ref), rel=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(jax.device_get(p_ref)),
                     jax.tree_util.tree_leaves(jax.device_get(p_cap))):
        np.testing.assert_allclose(a, b_, atol=1e-5, rtol=1e-5)


def test_capped_exchange_counts_overflow_under_skew(eight_devices):
    """A deliberately skewed id distribution (every user id owned by model
    shard 0) must overflow the capped buckets and be COUNTED, not silent."""
    mesh = make_mesh(4, 2)
    tx = optax.sgd(1.0)
    cfg = ModelConfig()
    params, bn = init_dcn(jax.random.PRNGKey(0), DIMS, cfg)
    opt = tx.init(params)
    state = shard_train_state(mesh, params, bn, opt)
    batch = _batch()
    # all user ids < N_USERS/2 → shard 0 owns every lookup; capacity
    # c = ceil(b/m · 1.25) < b drops the excess deterministically
    batch["user"] = batch["user"] % (N_USERS // 2)
    step = make_parallel_train_step(
        mesh, cfg, tx.update, state, donate=False, exchange="capped",
        capacity_factor=1.25,
    )(batch)
    _, _, _, (loss, ovf) = step(
        state.params, state.bn_state, state.opt_state, batch,
        jax.random.PRNGKey(1))
    ovf = np.asarray(ovf)
    assert ovf[1] == 4 * B  # four sharded tables (see factor-m test)
    # user lookups: per device b=32 all bound for one shard, capacity 20
    # → 12 dropped per device × 8 devices = 96 (item ids stay uniform)
    assert ovf[0] >= 64, ovf
    assert np.isfinite(float(loss))
