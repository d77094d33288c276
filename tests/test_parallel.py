"""Parallel layer tests on the 8-device virtual CPU mesh (SURVEY.md §4):
row-sharded lookups are exact vs. unsharded gathers, and the pjit'ed
data+model-parallel train step matches single-device training numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.models.dcn import ModelDims, init_dcn
from hhrs_tpu.parallel.embedding import all_to_all_lookup, pad_table, psum_lookup
from hhrs_tpu.parallel.mesh import make_mesh, mesh_shape_for
from hhrs_tpu.parallel.sharding import param_pspecs
from hhrs_tpu.parallel.trainer import (
    make_parallel_train_step,
    shard_train_state,
)
from hhrs_tpu.train.optimizers import make_optimizer

DIMS = ModelDims(n_users=64, n_items=48, cat_dims=(("city", 6), ("hotel_type", 5)), n_num_features=11)


def tiny_batch(rng, b=32):
    ks = jax.random.split(rng, 5)
    return {
        "user": jax.random.randint(ks[0], (b,), 0, DIMS.n_users),
        "item": jax.random.randint(ks[1], (b,), 0, DIMS.n_items),
        "cat": jnp.stack(
            [
                jax.random.randint(ks[2], (b,), 0, 6),
                jax.random.randint(ks[2], (b,), 0, 5),
            ],
            axis=1,
        ),
        "num": jax.random.normal(ks[3], (b, 11)),
        "y": jax.random.bernoulli(ks[4], 0.5, (b,)).astype(jnp.float32),
    }


def test_mesh_shape_for():
    assert mesh_shape_for(8) == (4, 2)
    assert mesh_shape_for(2) == (2, 1)
    assert mesh_shape_for(8, model_axis=4) == (2, 4)
    assert mesh_shape_for(6, model_axis=4) == (3, 2)  # 4 doesn't divide 6 → fall to 2


@pytest.mark.parametrize("rows", [64, 61])  # even and ragged (needs pad)
def test_psum_lookup_exact(eight_devices, rows):
    mesh = make_mesh(4, 2)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (rows, 16))
    ids = jax.random.randint(jax.random.PRNGKey(1), (32,), 0, rows)
    padded = pad_table(table, 2)
    out = psum_lookup(mesh, padded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), rtol=1e-6)


@pytest.mark.parametrize("rows", [64, 61])
def test_all_to_all_lookup_exact(eight_devices, rows):
    mesh = make_mesh(4, 2)
    table = jax.random.normal(jax.random.PRNGKey(0), (rows, 16))
    # B must divide data*model = 8 for the double-sharded id vector.
    ids = jax.random.randint(jax.random.PRNGKey(1), (64,), 0, rows)
    out = all_to_all_lookup(mesh, pad_table(table, 2), ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), rtol=1e-6)


def test_all_to_all_lookup_skewed_ids(eight_devices):
    """Worst-case skew: every id owned by shard 0 (capacity path)."""
    mesh = make_mesh(4, 2)
    table = jax.random.normal(jax.random.PRNGKey(0), (64, 8))
    ids = jnp.zeros((64,), jnp.int32).at[: 8].set(jnp.arange(8))  # all rows < 32 → shard 0
    out = all_to_all_lookup(mesh, table, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), rtol=1e-6)


def test_param_pspecs_tables_sharded():
    params, _ = init_dcn(jax.random.PRNGKey(0), DIMS, ModelConfig())
    specs = param_pspecs(params)
    assert specs["user_embedding"] == jax.sharding.PartitionSpec("model", None)
    assert specs["item_embedding"] == jax.sharding.PartitionSpec("model", None)
    assert specs["cat_embeddings"][0] == jax.sharding.PartitionSpec("model", None)
    assert specs["final"]["kernel"] == jax.sharding.PartitionSpec()


def test_parallel_step_matches_single_device(eight_devices):
    """One fwd/bwd/update step on a 4x2 mesh == the same step unsharded."""
    mcfg = ModelConfig(emb_dim=8, hidden_dim=16, n_res_blocks=1, n_cross_layers=2, dropout=0.0)
    tcfg = TrainConfig(lr=1e-2, optimizer="adamw", weight_decay=1e-3)
    params, bn = init_dcn(jax.random.PRNGKey(0), DIMS, mcfg)
    tx = make_optimizer(tcfg.optimizer, tcfg.lr, tcfg.weight_decay)
    opt = tx.init(params)
    batch = tiny_batch(jax.random.PRNGKey(7), b=64)
    rng = jax.random.PRNGKey(3)

    # Reference: plain single-device jit.
    from hhrs_tpu.train.metrics import bce_with_logits
    from hhrs_tpu.models.dcn import apply_dcn

    def step(p, b_, o, batch, r):
        def loss_fn(pp):
            logits, nbn = apply_dcn(
                pp, b_, batch["user"], batch["item"], batch["cat"], batch["num"],
                cfg=mcfg, train=True, rng=r,
            )
            return bce_with_logits(logits, batch["y"]), nbn

        (loss, nbn), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, no = tx.update(g, o, p)
        return jax.tree.map(lambda a, u: a + u, p, up), nbn, no, loss

    ref_params, ref_bn, _, ref_loss = jax.jit(step)(params, bn, opt, batch, rng)

    mesh = make_mesh(4, 2)
    state = shard_train_state(mesh, params, bn, opt)
    jit_for = make_parallel_train_step(mesh, mcfg, tx.update, state, donate=False)
    pstep = jit_for(batch)
    new_params, new_bn, _, loss = pstep(state.params, state.bn_state, state.opt_state, batch, rng)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    # Post-Adam params only match loosely: first-step Adam is g/(|g|+eps),
    # which amplifies the reordered-reduction noise of sharded matmuls for
    # near-zero gradients. BN state (pure statistics) must match tightly.
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(new_params)),
        jax.tree_util.tree_leaves(jax.device_get(ref_params)),
    ):
        np.testing.assert_allclose(a, b, atol=tcfg.lr, rtol=0)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(new_bn)),
        jax.tree_util.tree_leaves(jax.device_get(ref_bn)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    # The meaningful exactness check: gradients themselves agree.
    def grads_of(p, b_, batch, r):
        def loss_fn(pp):
            logits, _ = apply_dcn(
                pp, b_, batch["user"], batch["item"], batch["cat"], batch["num"],
                cfg=mcfg, train=True, rng=r,
            )
            return bce_with_logits(logits, batch["y"])

        return jax.grad(loss_fn)(p)

    ref_g = jax.jit(grads_of)(params, bn, batch, rng)
    sh_g = jax.jit(grads_of, in_shardings=(state.shardings["params"], None, None, None))(
        state.params, state.bn_state, batch, rng
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(sh_g)),
        jax.tree_util.tree_leaves(jax.device_get(ref_g)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)


def test_sharded_cosine_topk_exact(eight_devices):
    """Row-sharded top-k == unsharded cosine_topk (scores exact, indices
    equal where scores are untied)."""
    from hhrs_tpu.retrieval.sharded import sharded_cosine_topk
    from hhrs_tpu.retrieval.similarity import cosine_topk, normalize_rows

    mesh = make_mesh(4, 2)
    N, d, Q, k = 256, 32, 16, 10
    table = normalize_rows(jax.random.normal(jax.random.PRNGKey(0), (N, d)))
    queries = jax.random.normal(jax.random.PRNGKey(1), (Q, d))

    ref_v, ref_i = cosine_topk(table, queries, k)
    sh_v, sh_i = sharded_cosine_topk(mesh, table, queries, k)
    np.testing.assert_allclose(np.asarray(sh_v), np.asarray(ref_v), rtol=1e-5, atol=1e-6)
    # continuous random scores → ties have measure zero
    np.testing.assert_array_equal(np.asarray(sh_i), np.asarray(ref_i))


def test_make_sharded_topk_fn(eight_devices):
    from hhrs_tpu.retrieval.sharded import make_sharded_topk_fn
    from hhrs_tpu.retrieval.similarity import cosine_topk, normalize_rows

    mesh = make_mesh(2, 4)
    fn, table_sharding = make_sharded_topk_fn(mesh, k=5)
    table = normalize_rows(jax.random.normal(jax.random.PRNGKey(2), (128, 16)))
    table_sharded = jax.device_put(table, table_sharding)
    queries = jax.random.normal(jax.random.PRNGKey(3), (8, 16))
    v, i = fn(table_sharded, queries)
    rv, ri = cosine_topk(table, queries, 5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_sharded_item_scorer_matches_unsharded(eight_devices):
    """Sharded-catalog scoring == plain apply_dcn over all items (ragged M)."""
    from hhrs_tpu.models.dcn import apply_dcn
    from hhrs_tpu.serve.sharded_scoring import ShardedItemScorer

    mcfg = ModelConfig(emb_dim=8, hidden_dim=16, n_res_blocks=1, n_cross_layers=1)
    params, bn = init_dcn(jax.random.PRNGKey(0), DIMS, mcfg)
    M = 45  # not divisible by 8 → padding path
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    item = jax.random.randint(ks[0], (M,), 0, DIMS.n_items)
    cat = jnp.stack([jax.random.randint(ks[1], (M,), 0, 6),
                     jax.random.randint(ks[1], (M,), 0, 5)], axis=1)
    num = jax.random.normal(ks[2], (M, 11))

    mesh = make_mesh(4, 2)
    scorer = ShardedItemScorer(mesh, params, bn, mcfg, item, cat, num)
    got = scorer.score_all(user_internal=3)

    users = jnp.full((M,), 3, jnp.int32)
    want, _ = apply_dcn(params, bn, users, item, cat, num, cfg=mcfg, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    v, i = scorer.top_k(user_internal=3, k=7)
    order = np.argsort(-np.asarray(want), kind="stable")[:7]
    np.testing.assert_array_equal(np.asarray(i), order)


@pytest.mark.parametrize("shape", [(8, 1), (1, 8), (2, 4)])
def test_lookup_mesh_shapes(eight_devices, shape):
    """Exchange kernels are correct across pure-DP, pure-MP, and mixed meshes."""
    d, m = shape
    mesh = make_mesh(d, m)
    table = jax.random.normal(jax.random.PRNGKey(0), (64, 8))
    ids = jax.random.randint(jax.random.PRNGKey(1), (64,), 0, 64)
    out_p = psum_lookup(mesh, pad_table(table, m), ids)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(table[ids]), rtol=1e-6)
    out_a = all_to_all_lookup(mesh, pad_table(table, m), ids)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(table[ids]), rtol=1e-6)


def test_parallel_training_converges_on_mesh(eight_devices):
    """Several sharded steps on a 2x4 mesh actually reduce the loss."""
    mcfg = ModelConfig(emb_dim=8, hidden_dim=16, n_res_blocks=1, n_cross_layers=1, dropout=0.0)
    params, bn = init_dcn(jax.random.PRNGKey(0), DIMS, mcfg)
    tx = make_optimizer("adamw", 5e-3, 1e-4)
    opt = tx.init(params)
    batch = tiny_batch(jax.random.PRNGKey(9), b=64)

    mesh = make_mesh(2, 4)
    state = shard_train_state(mesh, params, bn, opt)
    step = make_parallel_train_step(mesh, mcfg, tx.update, state, donate=False)(batch)
    ps, bs, os_ = state.params, state.bn_state, state.opt_state
    losses = []
    for i in range(20):
        ps, bs, os_, loss = step(ps, bs, os_, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9


def test_hardware_order_mesh(eight_devices):
    mesh = make_mesh(4, 2, hardware_order=True)
    assert mesh.shape == {"data": 4, "model": 2}
    # still computes correctly
    table = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
    ids = jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 32)
    out = psum_lookup(mesh, table, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), rtol=1e-6)


def test_capped_lookup_exact_when_capacity_suffices(eight_devices):
    """With near-uniform ids and factor 1.25, nothing overflows and the
    capped exchange equals the exact gather; factor=m always does."""
    from hhrs_tpu.parallel.embedding import capped_all_to_all_lookup

    mesh = make_mesh(4, 2)
    table = jax.random.normal(jax.random.PRNGKey(0), (64, 16))
    # balanced per DEVICE-LOCAL slice: the id vector shards contiguously
    # over 8 devices (8 ids each), so alternate owners by POSITION to give
    # every device a 4/4 destination split (capacity ceil(8/2)*1.25 = 5)
    pos = jnp.arange(64)
    ids = jnp.where(pos % 2 == 0, pos % 32, 32 + pos % 32).astype(jnp.int32)
    out, dropped = capped_all_to_all_lookup(mesh, table, ids, capacity_factor=1.25)
    assert not bool(dropped.any())
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), rtol=1e-6)

    # worst-case skew + factor=m (capacity b): still exact
    skew = jnp.zeros((64,), jnp.int32)
    out, dropped = capped_all_to_all_lookup(mesh, table, skew, capacity_factor=2.0)
    assert not bool(dropped.any())
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[skew]), rtol=1e-6)


def test_capped_lookup_counts_and_zeroes_overflow(eight_devices):
    """Adversarial skew beyond capacity: overflow rows come back 0 and the
    dropped mask reports exactly which — the documented approximation."""
    from hhrs_tpu.parallel.embedding import capped_all_to_all_lookup

    mesh = make_mesh(4, 2)
    table = jax.random.normal(jax.random.PRNGKey(0), (64, 8)) + 1.0  # no zero rows
    ids = jnp.zeros((64,), jnp.int32)  # every id owned by shard 0
    out, dropped = capped_all_to_all_lookup(mesh, table, ids, capacity_factor=1.0)
    out, dropped = np.asarray(out), np.asarray(dropped)
    # per device-local vector of b=8, m=2 → capacity ceil(8/2)*1 = 4 per
    # destination: half of each local batch overflows
    assert dropped.sum() == 32, dropped.sum()
    np.testing.assert_allclose(out[dropped], 0.0)
    np.testing.assert_allclose(out[~dropped], np.asarray(table[ids])[~dropped],
                               rtol=1e-6)


def test_capped_lookup_shrinks_all_to_all_wire_shapes(eight_devices):
    """The bandwidth claim, verified in the compiled HLO: the capped
    exchange's all-to-all operands carry capacity c per destination, not
    the exact variant's worst-case b."""
    import re

    from hhrs_tpu.parallel.embedding import (
        all_to_all_lookup,
        capped_all_to_all_lookup,
    )

    mesh = make_mesh(4, 2)
    table = jax.random.normal(jax.random.PRNGKey(0), (64, 16))
    ids = jnp.arange(256, dtype=jnp.int32) % 64

    def a2a_shapes(fn):
        hlo = jax.jit(fn).lower(table, ids).compile().as_text()
        shapes = set()
        for line in hlo.splitlines():
            if " all-to-all(" not in line:
                continue
            # result shapes print as a tuple BEFORE the op name:
            #   %x = (f32[1,32,16]{...}, ...) all-to-all(...)
            shapes.update(re.findall(r"f32\[([\d,]+)\]",
                                     line.split(" all-to-all(")[0]))
        return sorted(shapes)

    exact = a2a_shapes(lambda t, i: all_to_all_lookup(mesh, t, i))
    capped = a2a_shapes(
        lambda t, i: capped_all_to_all_lookup(mesh, t, i, capacity_factor=1.25)[0])
    # per-device b = 256/8 = 32; exact vector hop slices are [1, 32, 16]
    # per destination; capped: c = ceil(32/2)*1.25 = 20 → [1, 20, 16]
    assert any(s.endswith("32,16") for s in exact), exact
    assert any(s.endswith("20,16") for s in capped), capped
    assert not any(s.endswith("32,16") for s in capped), capped


def test_capped_lookup_property_random_ids(eight_devices):
    """Property over random id distributions and capacity factors: kept
    rows are exactly the table rows, dropped rows are exactly zero, and
    the kept/dropped partition respects per-(device, destination) capacity."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hhrs_tpu.parallel.embedding import capped_all_to_all_lookup

    mesh = make_mesh(4, 2)
    table = jax.random.normal(jax.random.PRNGKey(0), (64, 8)) + 2.0  # no zeros

    @settings(max_examples=15, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        factor=st.sampled_from([1.0, 1.25, 1.5, 2.0]),
    )
    def check(seed, factor):
        ids = jax.random.randint(jax.random.PRNGKey(seed), (64,), 0, 64)
        out, dropped = capped_all_to_all_lookup(mesh, table, ids,
                                                capacity_factor=factor)
        out, dropped = np.asarray(out), np.asarray(dropped)
        expect = np.asarray(table[ids])
        np.testing.assert_allclose(out[~dropped], expect[~dropped], rtol=1e-6)
        np.testing.assert_allclose(out[dropped], 0.0)
        # capacity accounting: per device-local slice of 8 ids, at most
        # c = ceil(8/2 * factor) survive per destination shard
        import math

        c = min(8, math.ceil(8 / 2 * factor))
        ids_np, kept = np.asarray(ids), ~dropped
        for dev in range(8):
            sl = slice(dev * 8, (dev + 1) * 8)
            owners = ids_np[sl] // 32
            for dst in (0, 1):
                n_kept = int((kept[sl] & (owners == dst)).sum())
                assert n_kept <= c, (dev, dst, n_kept, c)
                # and the bound is tight: kept count = min(bucket size, c)
                assert n_kept == min(int((owners == dst).sum()), c)

    check()


def test_sharded_scorer_topk_merge_exact_and_shard_local(eight_devices):
    """top_k must equal the full-gather reference AND actually lower to a
    per-shard reduction: the all-gather operands in the compiled HLO carry
    k elements per shard, never the full catalog slice."""
    import re

    from hhrs_tpu.config import ModelConfig
    from hhrs_tpu.models.dcn import init_dcn
    from hhrs_tpu.parallel.mesh import make_mesh
    from hhrs_tpu.serve.sharded_scoring import ShardedItemScorer

    mesh = make_mesh(4, 2)
    dims = DIMS
    mcfg = ModelConfig(emb_dim=8, hidden_dim=16, n_cross_layers=1, n_res_blocks=1)
    params, bn = init_dcn(jax.random.PRNGKey(0), dims, mcfg)
    M = 203  # ragged → padding path
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    scorer = ShardedItemScorer(
        mesh, params, bn, mcfg,
        jax.random.randint(ks[0], (M,), 0, dims.n_items),
        jnp.stack([jax.random.randint(ks[1], (M,), 0, n) for _, n in dims.cat_dims], axis=1),
        jax.random.normal(ks[2], (M, dims.n_num_features)),
    )
    for k in (5, 40):
        vals, idx = scorer.top_k(user_internal=3, k=k)
        ref_logits = np.asarray(scorer.score_all(3))
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(ref_logits), k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=1e-6)
        # indices may differ on exact ties; scores at those indices may not
        np.testing.assert_allclose(ref_logits[np.asarray(idx)], np.asarray(ref_v),
                                   rtol=1e-6)

    # wire-shape proof: the merge's f32 all-gather moves k per shard, not
    # the 26-row catalog slice
    fn, n_shards = scorer._topk_program(5)
    hlo = fn.lower(scorer._params, scorer._bn, scorer._item, scorer._cat,
                   scorer._num, scorer._valid, jnp.asarray(3, jnp.int32)
                   ).compile().as_text()
    ag_shapes = set()
    for line in hlo.splitlines():
        if " all-gather(" in line:
            ag_shapes.update(re.findall(r"f32\[([\d,]+)\]",
                                        line.split(" all-gather(")[0]))
    # padded catalog 208 → 26 rows/shard; gathered vector = 8 shards × 5
    assert any(s == "40" for s in ag_shapes), ag_shapes
    assert not any(s in ("208", "26") for s in ag_shapes), ag_shapes
