"""pjit'ed DCN-R trainer.

Reproduces the reference training loop semantics (reference train.py:195-253):
shuffled minibatches, Adam/AdamW, BCE-with-logits, ReduceLROnPlateau on the
val loss, ≤50 epochs with early-stop patience 5, best-checkpoint retention,
and an optional per-epoch pruning hook for HPO.

TPU-first mechanics:
  * the full (small) dataset lives on device; each step ships only a [B]
    int32 index vector and gathers the batch on-chip — no per-step host
    feature copies;
  * one jitted train step with static shapes (ragged tail dropped); the
    learning rate is an injected optax hyperparameter so plateau decays
    never recompile;
  * evaluation runs as a single jitted ``lax.scan`` over padded val batches;
  * with a ``jax.sharding.Mesh``, the FULL production layout engages:
    embedding tables row-sharded over the ``model`` axis (opt-state moments
    matching), dense tower replicated, batch sharded over ``data`` — XLA
    inserts the table-gather collectives, the grad psum, and the
    cross-shard BatchNorm reductions (sync-BN falls out of the global-view
    batch mean). The epoch's shuffled examples stream to the mesh as ONE
    [steps, B, ·] transfer per epoch sharded ``P(None, 'data')``: every
    device receives exactly its batch slice (no resident replicated
    dataset — per-device memory is epoch_bytes / n_data — and batch
    formation needs zero collectives), while the batch COMPOSITION stays
    identical to the single-device resident path, so mesh training matches
    it numerically (tests/test_parallel_full_run.py).
"""

from __future__ import annotations

import logging
import statistics
import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data.preprocess import DatasetSplits
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
from hhrs_tpu.train.metrics import auc_score, bce_with_logits, recall_at_k, rmse_of_probs
from hhrs_tpu.train.optimizers import (
    PlateauScheduler,
    make_optimizer,
    set_learning_rate,
)

log = logging.getLogger(__name__)


@dataclass
class TrainResult:
    params: dict
    bn_state: dict
    history: list = field(default_factory=list)  # per-epoch dicts
    best_val_loss: float = float("inf")
    best_epoch: int = -1
    final_metrics: dict = field(default_factory=dict)
    examples_per_s: float = 0.0
    pruned: bool = False


def derive_impl_key(epoch_rng, impl: str):
    """Re-wrap a legacy threefry uint32[2] epoch key in ``impl``'s key format.

    rbg/unsafe_rbg key data is uint32[4]; the four words are derived by
    SPLITTING the threefry key once and concatenating both child keys, so
    the two 64-bit halves are independent threefry outputs. (Tiling the
    same 64 bits into both halves — the round-2 version — confined keys
    to a correlated 64-bit subspace; ADVICE r2.) Deterministic: same
    epoch key → same derived key.
    """
    return jax.random.wrap_key_data(
        jnp.concatenate(jax.random.split(epoch_rng)), impl=impl)


def _val_arrays(splits: DatasetSplits):
    return {
        "user": jnp.asarray(splits.val_user, jnp.int32),
        "item": jnp.asarray(splits.val_item, jnp.int32),
        "cat": jnp.asarray(splits.val_cat, jnp.int32),
        "num": jnp.asarray(splits.val_num, jnp.float32),
        "y": jnp.asarray(splits.val_y, jnp.float32),
    }


def _device_put_splits(splits: DatasetSplits):
    put = jax.device_put
    train = {
        "user": put(jnp.asarray(splits.train_user, jnp.int32)),
        "item": put(jnp.asarray(splits.train_item, jnp.int32)),
        "cat": put(jnp.asarray(splits.train_cat, jnp.int32)),
        "num": put(jnp.asarray(splits.train_num, jnp.float32)),
        "y": put(jnp.asarray(splits.train_y, jnp.float32)),
    }
    return train, _val_arrays(splits)


def _make_update_block(cfg: ModelConfig, train_cfg=None, *, mesh=None,
                       exchange: str | None = None,
                       capacity_factor: float = 1.25):
    """The loss/grad/optimizer core shared by both step builders: the dense
    reference-parity path by default, the lazy sparse-row table path when
    ``train_cfg.lazy_table_updates`` (train/lazy.py — opt_state is then a
    LazyOptState).

    ``exchange`` ('all_to_all' | 'psum' | 'capped', requires ``mesh``)
    swaps the global-view ``table[ids]`` lookups for the EXPLICIT shard_map
    exchange kernels (parallel/embedding.py) — the hand-written form of the
    row-sharded lookup, available as the fallback should GSPMD's lowering
    regress (the default lowering is pinned by tests/test_hlo_lowering.py).
    'capped' is the skew-bounded production exchange (wire bytes
    m/``capacity_factor``-fold lower; over-capacity ids dropped + counted):
    the update then returns ``(loss, overflow int32[2])`` in the loss slot
    so the epoch loop can log the measured drop rate.
    """
    if train_cfg is not None and getattr(train_cfg, "lazy_table_updates", False):
        if exchange:
            raise ValueError(
                "train.lazy_table_updates and mesh.explicit_exchange are "
                "mutually exclusive (lazy differentiates w.r.t. gathered "
                "rows; the exchange differentiates w.r.t. sharded tables)"
            )
        from hhrs_tpu.train.lazy import make_lazy_update

        return make_lazy_update(cfg, train_cfg)

    if exchange:
        if mesh is None:
            raise ValueError("explicit_exchange requires a mesh")
        from hhrs_tpu.models.dcn import apply_dcn_from_x0
        from hhrs_tpu.parallel.embedding import explicit_x0

        capped = exchange == "capped"

        def update(params, bn_state, opt_state, tx_update, batch, rng):
            def loss_fn(p):
                x0 = explicit_x0(
                    mesh, p, batch["user"], batch["item"], batch["cat"],
                    batch["num"], kind=exchange,
                    capacity_factor=capacity_factor,
                )
                overflow = None
                if capped:
                    x0, overflow = x0
                logits, new_bn = apply_dcn_from_x0(
                    p, bn_state, x0, cfg=cfg, train=True, rng=rng,
                )
                return bce_with_logits(logits, batch["y"]), (new_bn, overflow)

            ((loss, (new_bn, overflow)), grads) = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx_update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            if capped:
                # overflow rides the loss slot as a pytree — the step
                # builders pass it through untouched and the epoch loop
                # unpacks it (train_dcn logs the per-epoch drop rate)
                return new_params, new_bn, new_opt, (loss, overflow)
            return new_params, new_bn, new_opt, loss

        return update

    def update(params, bn_state, opt_state, tx_update, batch, rng):
        def loss_fn(p):
            logits, new_bn = apply_dcn(
                p,
                bn_state,
                batch["user"],
                batch["item"],
                batch["cat"],
                batch["num"],
                cfg=cfg,
                train=True,
                rng=rng,
            )
            return bce_with_logits(logits, batch["y"]), new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx_update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return new_params, new_bn, new_opt, loss

    return update


def make_train_step(cfg: ModelConfig, batch_size: int, batch_sharding=None,
                    train_cfg=None, mesh=None, exchange=None,
                    capacity_factor: float = 1.25):
    """Build the jitted train step.

    The step receives the WHOLE epoch permutation (device-resident, uploaded
    once per epoch) plus a device-side step counter ``s`` that it increments
    and returns — so steady-state training performs ZERO host→device
    transfers per step (on the tunneled backend a per-step 16KB index upload
    costed a full RTT ≈ 10× the step's compute). Dropout randomness is
    ``fold_in(epoch_rng, s)``, identical between the per-step and
    fused-epoch paths.
    """
    B = batch_size
    update = _make_update_block(cfg, train_cfg, mesh=mesh, exchange=exchange,
                                capacity_factor=capacity_factor)

    def step(params, bn_state, opt_state, tx_update, data, perm, s, epoch_rng):
        idx = jax.lax.dynamic_slice(perm, (s * B,), (B,))
        rng = jax.random.fold_in(epoch_rng, s)
        batch = {
            "user": data["user"][idx],
            "item": data["item"][idx],
            "cat": data["cat"][idx],
            "num": data["num"][idx],
            "y": data["y"][idx],
        }
        if batch_sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_sharding(x.ndim)), batch
            )
        new_params, new_bn, new_opt, loss = update(
            params, bn_state, opt_state, tx_update, batch, rng
        )
        return new_params, new_bn, new_opt, loss, s + 1

    return step


def make_streamed_train_step(cfg: ModelConfig, batch_sharding=None, train_cfg=None,
                             mesh=None, exchange=None,
                             capacity_factor: float = 1.25):
    """Mesh-mode step over a streamed epoch tensor.

    ``epoch_data`` is a dict of [steps, B, ·] arrays sharded
    ``P(None, 'data')`` — step ``s`` slices its batch locally (each device
    already holds its rows; no gather, no collective). The rng stream
    (``fold_in(epoch_rng, s)``) and batch-row order are identical to
    ``make_train_step``'s resident-gather path, so the two are numerically
    interchangeable.
    """
    update = _make_update_block(cfg, train_cfg, mesh=mesh, exchange=exchange,
                                capacity_factor=capacity_factor)

    def step(params, bn_state, opt_state, tx_update, epoch_data, s, epoch_rng):
        rng = jax.random.fold_in(epoch_rng, s)
        batch = jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, s, 0, keepdims=False), epoch_data
        )
        if batch_sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_sharding(x.ndim)), batch
            )
        new_params, new_bn, new_opt, loss = update(
            params, bn_state, opt_state, tx_update, batch, rng
        )
        return new_params, new_bn, new_opt, loss, s + 1

    return step


def make_slab_train_step(cfg: ModelConfig, batch_sharding=None, train_cfg=None,
                         mesh=None, exchange=None,
                         capacity_factor: float = 1.25):
    """Out-of-core step over a [K, B, ·] slab (train.stream_slab_steps).

    Two device-carried counters: ``s_local`` indexes the slab, ``s_global``
    drives the dropout rng (``fold_in(epoch_rng, s_global)``) — the SAME
    stream as the resident path's step index, so slab streaming is
    bit-interchangeable with the resident dataset."""
    update = _make_update_block(cfg, train_cfg, mesh=mesh, exchange=exchange,
                                capacity_factor=capacity_factor)

    def step(params, bn_state, opt_state, tx_update, slab, s_local, s_global,
             epoch_rng):
        rng = jax.random.fold_in(epoch_rng, s_global)
        batch = jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, s_local, 0, keepdims=False),
            slab,
        )
        if batch_sharding is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_sharding(x.ndim)),
                batch,
            )
        new_params, new_bn, new_opt, loss = update(
            params, bn_state, opt_state, tx_update, batch, rng
        )
        return new_params, new_bn, new_opt, loss, s_local + 1, s_global + 1

    return step


def make_epoch_fn(cfg: ModelConfig, tx_update, steps_per_epoch: int, batch_size: int,
                  batch_sharding=None, train_cfg=None):
    """Whole-epoch lax.scan: ONE dispatch per epoch.

    At this model family's sizes a single step is a few hundred µs of
    device time, so per-step Python dispatch is a material tax; scanning
    the step over the epoch keeps the chip busy back-to-back. The rng
    stream (``fold_in(epoch_rng, s)``) is identical to the per-step path,
    so the two modes are interchangeable mid-training.
    """
    raw_step = make_train_step(cfg, batch_size, batch_sharding, train_cfg)

    def epoch(params, bn_state, opt_state, data, perm, epoch_rng):
        def body(carry, s):
            p, bn, opt = carry
            p, bn, opt, loss, _ = raw_step(p, bn, opt, tx_update, data, perm, s, epoch_rng)
            return (p, bn, opt), loss

        (params, bn_state, opt_state), losses = jax.lax.scan(
            body, (params, bn_state, opt_state), jnp.arange(steps_per_epoch)
        )
        return params, bn_state, opt_state, jnp.mean(losses)

    return epoch


def _eval_logits_body(cfg: ModelConfig, eval_batch: int, params, bn_state, val):
    """Full-val forward as a scan over padded batches → [n] logits."""
    n = val["user"].shape[0]
    n_pad = (-n) % eval_batch
    total = n + n_pad

    def pad(x):
        widths = [(0, n_pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    padded = jax.tree.map(pad, val)
    n_batches = total // eval_batch
    reshaped = jax.tree.map(
        lambda x: x.reshape((n_batches, eval_batch) + x.shape[1:]), padded
    )

    def body(carry, b):
        logits, _ = apply_dcn(
            params, bn_state, b["user"], b["item"], b["cat"], b["num"], cfg=cfg, train=False
        )
        return carry, logits

    _, all_logits = jax.lax.scan(body, None, reshaped)
    return all_logits.reshape(total)[:n]


def make_eval_loss_fn(cfg: ModelConfig, eval_batch: int):
    """Jitted full-val BCE → ONE device scalar per epoch.

    The epoch loop must not move bulk data over the host link (measured on
    the tunneled backend: host transfers are seconds-per-MB and erratic);
    per-epoch validation therefore reduces on device and ships back only
    the loss scalar. Full logits (final metrics) use make_eval_fn once.
    """

    @jax.jit
    def loss_fn(params, bn_state, val):
        logits = _eval_logits_body(cfg, eval_batch, params, bn_state, val)
        return bce_with_logits(logits, val["y"])

    return loss_fn


def make_eval_fn(cfg: ModelConfig, eval_batch: int, out_sharding=None):
    """Jitted full-val forward → [n] logits (final-metrics path).

    ``out_sharding`` (multi-process mesh runs): a replicated sharding so
    XLA all-gathers the data-sharded logits — ``np.asarray`` on a
    partially-addressable array is an error on a multi-host run."""

    def body(params, bn_state, val):
        return _eval_logits_body(cfg, eval_batch, params, bn_state, val)

    if out_sharding is not None:
        return jax.jit(body, out_shardings=out_sharding)
    return jax.jit(body)


def train_dcn(
    splits: DatasetSplits,
    dims: ModelDims,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    mesh=None,
    explicit_exchange: str | None = None,
    exchange_capacity_factor: float = 1.25,
    report_fn: Callable[[int, float], bool] | None = None,
    metrics_logger=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    init_state: tuple | None = None,
) -> TrainResult:
    """Full training run; returns the best checkpoint (by val loss) + history.

    ``report_fn(epoch, val_loss) -> should_prune`` is the HPO pruning hook
    (reference train.py:236-238). With ``checkpoint_dir`` the full loop
    state saves every ``checkpoint_every`` epochs and a rerun resumes from
    the latest completed epoch (train/checkpoint.py).

    ``explicit_exchange`` ('all_to_all' | 'psum' | 'capped'; mesh mode
    only) routes the row-sharded table lookups through the hand-written
    shard_map exchange kernels instead of GSPMD's lowering
    (parallel/embedding.py). 'capped' is the skew-bounded production
    exchange: per-(source, dest) bucket capacity ``ceil(b/m ·
    exchange_capacity_factor)`` instead of the exact worst case — wire
    bytes drop m/factor-fold; over-capacity ids are dropped (zero
    embedding block + zero table grad) and COUNTED, with the measured
    per-epoch drop rate logged and recorded in each history entry as
    ``exchange_overflow`` (quality trade documented in docs/MODEL.md).

    ``init_state=(params, bn_state)`` replaces the fresh ``init_dcn`` —
    the warm-start fine-tuning path (train/warmstart.py): optimizer
    moments start at zero and the rng streams (shuffle, dropout) are
    identical to a cold run, only the starting point differs.
    """
    if explicit_exchange and mesh is None:
        raise ValueError("train.explicit_exchange requires --mesh")
    if explicit_exchange not in (None, "", "all_to_all", "psum", "capped"):
        raise ValueError(
            f"unknown mesh.explicit_exchange {explicit_exchange!r}; "
            "expected 'all_to_all', 'psum' or 'capped'"
        )
    capped_exchange = explicit_exchange == "capped"
    if train_cfg.debug_nans:
        # Sticky for the process by design: a NaN aborts the run anyway.
        jax.config.update("jax_debug_nans", True)

    if train_cfg.rng_impl not in ("threefry2x32", "rbg"):
        raise ValueError(
            f"unknown train.rng_impl {train_cfg.rng_impl!r}; "
            "expected 'threefry2x32' or 'rbg'"
        )
    if train_cfg.eval_every < 1:
        raise ValueError(f"train.eval_every must be >= 1, got {train_cfg.eval_every}")

    rng = jax.random.PRNGKey(train_cfg.seed)
    init_rng, rng = jax.random.split(rng)
    if init_state is not None:
        params, bn_state = init_state
    else:
        params, bn_state = init_dcn(init_rng, dims, model_cfg)

    tx = make_optimizer(train_cfg.optimizer, train_cfg.lr, train_cfg.weight_decay,
                        moment_dtype=train_cfg.moment_dtype)
    if train_cfg.lazy_table_updates:
        # Sparse-row table updates (train/lazy.py): the optax state covers
        # only the dense subtree; table moments live row-wise in LazyOptState.
        from hhrs_tpu.train.lazy import init_lazy_opt

        opt_state = init_lazy_opt(tx, params)
    else:
        opt_state = tx.init(params)

    # Mesh mode = the production layout: tables row-sharded over 'model'
    # (when that axis exists), opt moments matching, batch over 'data', and
    # the epoch streamed shard-aligned instead of a device-resident
    # replicated dataset (see module docstring).
    mesh_mode = mesh is not None
    # mesh_resident_data: device-RESIDENT replicated dataset on the mesh
    # (uploaded once; per-epoch upload = one [n] perm vector) — the right
    # trade when the dataset fits per-device memory and the host link is
    # slow (measured 10x on the tunneled chip, RESULTS.md r5). Streaming
    # (the default) keeps per-device memory at epoch/d.
    mesh_resident = mesh_mode and train_cfg.mesh_resident_data
    streaming = mesh_mode and not mesh_resident
    batch_sharding = None
    param_sh = opt_sh = rep = None
    epoch_sharding = None
    if mesh_mode:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hhrs_tpu.parallel.multiprocess import (
            is_multiprocess, put_global_tree, replicated_host)
        from hhrs_tpu.parallel.sharding import opt_state_shardings, param_shardings

        # Multi-HOST run (jax.distributed initialized, mesh spans every
        # process's devices): epoch/val tensors feed per-process via
        # addressable shards (parallel/multiprocess.py), checkpoint state
        # gathers to replicated before device_get, and only process 0
        # writes files. Everything else — the step program, collectives,
        # plateau/early-stop decisions — is identical by construction
        # (all hosts compute the same host-side control flow from the
        # shared seed).
        multiproc = is_multiprocess()
        n_data_axis = mesh.shape.get("data", 1)
        if train_cfg.batch_size % n_data_axis != 0:
            raise ValueError(
                f"batch_size {train_cfg.batch_size} must divide over the "
                f"data axis ({n_data_axis} devices)"
            )
        model_axis = "model" if mesh.shape.get("model", 1) > 1 else None
        param_sh = param_shardings(params, mesh, model_axis)
        opt_sh = opt_state_shardings(opt_state, params, param_sh, mesh)
        rep = NamedSharding(mesh, P())
        params = jax.tree.map(jax.device_put, params, param_sh)
        bn_state = jax.device_put(bn_state, rep)
        opt_state = jax.tree.map(jax.device_put, opt_state, opt_sh)

        def batch_sharding(ndim):
            return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))

        def epoch_sharding(ndim):  # [steps, B, ·] — batch axis over data
            return NamedSharding(mesh, P(None, "data", *([None] * (ndim - 2))))

        def val_sharding(ndim):
            # shard the val set over data when it divides; tiny ragged val
            # sets replicate (uneven explicit device_put is not worth it)
            if splits.val_user.shape[0] % n_data_axis == 0:
                return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
            return rep

        if mesh_resident:
            # replicated resident train split: uploaded ONCE; the step
            # gathers each batch on-device from the full dataset exactly
            # like the single-device resident path (identical numerics),
            # then constrains the batch to P('data').
            train_host = {
                "user": np.asarray(splits.train_user, np.int32),
                "item": np.asarray(splits.train_item, np.int32),
                "cat": np.asarray(splits.train_cat, np.int32),
                "num": np.asarray(splits.train_num, np.float32),
                "y": np.asarray(splits.train_y, np.float32),
            }
            train_data = put_global_tree(
                train_host, {k: rep for k in train_host})
        else:
            train_data = None  # streamed per epoch from the host split arrays
        val_host = {
            "user": np.asarray(splits.val_user, np.int32),
            "item": np.asarray(splits.val_item, np.int32),
            "cat": np.asarray(splits.val_cat, np.int32),
            "num": np.asarray(splits.val_num, np.float32),
            "y": np.asarray(splits.val_y, np.float32),
        }
        val_data = put_global_tree(
            val_host, {k: val_sharding(v.ndim) for k, v in val_host.items()})
    elif train_cfg.stream_slab_steps > 0:
        # out-of-core: the train split never leaves the host whole; slabs
        # upload per epoch (see the slab branch of the epoch loop)
        train_data, val_data = None, jax.device_put(_val_arrays(splits))
    else:
        train_data, val_data = _device_put_splits(splits)

    def place_state(p, b, o):
        """(Re)place a possibly-host-side state triple with the run's shardings."""
        if mesh_mode:
            return (
                jax.tree.map(jax.device_put, p, param_sh),
                jax.device_put(b, rep),
                jax.tree.map(jax.device_put, o, opt_sh),
            )
        return jax.device_put(p), jax.device_put(b), jax.device_put(o)

    # tx.update is a function — close over it instead of passing it traced.
    # params/bn/opt donate: the step updates them in place in HBM.
    out_of_core = train_cfg.stream_slab_steps > 0
    if out_of_core:
        raw_step = make_slab_train_step(model_cfg, batch_sharding, train_cfg,
                                        mesh=mesh, exchange=explicit_exchange,
                                        capacity_factor=exchange_capacity_factor)
        step_fn = jax.jit(
            lambda p, b, o, sl, i, s, r: raw_step(p, b, o, tx.update, sl, i, s, r),
            donate_argnums=(0, 1, 2),
        )
    elif streaming:
        raw_step = make_streamed_train_step(model_cfg, batch_sharding, train_cfg,
                                            mesh=mesh, exchange=explicit_exchange,
                                            capacity_factor=exchange_capacity_factor)
        step_fn = jax.jit(
            lambda p, b, o, e, s, r: raw_step(p, b, o, tx.update, e, s, r),
            donate_argnums=(0, 1, 2),
        )
    else:
        raw_step = make_train_step(model_cfg, train_cfg.batch_size, batch_sharding,
                                   train_cfg, mesh=mesh,
                                   exchange=explicit_exchange,
                                   capacity_factor=exchange_capacity_factor)
        step_fn = jax.jit(
            lambda p, b, o, d, perm, s, r: raw_step(p, b, o, tx.update, d, perm, s, r),
            donate_argnums=(0, 1, 2),
        )

    # XLA:CPU runs each device's shard of a sharded program on one shared
    # client thread pool sized about the device count; with async dispatch
    # the Python loop pipelines step programs, and a later step's shard
    # tasks can occupy pool threads (blocked on the previous step's donated
    # outputs) before the current step's last shard gets a thread — starving
    # its collective rendezvous and hard-aborting the process after 40s
    # (rendezvous.cc "Termination timeout ... Exiting"; reproduced on the
    # 8-device virtual mesh with 4 host cores, shape-dependent). Keeping
    # exactly ONE sharded program in flight on a CPU mesh (the test/dryrun
    # vehicle) sidesteps it; real TPU meshes keep the async pipeline.
    sync_each_step = mesh_mode and next(iter(mesh.devices.flat)).platform == "cpu"
    eval_loss_fn = make_eval_loss_fn(model_cfg, train_cfg.eval_batch_size)
    # On-device snapshot of the best checkpoint: device_get here would cost
    # seconds per epoch on a tunneled chip (see RESULTS.md).
    snapshot_fn = jax.jit(lambda t: jax.tree.map(jnp.copy, t))

    B = train_cfg.batch_size
    n_train = splits.n_train
    steps_per_epoch = n_train // B if train_cfg.drop_remainder else -(-n_train // B)
    if steps_per_epoch == 0:
        raise ValueError(f"batch_size {B} > n_train {n_train} (set drop_remainder=False)")
    # Static shapes require full batches; without drop_remainder the ragged
    # tail batch is topped up by wrapping the shuffled permutation (those
    # extra examples train twice that epoch — the standard static-shape
    # trade; the reference's torch DataLoader instead emits a smaller
    # final batch).
    perm_len = steps_per_epoch * B

    # Uniform batch shapes hold in both modes (wrap-padded permutation).
    # The fused-epoch scan is a single-device dispatch optimization; the
    # mesh path streams epochs instead.
    if train_cfg.fused_epoch and out_of_core:
        raise ValueError(
            "train.fused_epoch and train.stream_slab_steps are mutually "
            "exclusive: a fused epoch scans a device-resident dataset, "
            "slab streaming exists so the dataset is NOT device-resident"
        )
    fused = train_cfg.fused_epoch and not mesh_mode
    epoch_fn = None
    if fused:
        epoch_fn = jax.jit(
            make_epoch_fn(model_cfg, tx.update, steps_per_epoch, B, batch_sharding,
                          train_cfg),
            donate_argnums=(0, 2),
        )

    plateau = PlateauScheduler(
        train_cfg.lr, train_cfg.lr_plateau_patience, train_cfg.lr_plateau_factor
    )

    result = TrainResult(params=params, bn_state=bn_state)
    best_snapshot = None
    epochs_no_improve = 0
    shuffle_rng = np.random.default_rng(train_cfg.seed)
    start_epoch = 0

    ckpt = None
    if checkpoint_dir is not None:
        from hhrs_tpu.train.checkpoint import TrainCheckpointer

        ckpt = TrainCheckpointer(checkpoint_dir)
        latest = ckpt.latest_epoch()
        if latest is not None:
            state_tpl = {
                "params": params,
                "bn_state": bn_state,
                "opt_state": opt_state,
                "best_params": params,
                "best_bn": bn_state,
                "rng": rng,
            }
            state, meta = ckpt.restore(latest, jax.device_get(state_tpl))
            params, bn_state, opt_state = place_state(
                state["params"], state["bn_state"], state["opt_state"]
            )
            rng = jnp.asarray(state["rng"])
            if meta["has_best"]:
                best_snapshot = (state["best_params"], state["best_bn"])
            start_epoch = latest + 1
            result.history = meta["history"]
            result.best_val_loss = meta["best_val_loss"]
            result.best_epoch = meta["best_epoch"]
            epochs_no_improve = meta["epochs_no_improve"]
            result.pruned = bool(meta.get("pruned", False))
            plateau.lr = meta["plateau"]["lr"]
            plateau.best = meta["plateau"]["best"]
            plateau.num_bad = meta["plateau"]["num_bad"]
            opt_state = set_learning_rate(opt_state, plateau.lr)
            shuffle_rng.bit_generator.state = meta["shuffle_rng_state"]
            log.info("resumed from checkpoint epoch %d", latest)

    # Steady-state throughput: every epoch after the FIRST is timed
    # individually (top of epoch → after the periodic checkpoint save) and
    # the reported rate is the MEDIAN per-epoch rate. The first epoch absorbs the big
    # XLA compiles (~40s on the tunneled chip); the median is robust to
    # transient tunnel stalls AND to one-time stragglers a windowed total
    # is not — measured: a cold compilation cache lands a ~6s secondary
    # compile inside epoch 1, which read 144k ex/s on a 5-epoch windowed
    # total vs the real ~1.8M/epoch steady state.
    epochs_run = 0
    epoch_times: list = []

    # A resumed run that had already early-stopped (or been pruned) must
    # not train extra epochs — the loop checks these conditions only at
    # the END of an epoch, so re-check them before entering.
    if epochs_no_improve >= train_cfg.early_stop_patience:
        log.info("resumed run had already early-stopped; skipping training loop")
        start_epoch = train_cfg.n_epochs
    if result.pruned:
        log.info("resumed run had been pruned; skipping training loop")
        start_epoch = train_cfg.n_epochs

    cur_lr = plateau.lr  # host-side LR mirror: no per-epoch D2H to compare
    try:
        for epoch in range(start_epoch, train_cfg.n_epochs):
            t_epoch = time.perf_counter()
            epoch_ovfs: list = []  # capped exchange: per-step (dropped, total)
            # ONE host→device upload per epoch: the shuffled index vector
            # (resident mode) or the permuted epoch tensor itself, shard-aligned
            # over the mesh (streaming mode); steps then run with zero H2D
            # traffic (device-carried counter).
            perm_host = shuffle_rng.permutation(n_train)
            if perm_len > n_train:
                perm_host = np.resize(perm_host, perm_len)  # wrap-pad ragged tail
            rng, epoch_rng = jax.random.split(rng)
            if train_cfg.rng_impl != "threefry2x32":
                # Re-wrap the per-epoch key in the configured impl (e.g. the
                # TPU hardware RBG, +28-30% flagship step throughput —
                # benchmarks/prng_ab.py). The top-level/checkpointed `rng`
                # stays legacy threefry uint32[2] so checkpoint state is
                # impl-independent; only the key handed to the jitted step
                # changes representation (derive_impl_key: four distinct
                # words via a split of the threefry epoch key).
                epoch_rng = derive_impl_key(epoch_rng, train_cfg.rng_impl)
            if out_of_core:
                perm_host = perm_host[:perm_len]
                K = train_cfg.stream_slab_steps
                tr_user = np.asarray(splits.train_user, np.int32)
                tr_item = np.asarray(splits.train_item, np.int32)
                tr_cat = np.asarray(splits.train_cat, np.int32)
                tr_num = np.asarray(splits.train_num, np.float32)
                tr_y = np.asarray(splits.train_y, np.float32)

                def slab_dev(i0: int):
                    """Host-gather steps [i0, i0+K) and start their upload
                    (device_put is async — the transfer overlaps the
                    previous slab's compute)."""
                    i1 = min(i0 + K, steps_per_epoch)
                    k = i1 - i0
                    sl = perm_host[i0 * B:i1 * B]
                    host = {
                        "user": tr_user[sl].reshape(k, B),
                        "item": tr_item[sl].reshape(k, B),
                        "cat": tr_cat[sl].reshape(k, B, tr_cat.shape[1]),
                        "num": tr_num[sl].reshape(k, B, tr_num.shape[1]),
                        "y": tr_y[sl].reshape(k, B),
                    }
                    if streaming:
                        return put_global_tree(
                            host,
                            {kk: epoch_sharding(v.ndim) for kk, v in host.items()},
                        )
                    return jax.device_put(host)

                epoch_losses = []
                s = jnp.asarray(0, jnp.int32)
                nxt = slab_dev(0)
                i0 = 0
                while i0 < steps_per_epoch:
                    cur, i1 = nxt, min(i0 + K, steps_per_epoch)
                    if i1 < steps_per_epoch:
                        nxt = slab_dev(i1)  # double-buffer: upload next now
                    s_local = jnp.asarray(0, jnp.int32)
                    for _ in range(i1 - i0):
                        params, bn_state, opt_state, loss, s_local, s = step_fn(
                            params, bn_state, opt_state, cur, s_local, s, epoch_rng
                        )
                        if capped_exchange:
                            loss, ovf = loss
                            epoch_ovfs.append(ovf)
                        if sync_each_step:
                            loss.block_until_ready()
                        epoch_losses.append(loss)
                    i0 = i1
                mean_loss = jnp.mean(jnp.stack(epoch_losses))
            elif streaming:
                S = steps_per_epoch
                # exactly S*B rows stream (drop_remainder truncates the tail
                # here, exactly like the resident path's dynamic_slice never
                # reaching it)
                perm_host = perm_host[:perm_len]
                # One BATCHED device_put of the whole epoch pytree (a single
                # dispatch; the per-array transfers are issued together and
                # overlap) — on the tunneled backend per-call fixed latency
                # dominates bytes, so five independent puts would pay it 5x.
                epoch_host = {
                    "user": np.asarray(splits.train_user, np.int32)[perm_host].reshape(S, B),
                    "item": np.asarray(splits.train_item, np.int32)[perm_host].reshape(S, B),
                    "cat": np.asarray(splits.train_cat, np.int32)[perm_host].reshape(
                        S, B, splits.train_cat.shape[1]),
                    "num": np.asarray(splits.train_num, np.float32)[perm_host].reshape(
                        S, B, splits.train_num.shape[1]),
                    "y": np.asarray(splits.train_y, np.float32)[perm_host].reshape(S, B),
                }
                # Single-process: ONE batched device_put. Multi-process:
                # each host uploads only its addressable [steps, B/d, ·]
                # shards (parallel/multiprocess.py).
                epoch_dev = put_global_tree(
                    epoch_host,
                    {k: epoch_sharding(v.ndim) for k, v in epoch_host.items()},
                )
                epoch_losses = []
                s = jnp.asarray(0, jnp.int32)
                for _ in range(steps_per_epoch):
                    params, bn_state, opt_state, loss, s = step_fn(
                        params, bn_state, opt_state, epoch_dev, s, epoch_rng
                    )
                    if capped_exchange:
                        loss, ovf = loss
                        epoch_ovfs.append(ovf)
                    if sync_each_step:
                        loss.block_until_ready()
                    epoch_losses.append(loss)
                mean_loss = jnp.mean(jnp.stack(epoch_losses))
            elif fused:
                perm_dev = jnp.asarray(perm_host, jnp.int32)
                params, bn_state, opt_state, mean_loss = epoch_fn(
                    params, bn_state, opt_state, train_data, perm_dev, epoch_rng
                )
            else:
                perm_dev = jnp.asarray(perm_host, jnp.int32)
                if mesh_resident:
                    perm_dev = jax.device_put(perm_dev, rep)
                epoch_losses = []
                s = jnp.asarray(0, jnp.int32)
                for _ in range(steps_per_epoch):
                    params, bn_state, opt_state, loss, s = step_fn(
                        params, bn_state, opt_state, train_data, perm_dev, s, epoch_rng
                    )
                    if capped_exchange:
                        loss, ovf = loss
                        epoch_ovfs.append(ovf)
                    if sync_each_step:
                        loss.block_until_ready()
                    epoch_losses.append(loss)
                mean_loss = jnp.mean(jnp.stack(epoch_losses))

            epochs_run += 1
            # train.eval_every > 1: non-eval epochs skip the full-val
            # forward AND the D2H scalar fetch entirely — no history
            # entry, no plateau/early-stop/prune decision, no
            # best-snapshot (all consume val_loss). The final epoch
            # always evaluates. Default 1 = reference parity
            # (train.py:228-238 evaluates every epoch).
            is_eval = ((epoch + 1) % max(train_cfg.eval_every, 1) == 0
                       or epoch + 1 == train_cfg.n_epochs)
            pruned_now = False
            if is_eval:
                # One D2H for all epoch scalars (each transfer pays the
                # tunnel's fixed latency) — the capped exchange's
                # (dropped, total) id counts ride the same fetch.
                ovf_sum = (jnp.sum(jnp.stack(epoch_ovfs), axis=0)
                           if epoch_ovfs else None)
                val_loss, train_loss, ovf_host = jax.device_get(
                    (eval_loss_fn(params, bn_state, val_data), mean_loss, ovf_sum)
                )
                val_loss, train_loss = float(val_loss), float(train_loss)
                overflow_rate = None
                if ovf_host is not None:
                    dropped, total = int(ovf_host[0]), int(ovf_host[1])
                    overflow_rate = dropped / total if total else 0.0

                lr = plateau.step(val_loss)
                if lr != cur_lr:  # host-side mirror: no per-epoch D2H to compare
                    opt_state = set_learning_rate(opt_state, lr)
                    cur_lr = lr

                rec = {
                    "epoch": epoch,
                    "train_loss": train_loss,
                    "val_loss": val_loss,
                    "lr": lr,
                }
                if overflow_rate is not None:
                    rec["exchange_overflow"] = overflow_rate
                    log.info("capped exchange: %.4f%% of lookups dropped this "
                             "epoch (%d of %d)", 100 * overflow_rate, dropped,
                             total)
                result.history.append(rec)
                if metrics_logger is not None:
                    metrics_logger.log(**rec)
                log.info("epoch %d: train_loss %.4f val_loss %.4f lr %.2e", epoch, train_loss, val_loss, lr)

                if val_loss < result.best_val_loss:
                    result.best_val_loss = val_loss
                    result.best_epoch = epoch
                    epochs_no_improve = 0
                    best_snapshot = snapshot_fn((params, bn_state))  # stays on device
                else:
                    epochs_no_improve += 1

                # Prune decision BEFORE the periodic save so the persisted
                # meta records it — a resumed pruned run must not keep
                # training.
                pruned_now = report_fn is not None and report_fn(epoch, val_loss)
                if pruned_now:
                    result.pruned = True

            if ckpt is not None and (epoch + 1) % checkpoint_every == 0:
                bp, bb = best_snapshot if best_snapshot is not None else (params, bn_state)
                state_dev = {
                    "params": params,
                    "bn_state": bn_state,
                    "opt_state": opt_state,
                    "best_params": bp,
                    "best_bn": bb,
                    "rng": rng,
                }
                if mesh_mode and multiproc:
                    # Sharded leaves live partly on OTHER hosts: gather to
                    # replicated host copies first (every process runs the
                    # collective). EVERY process then calls ckpt.save —
                    # orbax's save/close contain global-process barriers,
                    # so a process-0-only call deadlocks; orbax's primary
                    # host does the actual writing. Resume expects
                    # checkpoint_dir on a shared filesystem (every process
                    # restores the same host state and place_state
                    # re-shards it).
                    state_host = replicated_host(state_dev, rep)
                else:
                    state_host = jax.device_get(state_dev)
                ckpt.save(
                    epoch,
                    state_host,
                    {
                        "has_best": best_snapshot is not None,
                        # SNAPSHOT: orbax json-saves meta in a background
                        # commit thread — the live list could pick up
                        # later-epoch entries before serialization
                        "history": list(result.history),
                        "pruned": result.pruned,
                        "best_val_loss": result.best_val_loss,
                        "best_epoch": result.best_epoch,
                        "epochs_no_improve": epochs_no_improve,
                        "plateau": {"lr": plateau.lr, "best": plateau.best,
                                    "num_bad": plateau.num_bad},
                        "shuffle_rng_state": shuffle_rng.bit_generator.state,
                    },
                )

            # Timed here — after the checkpoint save — so periodic save cost
            # (synchronous device_get of the full state + disk write) stays
            # inside the reported per-epoch rate.
            if epochs_run > 1:
                epoch_times.append(time.perf_counter() - t_epoch)

            if pruned_now:
                log.info("trial pruned at epoch %d", epoch)
                break

            if epochs_no_improve >= train_cfg.early_stop_patience:
                log.info("early stopping at epoch %d", epoch + 1)
                break

    finally:
        if ckpt is not None:
            ckpt.close()

    # 0.0 for single-epoch runs: there is no post-compile epoch to measure.
    if epoch_times:
        med = statistics.median(epoch_times)
        result.examples_per_s = steps_per_epoch * B / max(med, 1e-9)
    else:
        result.examples_per_s = 0.0

    if best_snapshot is not None:
        # Already device arrays (on-device snapshot) or host arrays (resume);
        # in mesh mode re-placing with the run shardings is a no-op for the
        # former and the correct placement for the latter.
        bp, bb = best_snapshot
        if mesh_mode:
            result.params = jax.tree.map(jax.device_put, bp, param_sh)
            result.bn_state = jax.device_put(bb, rep)
        else:
            result.params, result.bn_state = jax.device_put((bp, bb))
    else:
        result.params, result.bn_state = params, bn_state

    # Final eval with the best checkpoint (reference train.py:365-387).
    eval_fn = make_eval_fn(
        model_cfg, train_cfg.eval_batch_size,
        out_sharding=rep if (mesh_mode and multiproc) else None)
    val_logits = np.asarray(eval_fn(result.params, result.bn_state, val_data))
    y_val = splits.val_y
    result.final_metrics = {
        "val_logloss": float(
            np.asarray(bce_with_logits(jnp.asarray(val_logits), jnp.asarray(y_val)))
        ),
        "val_auc": auc_score(y_val, val_logits),
        "val_rmse": rmse_of_probs(y_val, val_logits),
        "val_recall_at_100": recall_at_k(splits.val_user, y_val, val_logits, 100),
    }
    if train_cfg.eval_catalog_recall:
        from hhrs_tpu.train.eval_retrieval import catalog_recall_at_k

        result.final_metrics["catalog_recall_at_100"] = catalog_recall_at_k(
            result.params, result.bn_state, model_cfg, splits, k=100
        )
    return result
