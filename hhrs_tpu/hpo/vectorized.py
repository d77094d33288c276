"""Vectorized HPO: train K same-architecture trials in ONE jitted program.

TPU-native rationale. The reference's Optuna study runs trials strictly
sequentially (reference train.py:316 ``study.optimize``), and its
convergence analysis lands on tiny configs — batch 512, emb 16
(reference Documentation.md:194,219-225). At those sizes a single trial's
train step is DISPATCH-bound on an accelerator: the chip finishes the
program long before the host can issue the next one (measured on this
image's TPU: a B=512 step is ~100x under the B=32768 throughput,
RESULTS.md). ``jax.vmap`` folds K independent trials into one compiled
program whose effective batch is K·B — one dispatch drives K trials, the
MXU sees K-stacked matmuls, and HPO throughput scales with K until the
chip saturates. There is no torch equivalent of this in the reference's
stack; it is a capability the functional JAX design gives for free.

What vmaps, what doesn't:

* vmapped per-trial scalars: ``lr``, ``weight_decay``, ``dropout`` (the
  dropout probability rides into the program as a traced scalar —
  ``apply_dcn(dropout_rate=...)``), plus per-trial params / BN state /
  optimizer moments.
* grouped (shape- or structure-affecting, must agree within a group):
  ``emb_dim``, ``hidden_dim``, ``n_cross_layers``, ``n_res_blocks``,
  ``batch_size``, and the ``optimizer`` family (adam's L2-coupled decay
  and adamw's decoupled decay are different update functions —
  train/optimizers.py).
* host-side per trial, exactly like the sequential trainer: plateau LR
  (fed back as next epoch's ``lr`` array entry — no recompile), early
  stopping, median pruning, best-checkpoint bookkeeping (the snapshot
  itself stays on device, masked per trial).

Parity: each trial inside a group reproduces the sequential
``train_dcn`` trial with the same hyperparams — same init key
(PRNGKey(seed), like the reference's fixed seed 42, train.py:21-31),
same shuffle stream, same fold_in(epoch_rng, step) dropout stream, same
optimizer math (verified against optax.adamw / the L2-coupled adam chain
in tests/test_hpo_vectorized.py). Trials that early-stop or prune keep
riding the vectorized program (their lanes are ignored host-side) — the
wasted lane-epochs are the price of one-program execution, bounded by
the epoch cap.
"""

from __future__ import annotations

import logging
import statistics
import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.data.preprocess import DatasetSplits
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
from hhrs_tpu.train.metrics import auc_score, bce_with_logits, recall_at_k, rmse_of_probs
from hhrs_tpu.train.optimizers import PlateauScheduler
from hhrs_tpu.train.trainer import _device_put_splits, _eval_logits_body, derive_impl_key

log = logging.getLogger(__name__)

# Hyperparams that must agree across a vectorized group (shape / program
# structure); everything else in the reference space is either a vmapped
# scalar (dropout, lr, weight_decay) or host-side (plateau knobs).
ARCH_KEYS = ("emb_dim", "hidden_dim", "n_cross_layers", "n_res_blocks",
             "batch_size", "optimizer")
VMAPPED_KEYS = ("dropout", "lr", "weight_decay")


def arch_key(params: dict) -> tuple:
    """The grouping key of one trial's sampled hyperparams."""
    return tuple(params[k] for k in ARCH_KEYS)


def group_trials(param_dicts: list[dict]) -> dict[tuple, list[int]]:
    """Indices of ``param_dicts`` grouped by architecture key (insertion
    order preserved so trial numbering stays monotonic per group)."""
    groups: dict[tuple, list[int]] = {}
    for i, p in enumerate(param_dicts):
        groups.setdefault(arch_key(p), []).append(i)
    return groups


@dataclass
class VTrialResult:
    """Per-trial outcome of a vectorized group — the subset of
    train_dcn's TrainResult the HPO driver consumes, plus the group rate."""

    params: dict
    bn_state: dict
    history: list = field(default_factory=list)
    best_val_loss: float = float("inf")
    best_epoch: int = -1
    final_metrics: dict = field(default_factory=dict)
    pruned: bool = False
    # per-trial data rate (B·steps / median epoch seconds); the group
    # processes group_examples_per_s = K × this in the same wall-clock.
    examples_per_s: float = 0.0
    group_examples_per_s: float = 0.0


def _make_trial_update(mcfg: ModelConfig, optimizer: str):
    """One trial's fwd/bwd + Adam-family update with lr/wd/dropout as
    runtime scalars.

    Matches train/optimizers.py::make_optimizer exactly (at its default
    f32 moment_dtype — the bf16-mu big-table knob is not part of the HPO
    space and is not mirrored here):
    * adamw — optax.adamw = scale_by_adam → add_decayed_weights(wd) →
      scale(-lr):   p ← p − lr·(adam(g) + wd·p)
    * adam  — torch-style L2: add_decayed_weights BEFORE the moments:
      p ← p − lr·adam(g + wd·p)
    """
    sb = optax.scale_by_adam()
    if optimizer not in ("adam", "adamw"):
        raise ValueError(f"unknown optimizer {optimizer!r}")
    decoupled = optimizer == "adamw"

    def update(p, bn, o, lr, wd, dr, batch, rng):
        def loss_fn(pp):
            logits, nbn = apply_dcn(
                pp, bn, batch["user"], batch["item"], batch["cat"],
                batch["num"], cfg=mcfg, train=True, rng=rng, dropout_rate=dr,
            )
            return bce_with_logits(logits, batch["y"]), nbn

        (loss, nbn), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        if decoupled:
            u, no = sb.update(g, o, p)
            u = jax.tree.map(lambda ui, pi: ui + wd * pi, u, p)
        else:
            g = jax.tree.map(lambda gi, pi: gi + wd * pi, g, p)
            u, no = sb.update(g, o, p)
        newp = jax.tree.map(lambda pi, ui: pi - lr * ui, p, u)
        return newp, nbn, no, loss

    return update, sb


def run_group(
    splits: DatasetSplits,
    dims: ModelDims,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    trial_params: list[dict],
    report_fns: list | None = None,
    shard_lanes: bool = False,
    refill_fn=None,
) -> list[VTrialResult]:
    """Train every trial in ``trial_params`` (which must share an
    ``arch_key``) in one vmapped program; returns per-trial results.

    ``mcfg``/``tcfg`` are the per-arch configs (emb/hidden/cross/res and
    batch/optimizer already applied); each trial's lr / weight_decay /
    dropout / plateau knobs are read from its own dict. ``report_fns[k]``
    is the trial-k pruning hook: ``fn(epoch, val_loss) -> should_prune``.

    ``shard_lanes=True`` shards the TRIAL axis of every stacked pytree
    over all visible devices (a 1-D ``Mesh(('trial',))``): lane math is
    embarrassingly parallel — no per-lane op crosses lanes — so GSPMD
    partitions the whole program with zero collectives in the hot path
    and K trials train at n_devices× the single-device group rate. The
    dataset is replicated (HPO trials are reference-scale models; the
    batch gather stays local). K must be a multiple of the device count.
    Per-lane semantics are unchanged (same jaxpr per lane, threefry bits
    are counter-based and device-independent); numerics agree to
    f32-accumulation-order level — the partitioned program tiles the
    batched matmuls at [K/n, B, ·] — tested on the 8-device CPU mesh
    (tests/test_hpo_vectorized.py).

    ``refill_fn`` enables LANE RECLAMATION (VERDICT r3 item 4): without
    it, a pruned/early-stopped lane keeps riding the vectorized program as
    dead weight until the group ends. With it, at each epoch boundary
    every newly-dead lane is finalized and refilled with a freshly asked
    same-architecture trial — ``refill_fn() -> (params_dict, report_fn) |
    None`` (None = trial budget exhausted; the lane then goes dormant).
    A refill is pure index updates on the stacked pytrees (params/bn/opt/
    best reset to the shared init, scalar lanes to the new trial's
    lr/wd/dropout) — the compiled program never changes. Each lane's
    plateau/early-stop/pruning clock runs on its OWN age (epoch 0 = the
    lane's first epoch), so a refilled trial trains a full epoch budget;
    its shuffle/dropout stream continues the group's epoch stream from its
    join point (statistically equivalent to, but not bit-identical with,
    a fresh sequential trial — the same class of trade as rng_impl=rbg).
    Returns one VTrialResult per trial EVER run: the initial K first, then
    refills in ask order.
    """
    K = len(trial_params)
    keys = {arch_key(p) for p in trial_params}
    if len(keys) != 1:
        raise ValueError(f"trials span {len(keys)} architectures; group first")
    if tcfg.lazy_table_updates:
        raise ValueError("vectorized HPO does not support lazy_table_updates")
    if tcfg.rng_impl not in ("threefry2x32", "rbg"):
        raise ValueError(f"unknown train.rng_impl {tcfg.rng_impl!r}")
    report_fns = report_fns or [None] * K

    lane_put = repl_put = lambda t: t  # noqa: E731 — identity off-mesh
    if shard_lanes:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = jax.devices()
        if K % len(devices):
            raise ValueError(
                f"shard_lanes: group size {K} must be a multiple of the "
                f"device count {len(devices)}"
            )
        mesh = Mesh(np.asarray(devices), ("trial",))
        lane_sh = NamedSharding(mesh, P("trial"))
        repl_sh = NamedSharding(mesh, P())
        lane_put = lambda t: jax.device_put(t, lane_sh)  # noqa: E731
        repl_put = lambda t: jax.device_put(t, repl_sh)  # noqa: E731

    lrs = np.asarray([float(p["lr"]) for p in trial_params], np.float32)
    wds = np.asarray([float(p["weight_decay"]) for p in trial_params], np.float32)
    drs = np.asarray([float(p["dropout"]) for p in trial_params], np.float32)

    # Same init stream as the sequential trainer (train_dcn): every trial
    # starts from PRNGKey(tcfg.seed) — the reference fixes seed 42 for all
    # trials the same way (train.py:21-31, 199).
    rng = jax.random.PRNGKey(tcfg.seed)
    init_rng, rng = jax.random.split(rng)
    params, bn_state = init_dcn(init_rng, dims, mcfg)

    update, sb = _make_trial_update(mcfg, str(trial_params[0]["optimizer"]))

    stack = jax.jit(lambda t: jax.tree.map(lambda x: jnp.stack([x] * K), t))
    vparams = lane_put(stack(params))
    vbn = lane_put(stack(bn_state))
    vopt = lane_put(jax.vmap(sb.init)(vparams))

    train_data, val_data = _device_put_splits(splits)
    if shard_lanes:
        train_data, val_data = repl_put(train_data), repl_put(val_data)

    B = tcfg.batch_size
    n_train = splits.n_train
    steps_per_epoch = n_train // B if tcfg.drop_remainder else -(-n_train // B)
    if steps_per_epoch == 0:
        raise ValueError(f"batch_size {B} > n_train {n_train} (set drop_remainder=False)")
    perm_len = steps_per_epoch * B

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def vstep(vp, vb, vo, data, perm, s, epoch_rng, lr_v, wd_v, dr_v):
        idx = jax.lax.dynamic_slice(perm, (s * B,), (B,))
        batch = {
            "user": data["user"][idx],
            "item": data["item"][idx],
            "cat": data["cat"][idx],
            "num": data["num"][idx],
            "y": data["y"][idx],
        }
        rng_s = jax.random.fold_in(epoch_rng, s)
        f = lambda p, b, o, lr, wd, dr: update(p, b, o, lr, wd, dr, batch, rng_s)  # noqa: E731
        vp, vb, vo, losses = jax.vmap(f)(vp, vb, vo, lr_v, wd_v, dr_v)
        return vp, vb, vo, losses, s + 1

    @jax.jit
    def veval_loss(vp, vb, val):
        def one(p, b):
            logits = _eval_logits_body(mcfg, tcfg.eval_batch_size, p, b, val)
            return bce_with_logits(logits, val["y"])

        return jax.vmap(one)(vp, vb)

    @jax.jit
    def eval_lane_logits(p, b, val):
        # single-lane final eval (reclaim path: lanes finalize at different
        # epochs; the lane is gathered on device first)
        return _eval_logits_body(mcfg, tcfg.eval_batch_size, p, b, val)

    @jax.jit
    def veval_logits(vp, vb, val):
        # all-lanes final eval (no-refill path: every lane finalizes
        # together — ONE dispatch and ONE [K, n_val] device_get instead of
        # K round-trips; transfers are seconds-scale on the tunnel)
        return jax.vmap(
            lambda p, b: _eval_logits_body(mcfg, tcfg.eval_batch_size, p, b, val)
        )(vp, vb)

    @jax.jit
    def vsnap(best, cur, improved):
        def sel(b, c):
            m = improved.reshape((K,) + (1,) * (c.ndim - 1))
            return jnp.where(m, c, b)

        return jax.tree.map(sel, best, cur)

    # Lane reset for reclamation: pure index updates on the stacked trees —
    # no recompile, the program shape never changes.
    opt0 = sb.init(params)

    @partial(jax.jit, donate_argnums=(0,))
    def reset_lane(vtree, k_idx, fresh):
        return jax.tree.map(lambda s, x: s.at[k_idx].set(x), vtree, fresh)

    # Per-trial host bookkeeping — the same machinery train_dcn runs for a
    # single trial (plateau feeds next epoch's lr lane; early stop /
    # pruning deactivate a lane). Each lane's clock is its OWN age so
    # refilled trials get a full epoch budget.
    plateaus = [
        PlateauScheduler(float(p["lr"]), int(p["lr_plateau_patience"]),
                         float(p["lr_plateau_factor"]))
        for p in trial_params
    ]
    results = [VTrialResult(params=None, bn_state=None) for _ in range(K)]
    lane_result = list(range(K))  # lane -> index into results
    active = np.ones(K, bool)
    no_improve = np.zeros(K, int)
    ages = np.zeros(K, int)  # epochs the lane's CURRENT trial has trained
    # never-improved lanes keep init
    vbest = (lane_put(stack(params)), lane_put(stack(bn_state)))
    shuffle_rng = np.random.default_rng(tcfg.seed)
    epoch_times: list[float] = []
    y_val = splits.val_y

    def finalize_lane(k, lk=None):
        """Final metrics for lane k's trial from its best snapshot
        (reference train.py:365-387 semantics). The lane gather stays ON
        DEVICE (a host round-trip of K param stacks costs seconds-to-
        minutes on the tunnel, RESULTS.md) with the lane index TRACED, so
        one compiled eval serves every lane; only [n_val] logits transfer
        (``lk`` pre-supplies them from the batched all-lanes eval).
        Pruned lanes are skipped entirely — the driver discards them, and
        the host-side AUC/recall sorts over the full val set aren't free."""
        r = results[lane_result[k]]
        if r.pruned:
            return
        k_idx = jnp.asarray(k, jnp.int32)
        p_k, b_k = take(vbest, k_idx)
        r.params, r.bn_state = p_k, b_k
        if lk is None:
            lk = np.asarray(jax.device_get(eval_lane_logits(p_k, b_k, val_data)))
        r.final_metrics = {
            "val_logloss": float(
                np.asarray(bce_with_logits(jnp.asarray(lk), jnp.asarray(y_val)))
            ),
            "val_auc": auc_score(y_val, lk),
            "val_rmse": rmse_of_probs(y_val, lk),
            "val_recall_at_100": recall_at_k(splits.val_user, y_val, lk, 100),
        }

    take = jax.jit(
        lambda t, k: jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, k, 0, keepdims=False), t
        )
    )

    first_epoch = True
    while active.any():
        t_epoch = time.perf_counter()
        perm_host = shuffle_rng.permutation(n_train)
        if perm_len > n_train:
            perm_host = np.resize(perm_host, perm_len)
        rng, epoch_rng = jax.random.split(rng)
        if tcfg.rng_impl != "threefry2x32":
            epoch_rng = derive_impl_key(epoch_rng, tcfg.rng_impl)
        perm_dev = repl_put(jnp.asarray(perm_host, jnp.int32))
        lr_v, wd_v, dr_v = (lane_put(jnp.asarray(a)) for a in (lrs, wds, drs))

        s = jnp.asarray(0, jnp.int32)
        losses_acc = []
        for _ in range(steps_per_epoch):
            vparams, vbn, vopt, losses, s = vstep(
                vparams, vbn, vopt, train_data, perm_dev, s, epoch_rng,
                lr_v, wd_v, dr_v,
            )
            losses_acc.append(losses)
        mean_train = jnp.mean(jnp.stack(losses_acc), axis=0)  # [K]

        val_losses, train_losses = (
            np.asarray(x, np.float64)
            for x in jax.device_get((veval_loss(vparams, vbn, val_data), mean_train))
        )

        improved = np.zeros(K, bool)
        for k in range(K):
            if not active[k]:
                continue
            vl = float(val_losses[k])
            lr_new = plateaus[k].step(vl)
            lrs[k] = lr_new
            r = results[lane_result[k]]
            age = ages[k]
            r.history.append(
                {"epoch": int(age), "train_loss": float(train_losses[k]),
                 "val_loss": vl, "lr": lr_new}
            )
            if vl < r.best_val_loss:
                r.best_val_loss = vl
                r.best_epoch = int(age)
                no_improve[k] = 0
                improved[k] = True
            else:
                no_improve[k] += 1
            ages[k] += 1
            if report_fns[k] is not None and report_fns[k](int(age), vl):
                r.pruned = True
                active[k] = False
                log.info("vectorized trial lane %d pruned at epoch %d", k, age)
            elif no_improve[k] >= tcfg.early_stop_patience:
                active[k] = False
                log.info("vectorized trial lane %d early-stopped at epoch %d", k, age + 1)
            elif ages[k] >= tcfg.n_epochs:
                active[k] = False  # trial completed its epoch budget

        if improved.any():
            vbest = vsnap(vbest, (vparams, vbn), lane_put(jnp.asarray(improved)))

        if first_epoch:  # epoch 0 carries the XLA compile
            compile_epoch_time = time.perf_counter() - t_epoch
        else:
            epoch_times.append(time.perf_counter() - t_epoch)
        first_epoch = False

        # Lane reclamation: finalize every newly-dead lane, then refill it
        # with a freshly asked same-architecture trial if the budget
        # allows; an unrefilled lane goes dormant (its compute is wasted —
        # exactly the cost reclamation exists to avoid while trials remain).
        # Without refill_fn the dead lanes finalize once, after the loop.
        if refill_fn is not None:
            for k in range(K):
                if active[k] or lane_result[k] is None:
                    continue
                finalize_lane(k)
                ask = refill_fn()
                if ask is None:
                    lane_result[k] = None  # dormant: budget exhausted
                    continue
                new_params, new_report = ask
                if arch_key(new_params) != arch_key(trial_params[0]):
                    raise ValueError(
                        "refill_fn returned a trial with a different "
                        "architecture than the running group"
                    )
                lrs[k] = float(new_params["lr"])
                wds[k] = float(new_params["weight_decay"])
                drs[k] = float(new_params["dropout"])
                plateaus[k] = PlateauScheduler(
                    float(new_params["lr"]),
                    int(new_params["lr_plateau_patience"]),
                    float(new_params["lr_plateau_factor"]),
                )
                report_fns[k] = new_report
                no_improve[k] = 0
                ages[k] = 0
                results.append(VTrialResult(params=None, bn_state=None))
                lane_result[k] = len(results) - 1
                active[k] = True
                k_idx = jnp.asarray(k, jnp.int32)
                vparams = reset_lane(vparams, k_idx, params)
                vbn = reset_lane(vbn, k_idx, bn_state)
                vopt = reset_lane(vopt, k_idx, opt0)
                vbest = (reset_lane(vbest[0], k_idx, params),
                         reset_lane(vbest[1], k_idx, bn_state))
                log.info("vectorized lane %d reclaimed for a new trial", k)

    # Any lane never finalized above (refill_fn=None path finalizes only
    # at the very end; bookkeeping above handles the refill path). All
    # remaining lanes share ONE vmapped eval + ONE device_get.
    pending = [k for k in range(K) if lane_result[k] is not None]
    if pending:
        vlogits = np.asarray(jax.device_get(
            veval_logits(vbest[0], vbest[1], val_data)))
        for k in pending:
            finalize_lane(k, lk=vlogits[k])
            lane_result[k] = None

    per_trial_rate = 0.0
    if epoch_times:
        per_trial_rate = steps_per_epoch * B / max(statistics.median(epoch_times), 1e-9)
    elif not first_epoch:
        # single-epoch groups have only the compile epoch to report —
        # a conservative measured rate beats a wrong 0.0
        per_trial_rate = steps_per_epoch * B / max(compile_epoch_time, 1e-9)
    for r in results:
        r.examples_per_s = per_trial_rate
        r.group_examples_per_s = per_trial_rate * K
    return results
