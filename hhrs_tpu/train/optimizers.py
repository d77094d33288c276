"""Optimizers + plateau LR control with torch-parity semantics.

* ``adamw`` — decoupled weight decay on ALL params (the reference relies on
  torch AdamW's default, which decays embeddings and BN affine too).
* ``adam`` — torch-style L2-coupled decay: wd·p is added to the gradient
  *before* the moment updates (optax.adamw would decouple it).
* ``PlateauScheduler`` — host-side replica of ReduceLROnPlateau('min')
  (reference train.py:208-213): rel-threshold 1e-4, cooldown 0; the LR is a
  dynamic hyperparameter injected into the jitted step, so changing it never
  triggers a recompile.
"""

from __future__ import annotations

import optax


def make_optimizer(name: str, lr: float, weight_decay: float,
                   moment_dtype: str | None = None) -> optax.GradientTransformation:
    """``moment_dtype="bfloat16"`` stores Adam's FIRST moment (mu) in bf16
    (optax ``mu_dtype``; the update math still runs f32 — optax casts mu up,
    accumulates, casts back). The second moment stays f32 deliberately: nu
    feeds a 1/sqrt and spans a wide dynamic range, where bf16's 8-bit
    mantissa visibly perturbs the preconditioner. A throughput knob for the
    BIG-table dense regime, where Adam's O(n_rows·d) moment sweep dominates
    step bytes (RESULTS.md lazy_ab) — mu r+w is ~1/3 of that sweep, so bf16
    mu cuts table traffic ~17%. Default None (f32) = reference parity."""
    name = name.lower()
    mu_dtype = None if moment_dtype in (None, "float32") else moment_dtype
    if name == "adamw":
        tx = optax.inject_hyperparams(
            lambda learning_rate: optax.adamw(
                learning_rate, weight_decay=weight_decay, mu_dtype=mu_dtype)
        )(learning_rate=lr)
    elif name == "adam":
        tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_adam(mu_dtype=mu_dtype),
                optax.scale_by_learning_rate(learning_rate),
            )
        )(learning_rate=lr)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    return tx


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected LR in an optax InjectHyperparamsState (reaching
    through a LazyOptState wrapper — train/lazy.py reads the same injected
    value for its row updates, so plateau decays cover the tables too).

    The new value is stored as an f32 ARRAY leaf: inject_hyperparams
    initializes the leaf as f32[], and writing a python float would change
    the leaf's aval (weak-typed scalar) — silently re-tracing and
    RE-COMPILING the donated train step on the first plateau decay
    (empirically: jit cache 1 → 2; a compile is 40-300s on the tunneled
    chip). With the dtype preserved, decays never recompile — the module
    contract."""
    import jax.numpy as jnp

    inner = getattr(opt_state, "dense", opt_state)
    inner.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    inner = getattr(opt_state, "dense", opt_state)
    return float(inner.hyperparams["learning_rate"])


class PlateauScheduler:
    """ReduceLROnPlateau('min') parity: shrink LR by `factor` after
    `patience` epochs without improvement beyond a relative threshold."""

    def __init__(self, lr: float, patience: int, factor: float, threshold: float = 1e-4):
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        """Feed an epoch metric; returns the (possibly reduced) LR."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr *= self.factor
                self.num_bad = 0
        return self.lr
