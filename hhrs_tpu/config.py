"""Single dataclass config tree with CLI overrides.

The reference has no flag system at all — configuration is .env vars,
in-code constants, and learned hyperparams shipped in ``best_params.gz``
(reference main.py:239-240, train.py:290-295). Here everything lives in
one typed config tree; ``from_cli`` applies ``section.field=value``
overrides, and ``ModelConfig`` doubles as the hyperparameter contract
carried inside artifact manifests.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ModelConfig:
    """DCN-R hyperparameters (reference train.py:179-193 search space)."""

    emb_dim: int = 16
    hidden_dim: int = 128
    n_cross_layers: int = 2
    n_res_blocks: int = 1
    dropout: float = 0.6
    # Architecture variant — reproduces the reference's ablation table
    # (Documentation.md:200-212): 'dcnr' (full), 'cross_only' (no deep
    # tower), 'deep_only' (no cross stack), 'dcn_mlp' (plain MLP deep
    # tower: Linear→ReLU→Dropout blocks, no BN/residual).
    arch: str = "dcnr"
    # 'code' reproduces the reference's implemented cross math
    # x_{l+1} = x_l + x_l*(w·x_l) + b  (reference train.py:96-99);
    # 'canonical' is the x0-anchored DCN variant its docs describe.
    cross_variant: str = "code"
    # BatchNorm matches torch BatchNorm1d semantics (momentum 0.1, eps 1e-5).
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    # Compute dtype for matmuls; params stay float32. bfloat16 feeds the MXU
    # at full rate on TPU; float32 is the parity-testing default.
    compute_dtype: str = "float32"
    # Storage dtype for the tower ACTIVATIONS (x0 and everything after it):
    # 'bfloat16' halves the [B, ·] tensors XLA materializes to HBM between
    # fusions and the residuals autodiff saves for the backward pass — the
    # DCN-R train step is HBM-bound, never MXU-bound (roofline, RESULTS.md),
    # so activation bytes are the binding resource. Requires
    # compute_dtype='bfloat16'; BatchNorm statistics and the final logits
    # stay float32. A throughput knob like rng_impl=rbg: statistically
    # equivalent training, not bit-identical to the f32-storage program.
    storage_dtype: str = "float32"

    def cat_emb_dim(self, n_cat: int) -> int:
        # Heuristic preserved from the reference (train.py:139): floor(sqrt(n))+1.
        return int(n_cat**0.5) + 1


@dataclass
class TrainConfig:
    """Training-loop hyperparameters (reference train.py:195-253)."""

    lr: float = 1e-3
    batch_size: int = 512
    weight_decay: float = 1e-4
    optimizer: str = "adamw"  # 'adamw' (decoupled) or 'adam' (L2-coupled, torch-style)
    n_epochs: int = 50
    early_stop_patience: int = 5
    lr_plateau_patience: int = 2
    lr_plateau_factor: float = 0.5
    seed: int = 42
    # Drop the ragged last batch so every step has a static shape for XLA.
    drop_remainder: bool = True
    eval_batch_size: int = 8192
    # Lazy (sparse-row) embedding-table updates (train/lazy.py): Adam/AdamW
    # moments and params update only the rows touched by the batch —
    # O(B·d) table HBM traffic per step instead of the dense optimizer's
    # O(n_rows·d). Identical to dense when every row is touched every step.
    # Measured (benchmarks/lazy_ab.py, both orders, real chip): dense WINS
    # at 1M rows (3.6x) and 10M rows (1.55x) — the dense moment sweep
    # streams at full HBM bandwidth while lazy pays random gather/scatter
    # — but LAZY WINS at 30M rows (1.39x, both orders, r4): lazy's rate is
    # size-flat (~1.6M ex/s) while dense scales down with table bytes.
    # Guidance: dense below ~20M table rows, lazy above (or whenever dense
    # moments don't fit HBM). Off by default.
    lazy_table_updates: bool = False
    # PRNG impl for the IN-STEP randomness (dropout masks): 'threefry2x32'
    # (JAX default — sharding-invariant bits, mesh-vs-single-device
    # trajectories bit-identical) or 'rbg' (XLA RngBitGenerator on the
    # TPU's hardware generator — won both orders of the flagship A/B by
    # +28-30%, benchmarks/prng_ab.py, statistically equivalent but not
    # bit-equal masks; rbg bits are not guaranteed sharding-invariant, so
    # prefer threefry when exact mesh/single-device parity matters).
    # The run's top-level/checkpointed key stays threefry either way.
    rng_impl: str = "threefry2x32"
    # "bfloat16": store Adam's FIRST moment (mu) in bf16 — update math
    # stays f32 (optax mu_dtype); nu stays f32 (it feeds 1/sqrt, where
    # bf16's mantissa perturbs the preconditioner). A big-table knob: the
    # dense optimizer's O(n_rows·d) moment sweep dominates step bytes at
    # production table sizes (RESULTS.md lazy_ab), and mu r+w is ~1/3 of
    # that sweep. Like rng_impl=rbg: statistically equivalent, not
    # bit-identical. Default f32 = reference parity. With
    # lazy_table_updates the row-wise table moments stay f32 (lazy
    # already avoids the full-table sweep; the knob then covers only the
    # dense tower subtree).
    moment_dtype: str = "float32"
    # Validate every Nth epoch instead of every epoch. The reference
    # evaluates the full val set each epoch (train.py:228-238) — 1 is
    # reference parity and stays the default. At large-batch configs on a
    # high-latency backend the per-epoch full-val eval + the D2H scalar
    # fetch can COST MORE than the epoch's train steps (tuned flagship:
    # ~29ms of steps vs ~60ms+ of eval+fetch per epoch — RESULTS.md), so
    # production fine-tune loops can raise this. Semantics on non-eval
    # epochs: no history entry, no plateau/early-stop/pruning decision,
    # no best-snapshot update (those all consume val_loss); the final
    # epoch always evaluates so the run always ends with fresh metrics.
    eval_every: int = 1
    # Mesh runs stream the shuffled epoch to the devices by default
    # (per-device memory = epoch/d; ONE [steps, B, ·] upload per epoch).
    # On a high-latency host link that per-epoch upload IS the critical
    # path (measured on the tunneled chip: 2.1M ex/s streamed vs 20.9M
    # resident at the tuned config — RESULTS.md r5), and slab
    # double-buffering cannot hide it (transfers are host-serialized
    # there). True: keep the dataset device-RESIDENT and replicated
    # across the mesh instead — uploaded once, each epoch ships only the
    # [n] int32 perm vector, batches gather on-device (exact reference
    # batch composition, identical to single-device numerics). Memory
    # trade: every device holds the full train split — for datasets that
    # fit; streaming stays the default and the only option for
    # larger-than-HBM data (with stream_slab_steps for out-of-core).
    mesh_resident_data: bool = False
    # Numeric sanitizer: raise FloatingPointError the moment any jitted
    # computation produces a NaN (jax_debug_nans; SURVEY.md §5 — this is
    # the CI-grade replacement for a race/memory sanitizer in a
    # shared-nothing functional runtime). Costs recompiles; off in prod.
    debug_nans: bool = False
    # Fuse the whole epoch into one lax.scan dispatch (one host→device
    # round-trip per epoch instead of per step). Default off: measured on
    # this image's tunneled TPU backend, device-side loop iterations carry
    # a ~4ms fixed cost that dwarfs the ~1.7ms step, so per-step dispatch
    # is 50x faster there; on a directly-attached TPU runtime the fused
    # path removes per-step dispatch overhead instead.
    fused_epoch: bool = False
    # Out-of-core epoch streaming: >0 keeps the train split HOST-side only
    # and uploads double-buffered [K, B, ·] slabs of K steps per transfer
    # (the next slab's device_put is issued before the current slab's steps
    # run, so upload overlaps compute). Device memory holds at most two
    # slabs instead of the whole epoch — the training mode for datasets
    # beyond device memory (the split arrays may themselves be np.memmap,
    # extending it past host RAM). Batch order and the dropout rng stream
    # (fold_in(epoch_rng, global_step)) are IDENTICAL to the resident path,
    # so trajectories match bit-for-bit (tests/test_stream_slabs.py).
    # Composes with --mesh (slabs upload shard-aligned over 'data').
    # 0 = off (resident dataset — fastest when it fits).
    stream_slab_steps: int = 0
    # Also evaluate catalog-ranking recall@100 (train/eval_retrieval.py) in
    # the final metrics — the informative retrieval metric (the row-level
    # recall saturates at 1.0 whenever users have <100 val rows). Off by
    # default: it scores every catalog item for up to 512 users.
    eval_catalog_recall: bool = False


@dataclass
class MeshConfig:
    """Device mesh layout for pjit/shard_map."""

    data_axis: int = -1  # -1 → all devices on the data axis
    model_axis: int = 1
    axis_names: tuple = ("data", "model")
    # Row-sharded table lookups in the mesh train step: '' (default) writes
    # the global-view gather and lets GSPMD lower it — verified to produce
    # NO full-table all-gathers (tests/test_hlo_lowering.py pins the HLO);
    # 'all_to_all' | 'psum' route lookups through the hand-written shard_map
    # exchange kernels (parallel/embedding.py) instead — the explicit
    # fallback if a future XLA's lowering regresses, and the observable
    # form of the north-star two-hop ID/vector exchange. 'capped' is the
    # skew-BOUNDED two-hop exchange (bucket capacity ceil(b/m ·
    # exchange_capacity_factor) instead of the exact worst case b): wire
    # bytes drop m/factor-fold; over-capacity ids are dropped (zero
    # embedding block, zero table grad), counted, and logged per epoch as
    # history[..]["exchange_overflow"] — an opt-in approximation for
    # skew-tolerant production workloads (docs/MODEL.md).
    explicit_exchange: str = ""
    exchange_capacity_factor: float = 1.25


@dataclass
class DataConfig:
    """Column contract of the hackathon CSV (reference train.py:274-295)."""

    user_col: str = "user_id"
    item_col: str = "item_id"
    target_col: str = "was_booked"
    raw_user_col: str = "guest_id"
    raw_item_col: str = "hotel_id"
    categorical_cols: tuple = ("city", "hotel_type")
    numerical_cols: tuple = (
        "price_rub",
        "stars",
        "user_reviews_count",
        "rating_overall",
        "rating_location",
        "rating_cleanliness",
        "rating_food",
        "rating_service",
        "price_per_star",
        "cleanliness_vs_service",
        "location_premium",
    )
    # Noise filter thresholds (reference train.py:280).
    positive_rating: float = 8.0
    negative_rating: float = 4.0
    test_size: float = 0.2
    split_seed: int = 42
    # Reproduce the reference's scaler-fit-before-split leakage quirk
    # (train.py:53-54 vs :67) for apples-to-apples metric parity.
    leakage_compat: bool = True


@dataclass
class RetrievalConfig:
    """Candidate-generation knobs (reference main.py:181-212, 268-270)."""

    knn_neighbors: int = 16  # index width (main.py:268)
    expand_neighbors: int = 10  # per-positive expansion, excl. self (main.py:200)
    min_candidates: int = 20  # popularity-fallback trigger (main.py:204)
    popular_pool: int = 100  # top-N city rows by review count (main.py:206)
    mmr_top_k: int = 20  # MMR output size (main.py:133)


@dataclass
class ServeConfig:
    host: str = "0.0.0.0"
    port: int = 8000
    artifacts_dir: str = "artifacts"
    data_dir: str = "data"
    # Dynamic batching (serve/batcher.py): 0 disables.
    batch_window_ms: float = 0.0
    max_batch: int = 8
    # Hold the model's embedding tables as per-row int8 on device
    # (ops/quant.py): 4x less table HBM / gather traffic per request.
    # Near-tied rankings can differ from f32 — off by default.
    quantize_tables: bool = False
    # >0: requests whose candidate set fits the cap take a compiled
    # fast path that scores ONLY candidate rows (O(cap) instead of
    # O(catalog) per request; overflow falls back to the exact full
    # program via lax.cond). Worth setting at large catalogs; 0 = always
    # full-universe (the exact-semantics default at any size).
    candidate_cap: int = 0
    # >0: LRU response cache of this many entries (serve/cache.py). Serve
    # state is immutable between model reloads, so identical requests are
    # memoized exactly; a registry hot-swap invalidates atomically.
    # cache_ttl_s adds time-based expiry on top (0 = entries live until
    # evicted/invalidated).
    cache_entries: int = 0
    cache_ttl_s: float = 0.0
    # >0: poll the data CSVs' stat fingerprints every N seconds and
    # rebuild+hot-swap the serving stack when they change (serve/reload.py
    # DataReloader) — new reviews/friendships reach live traffic without a
    # restart. The reference reads the CSVs once at startup
    # (main.py:242-245) and needs a restart. 0 disables.
    data_poll_s: float = 0.0
    # EXACT city-bounded ranking (default on): candidates are provably a
    # subset of the request city's items (candidates.py intersects the
    # mask with city_item), so the single-device engine ranks only the
    # city's rows — O(max city size) compute and D2H instead of
    # O(catalog), identical responses, and it applies to the batched
    # program too. Auto-disabled under --mesh (the row-sharded
    # full-universe program is the mesh fast path). Escape hatch only.
    city_bounded: bool = True
    # Retired after the round-2 kernel honesty pass (fused Pallas serve tower
    # measured 0.74-0.75x vs XLA). Kept so existing `serve.use_pallas=...`
    # overrides parse; the engine warns and serves on the jnp path.
    use_pallas: bool = False


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    serve: ServeConfig = field(default_factory=ServeConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        cfg = cls()
        for section_name, section_vals in d.items():
            section = getattr(cfg, section_name)
            for k, v in section_vals.items():
                if hasattr(section, k):
                    cur = getattr(section, k)
                    if isinstance(cur, tuple) and isinstance(v, list):
                        v = tuple(v)
                    setattr(section, k, v)
        return cfg

    def apply_overrides(self, overrides: list[str]) -> "Config":
        """Apply `section.field=value` CLI overrides in place."""
        for ov in overrides:
            key, _, raw = ov.partition("=")
            if not _:
                raise ValueError(f"override must be section.field=value, got {ov!r}")
            section_name, _, field_name = key.partition(".")
            section = getattr(self, section_name)
            cur = getattr(section, field_name)
            setattr(section, field_name, _coerce(raw, cur))
        return self


def _coerce(raw: str, like: Any) -> Any:
    if isinstance(like, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if isinstance(like, int):
        return int(raw)
    if isinstance(like, float):
        return float(raw)
    if isinstance(like, tuple):
        return tuple(x.strip() for x in raw.split(","))
    return raw


def check_overrides(tokens: list) -> list:
    """Validate positional config overrides: every token must be
    section.field=value. A typo'd token (e.g. a space instead of '=')
    must fail loudly — silently dropping it would run with defaults."""
    bad = [t for t in tokens if "=" not in t]
    if bad:
        raise SystemExit(
            f"invalid config override(s) {bad}: use section.field=value"
        )
    return tokens


def from_cli(argv: list[str]) -> Config:
    return Config().apply_overrides(check_overrides(list(argv)))


# --- presets -----------------------------------------------------------------

# Named config presets: measured multi-knob configurations reachable as ONE
# switch (VERDICT r3 item 5). Values are (section.field -> value); an
# explicit env/CLI override of the same field still wins (presets apply
# first).
PRESETS: dict[str, dict[str, Any]] = {
    # The measured-fastest full-trainer stack (benchmarks/trainer_tuned.py,
    # both orders, RESULTS.md): dispatch-amortizing batch + hardware-RBG
    # dropout bits + bf16 activation storage ≈ 3.8M ex/s incl. eval on the
    # tunneled chip vs ~1.9-2.7M for reference-parity defaults. Throughput
    # knobs only — statistically equivalent training, not bit-identical
    # to the defaults (see each field's docstring).
    "tuned": {
        "train.batch_size": 32768,
        "train.rng_impl": "rbg",
        "model.compute_dtype": "bfloat16",
        "model.storage_dtype": "bfloat16",
    },
    # Reference-parity semantics — the defaults, named so deployments can
    # say so explicitly (HHRS_PRESET=reference).
    "reference": {},
}


def apply_preset(cfg: Config, name: str) -> list[str]:
    """Apply a named preset in place; returns the changes for loud logging."""
    if name not in PRESETS:
        raise ValueError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        )
    changed = []
    for key, value in PRESETS[name].items():
        section_name, _, field_name = key.partition(".")
        section = getattr(cfg, section_name)
        old = getattr(section, field_name)
        setattr(section, field_name, value)
        changed.append(f"{key}: {old!r} -> {value!r}")
    return changed


# --- environment overrides ---------------------------------------------------

_ENV_PREFIX = "HHRS_"


def apply_env_overrides(cfg: Config, environ=None) -> list[str]:
    """Apply ``HHRS_<SECTION>_<FIELD>=value`` environment overrides in place.

    The reference is configured via .env + dotenv (reference
    .env.exemple:1-7, database_setup.py:10-15); this is the equivalent
    contract for the compose deployment, layered between presets and CLI
    overrides (env beats preset, CLI beats env). Example:
    ``HHRS_SERVE_PORT=8000``, ``HHRS_TRAIN_BATCH_SIZE=32768``. Field names
    contain underscores, so the section is matched as the longest known
    prefix. Unknown HHRS_* variables fail loudly — a typo'd variable that
    silently falls back to defaults is a misconfigured deployment.
    ``HHRS_PRESET`` (consumed by build_config) and ``HHRS_BENCH_*``
    (bench.py's own knobs) are exempt.
    Returns the applied overrides for logging.
    """
    import os

    environ = os.environ if environ is None else environ
    sections = {f.name for f in dataclasses.fields(cfg)}
    applied = []
    for var in sorted(environ):
        if not var.startswith(_ENV_PREFIX):
            continue
        rest = var[len(_ENV_PREFIX):].lower()
        if rest == "preset" or rest.startswith("bench_"):
            # HHRS_PRESET is consumed by build_config; HHRS_BENCH_* are
            # bench.py's own knobs (budget/probe/fake-hang/shapes) — both
            # legitimate in the same shell as any CLI
            continue
        section_name = next(
            (s for s in sorted(sections, key=len, reverse=True)
             if rest.startswith(s + "_")),
            None,
        )
        if section_name is None:
            raise ValueError(
                f"unknown config environment variable {var} "
                f"(sections: {sorted(sections)})"
            )
        field_name = rest[len(section_name) + 1:]
        section = getattr(cfg, section_name)
        if not hasattr(section, field_name):
            raise ValueError(
                f"{var}: section {section_name!r} has no field {field_name!r}"
            )
        cur = getattr(section, field_name)
        setattr(section, field_name, _coerce(environ[var], cur))
        applied.append(f"{section_name}.{field_name}={environ[var]}")
    return applied


def build_config(
    overrides: list | None = None,
    preset: str | None = None,
    environ=None,
    log=None,
) -> Config:
    """The CLIs' config assembly: defaults → preset (--preset or
    HHRS_PRESET) → HHRS_* env overrides → CLI overrides (last wins)."""
    import os

    environ = os.environ if environ is None else environ
    cfg = Config()
    preset = preset or environ.get("HHRS_PRESET") or ""
    if preset:
        changed = apply_preset(cfg, preset)
        if log is not None:
            for c in changed:
                log.info("preset %r: %s", preset, c)
            if not changed:
                log.info("preset %r: no changes (reference defaults)", preset)
    applied = apply_env_overrides(cfg, environ)
    if log is not None:
        for a in applied:
            log.info("env override: %s", a)
    cfg.apply_overrides(check_overrides(list(overrides or [])))
    return cfg
