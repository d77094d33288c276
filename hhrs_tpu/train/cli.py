"""Training entry point: ``python -m hhrs_tpu.train.cli``.

Equivalent of ``python train.py`` in the reference (train.py:270-397) minus
the 300-trial HPO sweep (that lives in hhrs_tpu.hpo.cli): load CSVs (or
generate synthetic data), preprocess, train DCN-R, report final
LogLoss/AUC/RMSE, export serve artifacts.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from hhrs_tpu.config import Config, build_config
from hhrs_tpu.utils.logging import MetricsLogger, enable_compilation_cache, setup_logging

log = logging.getLogger("hhrs_tpu.train")


def ensure_synthetic(args, cfg: Config) -> str:
    """Generate the synthetic CSVs if requested/missing; returns the review
    CSV path."""
    csv_path = os.path.join(args.data, "hackathon_augmented_data.csv")
    if args.synthetic:
        from hhrs_tpu.data.synthetic import write_synthetic_dataset

        os.makedirs(args.data, exist_ok=True)
        if not os.path.exists(csv_path) or getattr(args, "regen", False):
            log.info("generating synthetic dataset in %s", args.data)
            write_synthetic_dataset(
                args.data,
                n_users=args.synth_users,
                n_items=args.synth_items,
                n_reviews=args.synth_reviews,
                seed=cfg.train.seed,
            )
    return csv_path


def load_frame(args, cfg: Config):
    """Ingest → noise filter → engineered features (the shared pre-encode
    pipeline; reference train.py:273-287)."""
    from hhrs_tpu.data.features import add_engineered_features
    from hhrs_tpu.data.ingest import load_reviews_csv, noise_filter

    csv_path = ensure_synthetic(args, cfg)
    df = load_reviews_csv(csv_path)
    df = noise_filter(df, cfg.data.positive_rating, cfg.data.negative_rating)
    return add_engineered_features(df)


def build_dataset(args, cfg: Config):
    from hhrs_tpu.data.preprocess import Preprocessor

    csv_path = ensure_synthetic(args, cfg)

    cache_dir = getattr(args, "cache_dir", None)
    key = None
    if cache_dir:
        from hhrs_tpu.data import cache

        key = cache.cache_key(csv_path, {
            "pos": cfg.data.positive_rating, "neg": cfg.data.negative_rating,
            "cat": list(cfg.data.categorical_cols), "num": list(cfg.data.numerical_cols),
            "test_size": cfg.data.test_size, "seed": cfg.data.split_seed,
            "leakage": cfg.data.leakage_compat,
        })
        hit = cache.load(cache_dir, key)
        if hit is not None:
            return hit

    df = load_frame(args, cfg)  # ONE pre-encode pipeline, shared with warm start
    pre = Preprocessor(
        categorical_cols=cfg.data.categorical_cols,
        numerical_cols=cfg.data.numerical_cols,
        test_size=cfg.data.test_size,
        split_seed=cfg.data.split_seed,
        leakage_compat=cfg.data.leakage_compat,
    )
    splits, artifacts = pre.fit_transform(df)
    if cache_dir:
        from hhrs_tpu.data import cache

        cache.save(cache_dir, key, splits, artifacts)
    return splits, artifacts


def main(argv=None) -> int:
    setup_logging()
    # NOTE: the compilation-cache gate probes jax.default_backend(), which
    # initializes XLA — it must run AFTER a --distributed init (JAX
    # requires jax.distributed.initialize before ANY backend touch), so it
    # moved below the argparse/--distributed block.
    p = argparse.ArgumentParser(description="Train the TPU-native DCN-R ranker")
    p.add_argument("--data", default="data", help="data dir with the two CSVs")
    p.add_argument("--out", default="artifacts", help="artifact output dir")
    p.add_argument("--synthetic", action="store_true", help="generate synthetic data if missing")
    p.add_argument("--regen", action="store_true", help="force-regenerate synthetic data")
    p.add_argument("--synth-users", type=int, default=2000)
    p.add_argument("--synth-items", type=int, default=600)
    p.add_argument("--synth-reviews", type=int, default=40000)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--metrics-log", default=None, help="JSONL per-epoch metrics sink")
    p.add_argument("--cache-dir", default=None,
                   help="preprocessed-dataset cache (skips ingest on repeat runs)")
    p.add_argument("--checkpoint-dir", default=None, help="orbax checkpoint dir (resume-from-latest)")
    p.add_argument("--init-from", default=None, metavar="ARTIFACT_DIR",
                   help="warm-start fine-tuning from a shipped artifact dir: "
                        "encoders/scaler frozen to the artifact, user/item "
                        "vocabs grow (old ids keep their embedding rows), "
                        "tower weights copied; the model architecture comes "
                        "from the artifact's manifest (train/warmstart.py)")
    p.add_argument("--register-db", default=None,
                   help="register exported artifacts as the active model in this sqlite registry")
    p.add_argument("--promote", action="store_true",
                   help="with --register-db: activate only if the run BEATS "
                        "the active model on --promote-metric (losers are "
                        "registered inactive) — the retraining gate")
    p.add_argument("--promote-metric", default="val_logloss",
                   help="metric for --promote (direction auto-inferred)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the run into this dir")
    p.add_argument("--mesh", default=None, metavar="DATAxMODEL",
                   help="train over a device mesh, e.g. 4x2 (data-parallel batch, "
                        "row-sharded tables); requires that many devices")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: run jax.distributed.initialize first")
    p.add_argument("--preset", default=None,
                   help="named config preset applied before overrides "
                        "(e.g. 'tuned' = B=32768 + rng_impl=rbg + bf16 "
                        "storage, the measured-fastest trainer stack — "
                        "RESULTS.md; env: HHRS_PRESET)")
    p.add_argument("overrides", nargs="*", help="section.field=value config overrides")
    args = p.parse_args(argv)

    cfg = build_config(args.overrides, preset=args.preset, log=log)
    if args.epochs is not None:
        cfg.train.n_epochs = args.epochs
    if args.promote and not args.register_db:
        p.error("--promote requires --register-db (nothing to gate into)")

    if args.distributed:
        from hhrs_tpu.parallel.distributed import initialize_distributed

        initialize_distributed()
    enable_compilation_cache()

    mesh = None
    if args.mesh:
        from hhrs_tpu.parallel.mesh import mesh_from_spec

        try:
            mesh = mesh_from_spec(args.mesh)
        except ValueError as e:
            p.error(str(e))

    init_state = None
    try:
        if args.init_from:
            from hhrs_tpu.train.artifacts import load_artifact_bundle
            from hhrs_tpu.train.warmstart import prepare_warm_start

            bundle = load_artifact_bundle(args.init_from)
            if cfg.model != bundle.model_cfg:
                log.info("warm start: model config comes from %s's manifest "
                         "(CLI model.* overrides ignored)", args.init_from)
            cfg.model = bundle.model_cfg
            ws = prepare_warm_start(
                bundle, load_frame(args, cfg),
                test_size=cfg.data.test_size, split_seed=cfg.data.split_seed,
                init_seed=cfg.train.seed,
            )
            splits, preproc = ws.splits, ws.preproc
            init_state = (ws.params, ws.bn_state)
        else:
            splits, preproc = build_dataset(args, cfg)
    except FileNotFoundError as e:
        log.error("Data file not found: %s (pass --synthetic to generate)", e)
        return 1

    from hhrs_tpu.models.dcn import ModelDims
    from hhrs_tpu.train.artifacts import export_artifacts
    from hhrs_tpu.train.trainer import train_dcn

    dims = ModelDims.from_artifacts(preproc)
    log.info(
        "training DCN-R: %d users, %d items, cat_dims=%s, %d train / %d val",
        dims.n_users,
        dims.n_items,
        dict(dims.cat_dims),
        splits.n_train,
        splits.n_val,
    )

    metrics_logger = MetricsLogger(args.metrics_log) if args.metrics_log else None

    import contextlib

    from hhrs_tpu.utils.profiling import trace

    profile_cm = trace(args.profile_dir) if args.profile_dir else contextlib.nullcontext()
    with profile_cm:
        result = train_dcn(
            splits, dims, cfg.model, cfg.train, mesh=mesh,
            explicit_exchange=cfg.mesh.explicit_exchange or None,
            exchange_capacity_factor=cfg.mesh.exchange_capacity_factor,
            metrics_logger=metrics_logger, checkpoint_dir=args.checkpoint_dir,
            init_state=init_state,
        )

    m = result.final_metrics
    log.info("Final Validation LogLoss: %.4f", m["val_logloss"])
    log.info("Final Validation AUC:     %.4f", m["val_auc"])
    log.info("Final Validation RMSE:    %.4f", m["val_rmse"])
    log.info("Throughput: %.0f examples/s", result.examples_per_s)

    export_artifacts(args.out, result.params, result.bn_state, cfg.model, dims,
                     preproc, m, train_cfg=cfg.train)
    import jax as _jax

    if _jax.process_count() > 1 and _jax.process_index() != 0:
        # multi-host launch: export_artifacts gathered (all processes) but
        # only the primary wrote files — registry writes are its job too
        return 0
    log.info("artifacts exported to %s", args.out)

    if args.register_db:
        import dataclasses

        from hhrs_tpu.db.registry import ModelRegistry

        reg = ModelRegistry(args.register_db, create=True)
        if args.promote:
            mid, promoted, reason = reg.promote_if_better(
                None, args.out,
                metrics=m, hyperparams=dataclasses.asdict(cfg.model),
                metric=args.promote_metric,
            )
            log.info("model_id=%d %s in %s — %s", mid,
                     "PROMOTED" if promoted else "registered inactive",
                     args.register_db, reason)
        else:
            mid = reg.register(
                None, args.out,
                metrics=m, hyperparams=dataclasses.asdict(cfg.model),
            )
            log.info("registered model_id=%d in %s", mid, args.register_db)
    return 0


if __name__ == "__main__":
    sys.exit(main())
