"""Serving entry point: ``python -m hhrs_tpu.serve.cli``.

Equivalent of ``uvicorn main:app`` in the reference: load artifacts + CSVs,
build the device-resident engine, warm up the compiled request program, and
serve the REST contract. Exits non-zero on any startup failure (the
reference's fail-fast lifespan, main.py:274-277).

Configuration layers like the other CLIs: ``ServeConfig`` defaults ←
``serve.field=value`` positional overrides ← explicit flags.
"""

from __future__ import annotations

import argparse
import logging
import sys

from hhrs_tpu.config import build_config
from hhrs_tpu.utils.logging import enable_compilation_cache, setup_logging

log = logging.getLogger("hhrs_tpu.serve")


def main(argv=None) -> int:
    setup_logging()
    enable_compilation_cache()
    p = argparse.ArgumentParser(description="Serve the TPU-native hybrid recommender")
    p.add_argument("--artifacts", default=None,
                   help="artifact dir, or 'registry:<db>' to use the active registered model")
    p.add_argument("--data", default=None)
    p.add_argument("--host", default=None)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--no-warmup", action="store_true")
    # --pallas retired after the round-2 kernel honesty pass: the fused eval
    # tower measured slower than XLA end-to-end at every scale (RESULTS.md).
    p.add_argument("--bf16", action="store_true",
                   help="score the catalog in bfloat16 on the MXU (f32 "
                        "accumulation; near-tied rankings may differ from f32)")
    p.add_argument("--quantize-tables", action="store_true",
                   help="hold the model's embedding tables as per-row int8 on "
                        "device: 4x less table HBM and gather traffic "
                        "(near-tied rankings may differ from f32)")
    p.add_argument("--retrieval-embeddings", default=None, metavar="NPY",
                   help="substitute learned retrieval vectors (one row per "
                        "internal item id; retrieval/two_tower.py exports "
                        "retrieval_embeddings.npy) for the ranker's item "
                        "table in the similarity surfaces — candidate kNN "
                        "expansion, /similar_items, MMR. Changes responses "
                        "by design; the ranking model is untouched")
    p.add_argument("--batch-window-ms", type=float, default=None,
                   help=">0: coalesce concurrent requests into batched device "
                        "programs within this window (dynamic batching)")
    p.add_argument("--max-batch", type=int, default=None)
    p.add_argument("--warm-http-batch", action="store_true",
                   help="pre-compile the POST /recommendations/batch program shape")
    p.add_argument("--candidate-cap", type=int, default=None,
                   help=">0: compiled fast path scoring only candidate rows "
                        "when the set fits (exact; overflow uses the full "
                        "program). Worth setting at large catalogs")
    p.add_argument("--cache-entries", type=int, default=None,
                   help=">0: LRU response cache (identical requests skip the "
                        "device; hot reload invalidates; serve.cache_ttl_s "
                        "adds expiry)")
    p.add_argument("--shadow", default=None, metavar="ARTIFACT_DIR",
                   help="mirror live traffic onto this CANDIDATE model off "
                        "the request path (bounded queue, responses come "
                        "only from the primary) and report agreement in "
                        "/healthz + /metrics — the pre-promotion check on "
                        "the real request mix (serve/shadow.py)")
    p.add_argument("--canary", default=None, metavar="ARTIFACT_DIR",
                   help="route a sticky user-hash slice of live traffic to "
                        "this CANDIDATE model ON the request path (errors "
                        "fall back to the primary; per-arm stats in /healthz "
                        "+ /metrics) — the staged-rollout step after "
                        "--shadow (serve/canary.py)")
    p.add_argument("--canary-fraction", type=float, default=0.1,
                   help="fraction of users (by stable id hash) the --canary "
                        "model answers (default 0.1, range (0, 1])")
    p.add_argument("--canary-salt", default="",
                   help="salt folded into the canary routing hash: rotates "
                        "WHICH users form the slice per rollout (e.g. pass "
                        "a release id). Default '' keeps the zero-config "
                        "restart-sticky slice — the same fixed user "
                        "population for every rollout")
    p.add_argument("--reload-poll-s", type=float, default=0.0,
                   help="with --artifacts registry:<db>: poll the registry "
                        "every N seconds and hot-swap to a newly activated "
                        "model without dropping traffic (0 disables)")
    p.add_argument("--data-poll-s", type=float, default=None,
                   help=">0: poll the data CSVs every N seconds and rebuild+"
                        "hot-swap the serving stack when they change — new "
                        "reviews/friendships reach live traffic without a "
                        "restart (debounced + torn-write-safe; the shadow/"
                        "canary arms keep their startup data until restart). "
                        "The reference requires a restart (main.py:242-245)")
    p.add_argument("--mesh", default=None, metavar="DATAxMODEL",
                   help="serve over a device mesh, e.g. 4x2: the item axis "
                        "(catalog features, masks, kNN table, MMR embeddings) "
                        "shards across all mesh devices; responses are "
                        "identical to single-device serving")
    p.add_argument("overrides", nargs="*", help="section.field=value config overrides")
    args = p.parse_args(argv)

    cfg_all = build_config(args.overrides, log=log)
    cfg = cfg_all.serve
    artifacts = args.artifacts if args.artifacts is not None else cfg.artifacts_dir
    data_dir = args.data if args.data is not None else cfg.data_dir
    host = args.host if args.host is not None else cfg.host
    port = args.port if args.port is not None else cfg.port
    window_ms = args.batch_window_ms if args.batch_window_ms is not None else cfg.batch_window_ms
    max_batch = args.max_batch if args.max_batch is not None else cfg.max_batch

    try:
        from hhrs_tpu.db.registry import resolve_artifacts_dir
        from hhrs_tpu.serve.engine import RecommendationEngine
        from hhrs_tpu.serve.http import HTTP_BATCH_PAD, serve_forever

        mesh = None
        if args.mesh:
            from hhrs_tpu.parallel.mesh import mesh_from_spec

            try:
                mesh = mesh_from_spec(args.mesh)
            except ValueError as e:
                p.error(str(e))

        artifacts_dir = resolve_artifacts_dir(artifacts)
        want_batching = window_ms > 0

        # Parse the CSVs ONCE: the primary/shadow/canary stacks share the
        # identical data_dir, and the parse is seconds-to-minutes of
        # startup each. The reload pollers re-parse possibly-refreshed
        # data from a consistent temp SNAPSHOT (serve/reload.py).
        import os as _os

        from hhrs_tpu.data.features import add_engineered_features
        from hhrs_tpu.data.ingest import load_friendships_csv, load_reviews_csv

        def _load_frames(d: str) -> tuple:
            """(main_df, friendships) parsed from a data dir — startup AND
            the reloaders' snapshot parses use this one loader."""
            return (
                add_engineered_features(load_reviews_csv(
                    _os.path.join(d, "hackathon_augmented_data.csv"))),
                load_friendships_csv(_os.path.join(d, "friendships.csv")),
            )

        # Fingerprint BEFORE the parse: the data reloader's baseline must
        # describe the files this startup actually read — stat'ing at
        # reloader construction (after the minutes-long parse+warmup)
        # would bake a mid-startup write into the baseline unserved.
        from hhrs_tpu.serve.reload import data_fingerprint

        _fp0 = data_fingerprint(data_dir)
        _frames = _load_frames(data_dir)

        def build_stack(adir: str, frames: tuple | None = None):
            """The full engine stack for one artifact dir — used at startup
            and verbatim by the hot-reload poller, so a reloaded model gets
            the same mesh/bf16/quantization/warmup/batching treatment.
            cfg.use_pallas is forwarded so an existing `serve.use_pallas=true`
            override reaches the engine's retirement warning (a no-op
            otherwise)."""
            cap = args.candidate_cap if args.candidate_cap is not None else cfg.candidate_cap
            eng = RecommendationEngine.from_dirs(
                adir, data_dir, mesh=mesh, bf16=args.bf16,
                retrieval_cfg=cfg_all.retrieval,  # retrieval.* overrides apply
                quantize_tables=args.quantize_tables or cfg.quantize_tables,
                candidate_cap=cap, city_bounded=cfg.city_bounded,
                use_pallas=cfg.use_pallas, frames=frames,
                retrieval_embeddings_path=args.retrieval_embeddings)
            if not args.no_warmup:
                log.info("warming up compiled request program...")
                eng.warmup(batch_pad=max_batch if want_batching else None)
                if args.warm_http_batch:
                    uni = eng.gen.universe
                    if uni.n_users and len(uni.cities):
                        eng.recommend_many(
                            [(int(uni.user_ids[0]), uni.cities[0], "friends", 0.7)],
                            pad_to=HTTP_BATCH_PAD,
                        )
                    eng.latency = type(eng.latency)()
            if want_batching:
                from hhrs_tpu.serve.batcher import BatchingEngine

                eng = BatchingEngine(eng, max_batch=max_batch, window_ms=window_ms)
                log.info("dynamic batching on: window %.1fms, max %d",
                         window_ms, max_batch)
            return eng

        engine = build_stack(artifacts_dir, frames=_frames)
        data_poll_s = (args.data_poll_s if args.data_poll_s is not None
                       else cfg.data_poll_s)
        registry_reload = args.reload_poll_s > 0
        if registry_reload and not artifacts.startswith("registry:"):
            log.warning("--reload-poll-s needs --artifacts registry:<db>; "
                        "ignoring (a plain dir never changes identity)")
            registry_reload = False
        if registry_reload or data_poll_s > 0:
            import threading as _threading

            from hhrs_tpu.serve.reload import (
                DataReloader, FramesCache, RegistryReloader, SwappableEngine)

            holder = SwappableEngine(engine)
            # ONE lock serializes both pollers' build+swap: a registry swap
            # landing mid-data-rebuild must not be overwritten by an engine
            # built from the superseded artifact dir (and vice versa). The
            # shared frames cache (seeded with the startup parse) lets a
            # model-only promotion skip re-parsing unchanged data while
            # holding that lock.
            swap_lock = _threading.Lock()
            frames_cache = FramesCache(_fp0, _frames)
            reloader = None
            if registry_reload:
                reloader = RegistryReloader(holder, artifacts, build_stack,
                                            args.reload_poll_s, artifacts_dir,
                                            swap_lock=swap_lock,
                                            data_dir=data_dir,
                                            frames_loader=_load_frames,
                                            frames_cache=frames_cache)
                reloader.start()
                log.info("registry hot reload on: polling every %.1fs",
                         args.reload_poll_s)
            if data_poll_s > 0:
                # rebuild with whatever model is CURRENT at trigger time —
                # the registry reloader's live dir when both pollers run
                current_dir_fn = (
                    (lambda: reloader.current_dir) if reloader is not None
                    else (lambda: artifacts_dir))
                data_rel = DataReloader(holder, data_dir, build_stack,
                                        data_poll_s, current_dir_fn,
                                        swap_lock=swap_lock,
                                        frames_loader=_load_frames,
                                        baseline_fp=_fp0,
                                        frames_cache=frames_cache)
                if reloader is not None:
                    # a model swap that parsed a fresh data fingerprint
                    # advances the data poller's baseline (reload.py)
                    reloader.data_reloader = data_rel
                data_rel.start()
                log.info("data hot reload on: polling %s every %.1fs "
                         "(shadow/canary arms keep startup data)",
                         data_dir, data_poll_s)
                if args.shadow or args.canary:
                    # arms are built once at startup: after a data swap the
                    # PRIMARY serves the refreshed universe while the
                    # candidate arm still serves the startup data, so
                    # agreement/comparison signals partly measure the DATA
                    # delta, not the model delta
                    log.warning(
                        "--data-poll-s with --shadow/--canary: after a data "
                        "reload the candidate arm keeps the STARTUP "
                        "universe — agreement stats then mix data drift "
                        "into the model comparison; restart the rollout "
                        "after large data drops")
            engine = holder
        if args.canary:
            from hhrs_tpu.serve.canary import CanaryEngine

            canary_dir = resolve_artifacts_dir(args.canary)
            if canary_dir == artifacts_dir:
                p.error("--canary is the same artifact dir as the primary")
            # a bare engine (no batching/cache): at canary fractions,
            # one-program-per-request is the simple predictable shape
            canary_eng = RecommendationEngine.from_dirs(
                canary_dir, data_dir, mesh=mesh, bf16=args.bf16,
                retrieval_cfg=cfg_all.retrieval,
                quantize_tables=args.quantize_tables or cfg.quantize_tables,
                candidate_cap=args.candidate_cap if args.candidate_cap is not None
                else cfg.candidate_cap,
                city_bounded=cfg.city_bounded, frames=_frames)
            if not args.no_warmup:
                canary_eng.warmup()
                if args.warm_http_batch:
                    # the canary arm answers its slice of /recommendations/
                    # batch via recommend_many(pad_to=HTTP_BATCH_PAD) — an
                    # unwarmed batched shape would compile ON the request
                    # path (minutes on the tunneled chip) and trip the
                    # canary fallback
                    uni = canary_eng.gen.universe
                    if uni.n_users and len(uni.cities):
                        canary_eng.recommend_many(
                            [(int(uni.user_ids[0]), uni.cities[0], "friends", 0.7)],
                            pad_to=HTTP_BATCH_PAD,
                        )
                    canary_eng.latency = type(canary_eng.latency)()
            # wraps the (possibly swappable) primary: a hot swap replaces
            # the primary arm while the canary slice stays pinned; the
            # cache sits OUTSIDE so hits skip the device, and routing is
            # deterministic and sticky so cached entries normally stay
            # arm-consistent. Known exception (ADVICE r3): if the canary
            # arm errors transiently, the primary's FALLBACK response for a
            # canary-slice user is cached and keeps serving that user until
            # TTL/eviction/hot-swap — fallbacks are cached cross-arm by
            # design (availability over arm purity); serve.cache_ttl_s
            # bounds the window.
            try:
                engine = CanaryEngine(engine, canary_eng,
                                      args.canary_fraction,
                                      canary_dir=canary_dir,
                                      salt=args.canary_salt)
            except ValueError as e:
                p.error(str(e))
            log.info("canary serving on: %s answers %.1f%% of users",
                     canary_dir, 100 * args.canary_fraction)
        cache_entries = (args.cache_entries if args.cache_entries is not None
                         else cfg.cache_entries)
        if cache_entries > 0:
            from hhrs_tpu.serve.cache import CachedEngine

            # outermost wrapper: hits skip the batch window AND the device;
            # generation tracking sees through the SwappableEngine on swap.
            engine = CachedEngine(engine, cache_entries, cfg.cache_ttl_s)
            log.info("response cache on: %d entries, ttl %.1fs",
                     cache_entries, cfg.cache_ttl_s)
        if args.shadow:
            from hhrs_tpu.serve.shadow import ShadowEngine

            if args.canary:
                # the shadow mirrors the CanaryEngine's mixed output, so
                # for canary-slice users "agreement" compares the shadow
                # against the canary (possibly the same model) — a muddied
                # pre-promotion signal (ADVICE r3)
                log.warning(
                    "--shadow with --canary: shadow agreement is computed "
                    "against MIXED primary/canary responses; prefer running "
                    "the shadow phase before the canary phase")

            shadow_dir = resolve_artifacts_dir(args.shadow)
            if shadow_dir == artifacts_dir:
                p.error("--shadow is the same artifact dir as the primary")
            # a bare engine, never batched/cached: it replays one request
            # at a time on the worker thread
            shadow_eng = RecommendationEngine.from_dirs(
                shadow_dir, data_dir, mesh=mesh, bf16=args.bf16,
                retrieval_cfg=cfg_all.retrieval,
                quantize_tables=args.quantize_tables or cfg.quantize_tables,
                candidate_cap=args.candidate_cap if args.candidate_cap is not None
                else cfg.candidate_cap,
                city_bounded=cfg.city_bounded, frames=_frames)
            if not args.no_warmup:
                shadow_eng.warmup()
            # OUTERMOST wrapper: sees every request, incl. cache hits (the
            # shadow's own compute is bounded by its queue, not the cache);
            # under --reload-poll-s the primary swaps while the shadow
            # model stays fixed — delegation handles it.
            engine = ShadowEngine(engine, shadow_eng, shadow_dir=shadow_dir)
            log.info("shadow serving on: mirroring traffic to %s", shadow_dir)
        log.info("Artifacts loaded successfully. Server is ready.")
    except Exception as e:
        log.critical("CRITICAL ERROR during startup: %s", e)
        import traceback

        traceback.print_exc()
        return 1

    serve_forever(engine, host, port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
