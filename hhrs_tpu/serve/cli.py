"""Serving entry point: ``python -m hhrs_tpu.serve.cli``.

Equivalent of ``uvicorn main:app`` in the reference: load artifacts + CSVs,
build the device-resident engine, warm up the compiled request program, and
serve the REST contract. Exits non-zero on any startup failure (the
reference's fail-fast lifespan, main.py:274-277).
"""

from __future__ import annotations

import argparse
import logging
import sys

from hhrs_tpu.utils.logging import enable_compilation_cache, setup_logging

log = logging.getLogger("hhrs_tpu.serve")


def main(argv=None) -> int:
    setup_logging()
    enable_compilation_cache()
    p = argparse.ArgumentParser(description="Serve the TPU-native hybrid recommender")
    p.add_argument("--artifacts", default="artifacts",
                   help="artifact dir, or 'registry:<db>' to use the active registered model")
    p.add_argument("--data", default="data")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--pallas", action="store_true",
                   help="score with the fused Pallas eval tower (BN folded)")
    p.add_argument("--batch-window-ms", type=float, default=0.0,
                   help=">0: coalesce concurrent requests into batched device "
                        "programs within this window (dynamic batching)")
    p.add_argument("--max-batch", type=int, default=8)
    args = p.parse_args(argv)

    try:
        from hhrs_tpu.db.registry import resolve_artifacts_dir
        from hhrs_tpu.serve.engine import RecommendationEngine
        from hhrs_tpu.serve.http import serve_forever

        artifacts_dir = resolve_artifacts_dir(args.artifacts)
        engine = RecommendationEngine.from_dirs(artifacts_dir, args.data, use_pallas=args.pallas)
        if not args.no_warmup:
            log.info("warming up compiled request program...")
            want_batching = args.batch_window_ms > 0 and not args.pallas
            engine.warmup(batch_pad=args.max_batch if want_batching else None)
        if args.batch_window_ms > 0 and args.pallas:
            # recommend_many falls back to sequential under the Pallas
            # tower (no vmap rule) — a batcher would only serialize traffic
            # through one worker and add window latency.
            log.warning("--batch-window-ms ignored with --pallas "
                        "(batched program requires the jnp scoring path)")
        elif args.batch_window_ms > 0:
            from hhrs_tpu.serve.batcher import BatchingEngine

            engine = BatchingEngine(engine, max_batch=args.max_batch,
                                    window_ms=args.batch_window_ms)
            log.info("dynamic batching on: window %.1fms, max %d",
                     args.batch_window_ms, args.max_batch)
        log.info("Artifacts loaded successfully. Server is ready.")
    except Exception as e:
        log.critical("CRITICAL ERROR during startup: %s", e)
        import traceback

        traceback.print_exc()
        return 1

    serve_forever(engine, args.host, args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
