"""Offline batch inference: ``python -m hhrs_tpu.serve.batch_cli``.

Precompute recommendations for many users into JSONL — the standard
production recsys shape (nightly top-k exports, cache warming, offline
evaluation of the full two-stage pipeline). The reference serves only
online, one request at a time (main.py:307-357); this tool drives the same
engine through ``recommend_many``: one vmapped device program + ONE
device→host transfer per chunk of users, so per-request dispatch/transfer
overhead amortizes chunk-fold (the dynamic batcher's trick, applied
offline). Results are identical to the online endpoint per request —
tests/test_batch_cli.py asserts it.

Each user is recommended in a city: ``--city X`` fixes one for everyone;
the default infers each user's home city (their most-reviewed city — the
natural "recommend me a hotel where I usually book" export).

Output: one JSON line per user:
  {"user_id": 7, "city": "Sochi", "hotels": [<ranked payloads>]}
and a final summary line on stderr with users/s throughput.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time

log = logging.getLogger("hhrs_tpu.serve.batch")


def home_cities(main_df) -> dict:
    """user_id → most-reviewed city (ties: first in frame order).

    One vectorized pandas pass — this runs at nightly-export scale, so no
    per-group Python loop: the stable descending sort keeps the
    first-in-frame group on count ties, then drop_duplicates picks it.
    """
    sizes = (
        main_df.groupby(["user_id", "city"], sort=False).size().reset_index(name="n")
    )
    best = sizes.sort_values("n", kind="stable", ascending=False).drop_duplicates(
        "user_id"
    )
    return dict(zip(best["user_id"], best["city"]))


def main(argv=None) -> int:
    from hhrs_tpu.utils.logging import enable_compilation_cache, setup_logging

    setup_logging()
    enable_compilation_cache()
    p = argparse.ArgumentParser(description="Offline batch recommendations → JSONL")
    p.add_argument("--artifacts", default="artifacts",
                   help="artifact dir, or 'registry:<db>' for the active model")
    p.add_argument("--data", default="data")
    p.add_argument("--out", default="recommendations.jsonl")
    p.add_argument("--users", default=None,
                   help="file with one user id per line (default: every user "
                        "in the reviews frame)")
    p.add_argument("--city", default=None,
                   help="recommend everyone in this city (default: each "
                        "user's most-reviewed city)")
    p.add_argument("--mode", choices=["friends", "personal"], default="friends")
    p.add_argument("--lambda-param", type=float, default=0.7)
    p.add_argument("--chunk", type=int, default=64,
                   help="users per device dispatch (one compiled shape)")
    p.add_argument("--limit", type=int, default=None, help="cap user count")
    p.add_argument("--quantize-tables", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from hhrs_tpu.config import build_config
    from hhrs_tpu.db.registry import resolve_artifacts_dir
    from hhrs_tpu.serve.engine import RecommendationEngine

    cfg = build_config(args.overrides, log=log)
    engine = RecommendationEngine.from_dirs(
        resolve_artifacts_dir(args.artifacts), args.data,
        retrieval_cfg=cfg.retrieval,
        quantize_tables=args.quantize_tables or cfg.serve.quantize_tables,
        candidate_cap=cfg.serve.candidate_cap,
        city_bounded=cfg.serve.city_bounded,
        bf16=args.bf16)

    uni = engine.gen.universe
    if args.users:
        with open(args.users) as f:
            users = [int(line) for line in f if line.strip()]
    else:
        users = [int(u) for u in uni.user_ids]
    if args.limit:
        users = users[: args.limit]

    homes = None if args.city else home_cities(engine.main_df)
    requests = []
    for u in users:
        city = args.city or homes.get(u)
        if city is None:
            continue  # user with no reviews and no --city: nothing to infer
        requests.append((u, city, args.mode, args.lambda_param))

    n = len(requests)
    log.info("batch inference: %d users, chunk %d", n, args.chunk)
    t0 = time.perf_counter()
    written = 0
    with open(args.out, "w") as f:
        for i in range(0, n, args.chunk):
            chunk = requests[i : i + args.chunk]
            results = engine.recommend_many(chunk, pad_to=args.chunk)
            for (u, city, _m, _l), res in zip(chunk, results):
                f.write(json.dumps({"user_id": u, "city": city,
                                    "hotels": res.get("ranked_hotels", [])}) + "\n")
                written += 1
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "batch_inference", "users": written,
                      "seconds": round(dt, 2),
                      "users_per_s": round(written / dt, 1) if dt > 0 else None,
                      "out": args.out}), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
