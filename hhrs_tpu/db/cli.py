"""DB ops entry point: ``python -m hhrs_tpu.db.cli``.

Equivalent of ``python database_setup.py`` in the reference
(database_setup.py:127-129) plus working registry commands:

  seed      --db hhrs.sqlite --data data/
  register  --db hhrs.sqlite --artifacts artifacts/ [--version v1] [--no-activate]
  activate  --db hhrs.sqlite --model-id N
  promote   --db hhrs.sqlite --artifacts artifacts/ [--metric val_logloss]
            (activate only if better than the active model; the retrain gate)
  list      --db hhrs.sqlite
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

from hhrs_tpu.utils.logging import setup_logging

log = logging.getLogger("hhrs_tpu.db")


def main(argv=None) -> int:
    setup_logging()
    p = argparse.ArgumentParser(description="DB seeding + model registry ops")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("seed")
    ps.add_argument("--db", default="hhrs.sqlite")
    ps.add_argument("--data", default="data")

    pr = sub.add_parser("register")
    pr.add_argument("--db", default="hhrs.sqlite")
    pr.add_argument("--artifacts", default="artifacts")
    pr.add_argument("--version", default=None)
    pr.add_argument("--no-activate", action="store_true")

    pa = sub.add_parser("activate")
    pa.add_argument("--db", default="hhrs.sqlite")
    pa.add_argument("--model-id", type=int, required=True)

    pp = sub.add_parser(
        "promote",
        help="register an artifact and activate it ONLY if it beats the "
             "active model on --metric (losers are registered inactive)")
    pp.add_argument("--db", default="hhrs.sqlite")
    pp.add_argument("--artifacts", default="artifacts")
    pp.add_argument("--version", default=None)
    pp.add_argument("--metric", default="val_logloss")
    pp.add_argument("--direction", choices=("min", "max", "auto"), default="auto")

    pl = sub.add_parser("list")
    pl.add_argument("--db", default="hhrs.sqlite")

    args = p.parse_args(argv)
    from hhrs_tpu.db.registry import ModelRegistry, seed_database

    try:
        if args.cmd == "seed":
            counts = seed_database(args.db, args.data)
            log.info("Database seeded successfully: %s", counts)
        elif args.cmd == "register":
            manifest_path = os.path.join(args.artifacts, "manifest.json")
            with open(manifest_path) as f:
                manifest = json.load(f)
            reg = ModelRegistry(args.db, create=True)
            mid = reg.register(
                args.version or None,
                args.artifacts,
                metrics=manifest.get("metrics", {}),
                hyperparams=manifest.get("model_config", {}),
                activate=not args.no_activate,
            )
            log.info("registered model_id=%d version=%s", mid,
                     next(m["version"] for m in reg.list() if m["model_id"] == mid))
        elif args.cmd == "activate":
            ModelRegistry(args.db).activate(args.model_id)
            log.info("model %d is now active", args.model_id)
        elif args.cmd == "promote":
            with open(os.path.join(args.artifacts, "manifest.json")) as f:
                manifest = json.load(f)
            reg = ModelRegistry(args.db, create=True)
            mid, promoted, reason = reg.promote_if_better(
                args.version or None, args.artifacts,
                metrics=manifest.get("metrics", {}),
                hyperparams=manifest.get("model_config", {}),
                metric=args.metric, direction=args.direction,
            )
            log.info("model_id=%d %s — %s", mid,
                     "PROMOTED" if promoted else "registered inactive", reason)
        elif args.cmd == "list":
            for m in ModelRegistry(args.db).list():
                print(json.dumps(m))
        return 0
    except Exception as e:
        log.error("An error occurred: %s", e, exc_info=True)
        return 1


if __name__ == "__main__":
    sys.exit(main())
