"""Continuous-training pipeline: watch data → fine-tune → gate → promote.

``python -m hhrs_tpu.pipeline --data DIR --db REG.sqlite --runs-dir RUNS``

The reference has no retraining story: ``train.py`` is a one-shot script
(reference train.py:270-397), the exported artifacts are copied into place
by hand, and the serving process must be restarted to pick anything up
(main.py:233-284 loads once in the startup lifespan). This module closes
the loop the operations docs describe as separate steps
(docs/OPERATIONS.md) into ONE supervised command:

  1. WATCH  — poll the data CSVs' stat fingerprints (the serve-side
     DataReloader's detector, debounced the same way) until a refreshed
     data drop lands;
  2. TRAIN  — fine-tune from the registry's active model (warm start:
     frozen encoders/scaler, id-stable vocab growth — train/warmstart.py),
     or train cold when the registry is empty. Training reads a
     CONSISTENT temp snapshot of the CSVs (serve/reload.py
     snapshot_data_dir), so a writer appending during the minutes-long
     run cannot tear the read;
  3. GATE   — re-score BOTH the candidate and the incumbent on the same
     snapshot's held-out split (db/cli.py run_promote with eval_data;
     default --eval-split val — the candidate just trained on the train
     split, so scoring all rows would reward memorization);
  4. PROMOTE — activate in the registry only if better; losers stay
     registered inactive with their gate metrics recorded.

A serving process started with ``--reload-poll-s`` (model hot swap) and
``--data-poll-s`` (data hot swap) then picks up both the promoted model
and the refreshed universe live — no restarts anywhere in the loop.

Every cycle appends one JSON record to ``<runs-dir>/pipeline_history.jsonl``
(trigger fingerprint, run dir, train rc, gate decision + reason, wall
times), so the retraining history is auditable. A failed train or gate
records the failure and keeps watching — the daemon never dies over one
bad drop.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

from hhrs_tpu.utils.logging import setup_logging

log = logging.getLogger("hhrs_tpu.pipeline")


def _append_history(runs_dir: str, rec: dict) -> None:
    os.makedirs(runs_dir, exist_ok=True)
    with open(os.path.join(runs_dir, "pipeline_history.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


def run_cycle(data_dir: str, db: str, runs_dir: str, *,
              epochs: int | None = None, preset: str | None = None,
              warm_start: bool = True, promote_metric: str = "val_logloss",
              eval_split: str = "val", overrides: list[str] | None = None,
              tag: str = "") -> dict:
    """One train→gate→promote cycle. Returns the history record (the
    callers append it to pipeline_history.jsonl). Never raises — failures
    are recorded with ``"ok": False`` so a watch loop survives a bad drop."""
    from hhrs_tpu.db.cli import run_promote
    from hhrs_tpu.db.registry import ModelRegistry
    from hhrs_tpu.train import cli as train_cli

    t0 = time.time()
    out = os.path.join(
        runs_dir, time.strftime("model-%Y%m%d-%H%M%S") + (f"-{tag}" if tag else ""))
    rec: dict = {"ts": t0, "run_dir": out, "data_dir": os.path.abspath(data_dir)}

    # Train and gate from a CONSISTENT SNAPSHOT of the data CSVs: the
    # training run takes minutes, and a writer appending mid-read would
    # tear it (the same defect class measured as total reload starvation
    # in the serve-side DataReloader before snapshot isolation —
    # RESULTS.md). The snapshot copy is milliseconds with a fingerprint
    # recheck; if the files never hold still even for that, fall back to
    # the live dir with a warning rather than never training.
    from hhrs_tpu.serve.reload import snapshot_data_dir

    try:
        snap = snapshot_data_dir(data_dir)
    except OSError:
        snap = None  # real cause already logged (disk/permissions)
    if snap is None:
        log.warning("data snapshot unavailable (see log); training from "
                    "the LIVE dir (a mid-train write may tear the read)")
    cycle_data = snap if snap is not None else data_dir
    rec["snapshot"] = snap is not None

    try:
        init_from = None
        if warm_start:
            try:
                active = ModelRegistry(db).active()
            except Exception:
                active = None  # registry not created yet → cold train
            if active is not None:
                init_from = active["artifact_path"]
        rec["warm_start_from"] = init_from

        train_args = ["--data", cycle_data, "--out", out]
        if init_from:
            train_args += ["--init-from", init_from]
        if epochs is not None:
            train_args += ["--epochs", str(epochs)]
        if preset:
            train_args += ["--preset", preset]
        train_args += list(overrides or [])
        log.info("cycle: training into %s (%s)", out,
                 f"warm start from {init_from}" if init_from else "cold start")
        try:
            rc = train_cli.main(train_args)
        except Exception as e:  # noqa: BLE001 — the watch loop must survive
            log.error("training raised: %s", e, exc_info=True)
            rec.update(ok=False, stage="train", error=repr(e))
            return rec
        rec["train_rc"] = rc
        if rc != 0:
            rec.update(ok=False, stage="train")
            return rec
        rec["train_s"] = round(time.time() - t0, 1)

        try:
            # Gate on the SAME snapshot the candidate trained from, under
            # the SAME layered config (preset + HHRS_* env + overrides) —
            # a default-config gate would noise-filter/split differently
            # whenever data.* overrides are in play, and its "val" rows
            # could overlap the candidate's training rows. The registry
            # audit field records the durable data dir, not the temp
            # snapshot path deleted below.
            from hhrs_tpu.config import build_config

            gate_cfg = build_config(list(overrides or []), preset=preset,
                                    log=log)
            mid, promoted, reason = run_promote(
                db, out, metric=promote_metric,
                eval_data=cycle_data, eval_split=eval_split,
                cfg=gate_cfg, record_eval_data=data_dir)
        except Exception as e:  # noqa: BLE001
            log.error("promote gate raised: %s", e, exc_info=True)
            rec.update(ok=False, stage="promote", error=repr(e))
            return rec
        rec.update(ok=True, model_id=mid, promoted=promoted, reason=reason,
                   total_s=round(time.time() - t0, 1))
        log.info("cycle done in %.1fs: model_id=%d %s — %s", rec["total_s"],
                 mid, "PROMOTED" if promoted else "kept incumbent", reason)
        return rec
    finally:
        if snap is not None:
            import shutil

            shutil.rmtree(snap, ignore_errors=True)


def main(argv=None) -> int:
    setup_logging()
    p = argparse.ArgumentParser(
        description="Continuous training: watch data, fine-tune, gate, promote")
    p.add_argument("--data", default="data", help="data dir with the two CSVs (watched)")
    p.add_argument("--db", required=True, help="sqlite model registry (created if missing)")
    p.add_argument("--runs-dir", default="runs",
                   help="each cycle trains into a fresh subdir here")
    p.add_argument("--once", action="store_true",
                   help="run ONE cycle now (no watching) and exit; exit code "
                        "reflects the cycle outcome")
    p.add_argument("--poll-s", type=float, default=30.0,
                   help="watch mode: data fingerprint poll interval")
    p.add_argument("--max-cycles", type=int, default=0,
                   help="watch mode: stop after N triggered cycles, counting "
                        "failed ones (0 = run forever)")
    p.add_argument("--cold", action="store_true",
                   help="train from scratch each cycle instead of warm-starting "
                        "from the registry's active model")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--preset", default=None,
                   help="train preset (e.g. 'tuned'); forwarded to the trainer")
    p.add_argument("--promote-metric", default="val_logloss")
    p.add_argument("--eval-split", choices=("all", "val", "train"), default="val",
                   help="which split of the refreshed data the gate re-scores "
                        "both models on. Default 'val' (the held-out split): "
                        "the candidate just TRAINED on this data's train "
                        "split, so scoring 'all'/'train' lets an overfit "
                        "candidate beat the incumbent on memorized rows")
    p.add_argument("overrides", nargs="*",
                   help="section.field=value config overrides, forwarded to the trainer")
    args = p.parse_args(argv)

    kw = dict(epochs=args.epochs, preset=args.preset, warm_start=not args.cold,
              promote_metric=args.promote_metric, eval_split=args.eval_split,
              overrides=args.overrides)

    if args.once:
        rec = run_cycle(args.data, args.db, args.runs_dir, **kw)
        _append_history(args.runs_dir, rec)
        return 0 if rec.get("ok") else 1

    # Watch mode: the serve-side data fingerprint + the same two-tick
    # debounce (serve/reload.py) avoids triggering on a file mid-write;
    # run_cycle's SNAPSHOT copy is the actual torn-read defense once a
    # cycle starts (debounce alone cannot protect a minutes-long read).
    from hhrs_tpu.serve.reload import data_fingerprint

    current_fp = data_fingerprint(args.data)
    pending = None
    cycles = 0
    log.info("watching %s every %.0fs (registry %s, runs in %s)",
             args.data, args.poll_s, args.db, args.runs_dir)
    while True:
        time.sleep(args.poll_s)
        fp = data_fingerprint(args.data)
        if fp == current_fp:
            pending = None
            continue
        if fp != pending:
            pending = fp  # first sighting: wait one tick for the write to settle
            continue
        cycles += 1
        rec = run_cycle(args.data, args.db, args.runs_dir,
                        tag=f"c{cycles}", **kw)
        rec["trigger_fingerprint"] = [list(t) for t in fp]
        _append_history(args.runs_dir, rec)
        # Adopt the fingerprint as seen at trigger time even on failure:
        # retrying the same broken drop every tick would train in a loop.
        # A FURTHER file change triggers the next cycle.
        current_fp = fp
        pending = None
        if args.max_cycles and cycles >= args.max_cycles:
            log.info("max cycles (%d) reached; exiting", args.max_cycles)
            return 0


if __name__ == "__main__":
    sys.exit(main())
