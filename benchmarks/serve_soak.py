"""Sustained-reliability soak: constant concurrent traffic while the model
hot-swaps repeatedly (v1↔v2 promoted in the registry every --swap-every
seconds). serve_stack_ab measures the composed stack's phases once; this
answers the rolling-update question — does ANY request error or stall
across many swaps under load?

With ``--data-swap-every N`` a writer thread also appends fresh review
rows to the live data CSV every N seconds and the server runs
``--data-poll-s 1`` — model swaps and data-universe swaps then interleave
under load (the full zero-restart loop of docs/OPERATIONS.md).

Reported: total requests, errors, p50/p99, swaps observed via /healthz
model flips, data reloads observed in the server log. Pass = zero errors
and every promotion observed.

Usage: python benchmarks/serve_soak.py [--seconds 90] [--items 10000]
       python benchmarks/serve_soak.py --data-swap-every 15
"""

import argparse
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serve_stack_ab import _get, _post, build_world, pct  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=90.0)
    p.add_argument("--swap-every", type=float, default=10.0)
    p.add_argument("--items", type=int, default=10_000)
    p.add_argument("--users", type=int, default=5_000)
    p.add_argument("--reviews", type=int, default=50_000)
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--data-swap-every", type=float, default=0.0,
                   help=">0: append fresh review rows to the live data CSV "
                        "every N seconds (server runs --data-poll-s 1, so "
                        "data-universe hot swaps interleave with the model "
                        "swaps under load)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import socket
    import tempfile

    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()

    tmp = tempfile.mkdtemp(prefix="serve_soak_")
    stderr_path = os.path.join(tmp, "server.stderr")
    data_dir, dirs, db, df = build_world(tmp, args.items, args.users, args.reviews)
    base = f"http://127.0.0.1:{port}"

    serve_cmd = [sys.executable, "-m", "hhrs_tpu.serve.cli",
                 "--artifacts", f"registry:{db}", "--data", data_dir,
                 "--port", str(port), "--reload-poll-s", "1",
                 "--cache-entries", "256", "--candidate-cap", "4096",
                 "--batch-window-ms", "3", "--max-batch", "8"]
    if args.data_swap_every > 0:
        serve_cmd += ["--data-poll-s", "1"]
    proc = subprocess.Popen(
        serve_cmd,
        stdout=subprocess.DEVNULL, stderr=open(stderr_path, "w"),
        cwd="/root/repo",
    )
    result = {}
    try:
        deadline = time.time() + 900
        while time.time() < deadline and proc.poll() is None:
            try:
                _get(base, "/healthz")
                break
            except OSError:
                time.sleep(2)
        assert proc.poll() is None, open(stderr_path).read()[-3000:]

        users = df["user_id"].drop_duplicates().tolist()
        cities = df["city"].drop_duplicates().tolist()
        stop = threading.Event()
        lats, errors = [], []
        lock = threading.Lock()

        def client(i):
            n = 0
            while not stop.is_set():
                req = {"user_id": int(users[(i * 131 + n) % len(users)]),
                       "city": cities[(i + n) % len(cities)],
                       "type": "friends" if n % 2 else "personal",
                       "lambda_param": 0.7}
                try:
                    dt, _ = _post(base, req, timeout=60)
                    with lock:
                        lats.append(dt)
                except Exception as e:  # noqa: BLE001 — count every failure
                    with lock:
                        errors.append(repr(e))
                n += 1

        threads = [threading.Thread(target=client, args=(i,), daemon=True)
                   for i in range(args.concurrency)]
        for t in threads:
            t.start()

        data_appends = [0]
        if args.data_swap_every > 0:
            # writer thread: a fresh batch of reviews from a brand-new user
            # lands on the live CSV every --data-swap-every seconds (the
            # shared refreshed-data-drop simulator, data/synthetic.py)
            from hhrs_tpu.data.synthetic import append_reviews

            def writer():
                uid = 90_000_000
                while not stop.wait(args.data_swap_every):
                    uid += 1
                    append_reviews(data_dir, uid, n=4)
                    data_appends[0] += 1

            threading.Thread(target=writer, daemon=True).start()

        # promotion loop: alternate v1/v2 while traffic flows
        swaps_requested, models_seen = 0, set()
        t_end = time.time() + args.seconds
        flip = 0
        while time.time() < t_end:
            time.sleep(args.swap_every)
            flip ^= 1
            target = dirs["v2"] if flip else dirs["v1"]
            subprocess.run(
                [sys.executable, "-m", "hhrs_tpu.db.cli", "register", "--db",
                 db, "--artifacts", target,
                 "--version", f"soak-{swaps_requested}"],
                check=True, capture_output=True, cwd="/root/repo")
            swaps_requested += 1
            # wait for the poller to land it (1s poll)
            land = time.time() + 120
            while time.time() < land:
                m = _get(base, "/healthz").get("model")
                models_seen.add(m)
                if m == target:
                    break
                time.sleep(0.5)
        stop.set()
        for t in threads:
            t.join(timeout=90)

        with lock:
            result = {
                "metric": "serve_soak",
                "seconds": args.seconds,
                "requests": len(lats),
                "errors": len(errors),
                "error_samples": errors[:3],
                "p50_ms": round(pct(lats, 0.5) * 1e3, 1) if lats else None,
                "p99_ms": round(pct(lats, 0.99) * 1e3, 1) if lats else None,
                "rps": round(len(lats) / args.seconds, 1),
                "swaps_requested": swaps_requested,
                "models_served": len(models_seen),
            }
        if args.data_swap_every > 0:
            with open(stderr_path) as f:
                stderr_txt = f.read()
            result["data_appends"] = data_appends[0]
            result["data_reloads"] = stderr_txt.count("data reload complete")
        print(json.dumps(result))
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    if args.out and result:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0 if result and result["errors"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
