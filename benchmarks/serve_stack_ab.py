"""Serve-feature INTERACTION measurement (VERDICT r3 item 8): cache +
dynamic batching + canary + registry hot-reload enabled TOGETHER at the
100k-item catalog, driven through the real serve CLI over HTTP.

Each feature was measured alone in r2/r3 (RESULTS.md); this measures the
composed stack the compose deployment actually runs:

  phase cold    — 16 concurrent clients, first pass over a 64-request pool
                  (cache misses; batching coalesces; canary splits arms)
  phase warm    — the SAME pool again (cache hits dominate; hits skip both
                  the batch window and the device)
  phase reload  — a new model version is promoted in the registry, the
                  server hot-swaps mid-traffic, then the pool replays
                  (generation handshake must invalidate the cache exactly
                  once; canary slice stays pinned to the candidate)

Reported per phase: p50/p90/p99/rps over the request latencies, plus the
/healthz cache+canary counters, so the interactions (hit ratios per
phase, arm balance, post-swap invalidation) are all in the artifact.

Usage: python benchmarks/serve_stack_ab.py [--items 100000] [--out FILE]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(base, payload, timeout=120):
    req = urllib.request.Request(
        base + "/recommendations", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        body = json.loads(r.read())
    return time.perf_counter() - t0, body


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return json.loads(r.read())


def build_world(tmp, items, users, reviews):
    """Data CSVs + two artifact versions + a seeded registry."""
    import jax
    import numpy as np

    from hhrs_tpu.config import ModelConfig
    from hhrs_tpu.data import Preprocessor, add_engineered_features
    from hhrs_tpu.data.ingest import load_reviews_csv, noise_filter
    from hhrs_tpu.data.synthetic import write_synthetic_dataset
    from hhrs_tpu.models.dcn import ModelDims, init_dcn
    from hhrs_tpu.train.artifacts import export_artifacts

    data_dir = os.path.join(tmp, "data")
    write_synthetic_dataset(data_dir, n_users=users, n_items=items,
                            n_reviews=reviews, seed=13)
    df = add_engineered_features(noise_filter(
        load_reviews_csv(os.path.join(data_dir, "hackathon_augmented_data.csv"))))
    _, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig()

    dirs = {}
    for version, seed in (("v1", 0), ("v2", 1)):
        params, bn = init_dcn(jax.random.PRNGKey(seed), dims, mcfg)
        out = os.path.join(tmp, version)
        export_artifacts(out, params, bn, mcfg, dims, art,
                         {"val_logloss": 0.5 - 0.01 * seed, "val_auc": 0.8})
        dirs[version] = out

    db = os.path.join(tmp, "registry.sqlite")
    for cmd in (["seed", "--db", db, "--data", data_dir],
                ["register", "--db", db, "--artifacts", dirs["v1"],
                 "--version", "v1"]):
        subprocess.run([sys.executable, "-m", "hhrs_tpu.db.cli", *cmd],
                       check=True, capture_output=True, cwd="/root/repo")
    return data_dir, dirs, db, df


def run_pool(base, pool, concurrency):
    """Fire the request pool with N concurrent clients; returns latencies."""
    lat = [None] * len(pool)

    def hit(i):
        lat[i], _ = _post(base, pool[i])

    with ThreadPoolExecutor(max_workers=concurrency) as ex:
        list(ex.map(hit, range(len(pool))))
    return [x for x in lat if x is not None]


def pct(lats, q):
    s = sorted(lats)
    return s[min(len(s) - 1, int(q * len(s)))]


def phase_stats(name, lats, wall, health):
    cache = health.get("cache", {})
    canary = health.get("canary", {})
    return {
        "phase": name,
        "n": len(lats),
        "p50_ms": round(pct(lats, 0.50) * 1e3, 1),
        "p90_ms": round(pct(lats, 0.90) * 1e3, 1),
        "p99_ms": round(pct(lats, 0.99) * 1e3, 1),
        "rps": round(len(lats) / wall, 1),
        "cache": {k: cache.get(k) for k in ("hits", "misses", "entries",
                                            "invalidations") if k in cache},
        "canary": {k: canary.get(k) for k in ("primary_served",
                                              "canary_served", "errors")
                   if k in canary},
        "model": health.get("model"),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--items", type=int, default=100_000)
    p.add_argument("--users", type=int, default=50_000)
    p.add_argument("--reviews", type=int, default=500_000)
    p.add_argument("--pool", type=int, default=64, help="distinct requests")
    p.add_argument("--repeat", type=int, default=3,
                   help="each pool request fires this many times per phase")
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import socket

    port = args.port
    if not port:
        s = socket.socket(); s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]; s.close()

    tmp = tempfile.mkdtemp(prefix="serve_stack_")
    stderr_path = os.path.join(tmp, "server.stderr")
    t0 = time.time()
    data_dir, dirs, db, df = build_world(tmp, args.items, args.users, args.reviews)
    print(f"# world built in {time.time()-t0:.0f}s", file=sys.stderr)

    # the composed stack: registry hot-reload + canary + cache + batching
    proc = subprocess.Popen(
        [sys.executable, "-m", "hhrs_tpu.serve.cli",
         "--artifacts", f"registry:{db}", "--data", data_dir,
         "--port", str(port), "--reload-poll-s", "1",
         "--canary", dirs["v2"], "--canary-fraction", "0.1",
         "--cache-entries", "1024", "--candidate-cap", "4096",
         "--batch-window-ms", "5", "--max-batch", "16"],
        # stderr to a FILE, not a pipe: an undrained pipe blocks the server
        # once XLA/absl warnings exceed the buffer, freezing the benchmark
        stdout=subprocess.DEVNULL, stderr=open(stderr_path, "w"),
        cwd="/root/repo",
    )
    base = f"http://127.0.0.1:{port}"
    results = []
    try:
        deadline = time.time() + 1200  # 100k-catalog warmup compiles
        healthy = False
        while time.time() < deadline and proc.poll() is None:
            try:
                _get(base, "/healthz")
                healthy = True
                break
            except OSError:
                time.sleep(2)
        tail = open(stderr_path).read()[-4000:]
        assert proc.poll() is None, tail
        assert healthy, f"server never became healthy: {tail}"
        print(f"# server up at {time.time()-t0:.0f}s", file=sys.stderr)

        users = df["user_id"].drop_duplicates().tolist()
        cities = df["city"].drop_duplicates().tolist()
        pool1 = [{"user_id": int(users[i % len(users)]),
                  "city": cities[i % len(cities)],
                  "type": "friends", "lambda_param": 0.7}
                 for i in range(args.pool)]
        pool = pool1 * args.repeat  # repeats inside a phase hit the cache too

        for name in ("cold", "warm"):
            tw = time.perf_counter()
            lats = run_pool(base, pool, args.concurrency)
            wall = time.perf_counter() - tw
            st = phase_stats(name, lats, wall, _get(base, "/healthz"))
            results.append(st)
            print(json.dumps(st))

        # hot swap: promote v2; the poller swaps the PRIMARY arm live
        subprocess.run(
            [sys.executable, "-m", "hhrs_tpu.db.cli", "register", "--db", db,
             "--artifacts", dirs["v2"], "--version", "v2"],
            check=True, capture_output=True, cwd="/root/repo")
        swap_deadline = time.time() + 600
        while time.time() < swap_deadline:
            if _get(base, "/healthz").get("model") == dirs["v2"]:
                break
            time.sleep(1)
        st_model = _get(base, "/healthz").get("model")
        assert st_model == dirs["v2"], f"hot swap never landed: {st_model}"
        print("# hot swap landed", file=sys.stderr)

        tw = time.perf_counter()
        lats = run_pool(base, pool, args.concurrency)
        wall = time.perf_counter() - tw
        st = phase_stats("reload", lats, wall, _get(base, "/healthz"))
        results.append(st)
        print(json.dumps(st))
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # 500k-review world, tens of MB

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"items": args.items, "concurrency": args.concurrency,
                       "pool": args.pool, "repeat": args.repeat,
                       "phases": results}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
