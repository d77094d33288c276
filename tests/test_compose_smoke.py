"""L7 executable verification (VERDICT r1 item 10): the deployment
topology — the Dockerfile CMD (`python -m hhrs_tpu.serve.cli ...`) booted
against volume-shaped dirs and a SEEDED sqlite registry — serves /healthz
and a real recommendation. Docker itself cannot run in this image, so the
smoke emulates the container contract: same entrypoint, same volume layout
(artifacts/ + data/ + registry db), registry-resolved artifacts
(`--artifacts registry:<db>`), fail-fast on bad state.

Two boots are exercised: the flagged Dockerfile CMD, and the compose
service's ENV-ONLY form (`python -m hhrs_tpu.serve.cli` with nothing but
HHRS_* variables — docker-compose.yaml; VERDICT r3 item 6)."""

import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

import pytest

BASE_ENV = {
    "PATH": "/usr/bin:/bin:/usr/local/bin",
    "JAX_PLATFORMS": "cpu",
    "PYTHONPATH": "/root/repo",
}


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def seeded_volume(tmp_path_factory):
    """Artifacts + data + seeded registry, exactly as an operator would
    produce them (train CLI then db CLI) — the compose volume."""
    vol = tmp_path_factory.mktemp("compose_vol")
    data_dir = str(vol / "data")
    art_dir = str(vol / "artifacts")
    db = str(vol / "registry.sqlite")

    r = subprocess.run(
        [sys.executable, "-m", "hhrs_tpu.train.cli", "--synthetic",
         "--data", data_dir, "--out", art_dir,
         "--synth-users", "120", "--synth-items", "50", "--synth-reviews", "1500",
         "--epochs", "1", "train.batch_size=256", "train.eval_batch_size=512"],
        capture_output=True, text=True, timeout=420, env=BASE_ENV, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for cmd in (["seed", "--db", db, "--data", data_dir],
                ["register", "--db", db, "--artifacts", art_dir]):
        r = subprocess.run(
            [sys.executable, "-m", "hhrs_tpu.db.cli", *cmd],
            capture_output=True, text=True, timeout=120, env=BASE_ENV, cwd="/root/repo",
        )
        assert r.returncode == 0, (cmd, r.stderr[-2000:])
    return vol, db


def _wait_healthz(proc, port, timeout_s=300):
    """Poll /healthz until the server answers; returns the body text.
    Asserts the process is alive AND health actually came up (a deadline
    expiry with a live-but-never-healthy process must fail HERE with the
    server's stderr, not later with a raw URLError)."""
    deadline = time.time() + timeout_s
    health = None
    while time.time() < deadline and proc.poll() is None:
        try:
            health = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=5
            ).read().decode()
            break
        except OSError:
            time.sleep(0.5)
    if proc.poll() is not None:
        # dead process: stderr is at EOF, read() returns immediately
        raise AssertionError(proc.stderr.read()[-3000:])
    if not health:
        # live-but-never-healthy: KILL before reading — stderr is a live
        # PIPE and read() would block until process exit, hanging the test
        # instead of failing it with the captured output (ADVICE r4)
        proc.kill()
        proc.wait(timeout=30)
        raise AssertionError(
            "server never became healthy: " + proc.stderr.read()[-3000:])
    return health


def _drive_boot(proc, port, check_graceful=True):
    """Wait for /healthz, make one real request, SIGTERM, assert drain."""
    body_ok = False
    try:
        health = _wait_healthz(proc, port)
        assert "ok" in health

        body = json.dumps({"user_id": 1, "city": "Sochi", "type": "friends",
                           "lambda_param": 1.0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommendations", data=body,
            headers={"content-type": "application/json"},
        )
        resp = json.loads(urllib.request.urlopen(req, timeout=60).read().decode())
        assert "ranked_hotels" in resp
        body_ok = True
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            exit_code = proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
            exit_code = None
        # Only judge the shutdown when the body passed — a failing body
        # assertion must surface as itself, not as a shutdown-code error.
        if body_ok and check_graceful:
            # graceful drain: SIGTERM must finish in-flight requests and
            # exit 0 (serve/http.py serve_forever), not die on the signal
            assert exit_code == 0


@pytest.mark.slow
def test_dockerfile_cmd_boots_from_seeded_registry(seeded_volume):
    vol, db = seeded_volume
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "hhrs_tpu.serve.cli",
         "--artifacts", f"registry:{db}", "--data", "data", "--port", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
        env=BASE_ENV, cwd=str(vol),
    )
    _drive_boot(proc, port)


@pytest.mark.slow
def test_compose_env_only_boot(seeded_volume):
    """The compose service's command is flag-free: `python -m
    hhrs_tpu.serve.cli` configured PURELY by HHRS_* environment variables
    (port, registry-resolved artifacts, data dir, a cache knob)."""
    vol, db = seeded_volume
    port = _free_port()
    env = dict(
        BASE_ENV,
        HHRS_SERVE_PORT=str(port),
        HHRS_SERVE_ARTIFACTS_DIR=f"registry:{db}",
        HHRS_SERVE_DATA_DIR="data",
        HHRS_SERVE_CACHE_ENTRIES="16",
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "hhrs_tpu.serve.cli"],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
        env=env, cwd=str(vol),
    )
    _drive_boot(proc, port)


@pytest.mark.slow
def test_dual_poller_cli_hot_swaps_data_and_model(seeded_volume):
    """CI smoke of the full zero-restart serve wiring: ONE process booted
    with BOTH pollers (--reload-poll-s + --data-poll-s) hot-swaps first a
    refreshed data drop and then a re-registered model, visible as the
    /healthz hot_swaps counter — the path the soak drives on the chip
    (benchmarks/serve_soak.py --data-swap-every)."""
    vol, db = seeded_volume
    data_dir, art_dir = str(vol / "data"), str(vol / "artifacts")
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "hhrs_tpu.serve.cli",
         "--artifacts", f"registry:{db}", "--data", data_dir,
         "--port", str(port), "--reload-poll-s", "0.5",
         "--data-poll-s", "0.5", "--no-warmup"],
        env=BASE_ENV, cwd="/root/repo",
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
    )
    try:
        _wait_healthz(proc, port)

        last = [0]

        def swaps():
            # transient /healthz stalls mid-rebuild must not error the
            # poll loop — return the last-known count and keep polling
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                    last[0] = json.load(r).get("hot_swaps") or 0
            except OSError:
                pass
            return last[0]

        assert swaps() == 0

        # 1) refreshed data drop → data reload
        from hhrs_tpu.data.synthetic import append_reviews

        append_reviews(data_dir, 81_000_001, n=3)
        deadline = time.time() + 120
        while time.time() < deadline and swaps() < 1:
            time.sleep(0.5)
        assert swaps() >= 1, "data hot swap never landed"

        # 2) re-registered model (new model_id, same dir) → model reload
        r = subprocess.run(
            [sys.executable, "-m", "hhrs_tpu.db.cli", "register",
             "--db", db, "--artifacts", art_dir, "--version", "smoke-v2"],
            capture_output=True, text=True, timeout=120, env=BASE_ENV,
            cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        deadline = time.time() + 120
        while time.time() < deadline and swaps() < 2:
            time.sleep(0.5)
        assert swaps() >= 2, "model hot swap never landed"
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                # never leak the server or mask the real assertion
                proc.kill()
                proc.wait(timeout=10)
