"""Distributed init wrapper + mesh train CLI tests (8-device CPU mesh)."""

import json
import subprocess
import sys

import pytest

from hhrs_tpu.parallel.distributed import initialize_distributed


def test_initialize_noop_without_coordinator(monkeypatch):
    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
                "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False


def test_initialize_fails_fast_on_bad_coordinator():
    """Run in a subprocess: a failed coordination handshake can abort the
    process at the C++ layer, so the wrapper's fail-fast contract is
    'process exits non-zero / raises within the timeout', never a hang."""
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from hhrs_tpu.parallel.distributed import initialize_distributed\n"
        "try:\n"
        "    initialize_distributed(timeout_s=3)\n"
        "    print('UNEXPECTED-OK')\n"
        "except RuntimeError as e:\n"
        "    print('RAISED')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu",
             "COORDINATOR_ADDRESS": "127.0.0.1:1",
             "NUM_PROCESSES": "2", "PROCESS_ID": "1"},
    )
    assert "UNEXPECTED-OK" not in out.stdout


def test_train_cli_with_mesh(tmp_path, eight_devices):
    """--mesh 4x2 trains DP=4 with row-sharded-capable mesh end-to-end."""
    from hhrs_tpu.train.cli import main

    rc = main([
        "--synthetic",
        "--data", str(tmp_path / "data"),
        "--out", str(tmp_path / "artifacts"),
        "--synth-users", "150", "--synth-items", "60", "--synth-reviews", "2000",
        "--epochs", "2",
        "--mesh", "4x2",
        "train.batch_size=256", "train.eval_batch_size=512",
    ])
    assert rc == 0
    manifest = json.loads((tmp_path / "artifacts" / "manifest.json").read_text())
    assert "val_auc" in manifest["metrics"]


def test_fault_injection_kill_midrun_resumes_bit_exact(tmp_path):
    """Multi-host-shaped fault injection (SURVEY §5, VERDICT r1 item 6):
    SIGKILL a mesh (--mesh 4x2, row-sharded tables) training process
    mid-run on the 8-device virtual mesh, restart it, and assert the
    resumed run's remaining epochs and final metrics are bit-exact vs an
    uninterrupted run of the same config."""
    import os
    import signal
    import time

    env = {
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    data_dir = str(tmp_path / "data")
    base = [
        sys.executable, "-m", "hhrs_tpu.train.cli",
        "--synthetic", "--data", data_dir,
        "--synth-users", "200", "--synth-items", "80", "--synth-reviews", "9000",
        "--epochs", "8", "--mesh", "4x2",
        "train.batch_size=256", "train.eval_batch_size=1024",
        "train.early_stop_patience=99",
    ]

    def metrics_of(path):
        return [json.loads(l) for l in open(path) if l.strip()]

    # A: uninterrupted
    ma = str(tmp_path / "a.jsonl")
    out = subprocess.run(
        base + ["--out", str(tmp_path / "art_a"),
                "--checkpoint-dir", str(tmp_path / "ck_a"), "--metrics-log", ma],
        capture_output=True, text=True, timeout=600, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    a_hist = metrics_of(ma)
    assert len(a_hist) == 8

    # B: kill as soon as the first checkpoint commits, then restart
    ck_b = str(tmp_path / "ck_b")
    mb = str(tmp_path / "b.jsonl")
    proc = subprocess.Popen(
        base + ["--out", str(tmp_path / "art_b"), "--checkpoint-dir", ck_b,
                "--metrics-log", mb],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env, cwd="/root/repo",
    )
    try:
        deadline = time.time() + 420
        committed = None
        while time.time() < deadline and proc.poll() is None:
            steps = [d for d in (os.listdir(ck_b) if os.path.isdir(ck_b) else [])
                     if d.isdigit()]
            done = [s for s in steps
                    if os.path.exists(os.path.join(ck_b, s, "_CHECKPOINT_METADATA"))]
            if done:
                committed = max(int(s) for s in done)
                break
            time.sleep(0.05)
        assert committed is not None, "no checkpoint committed before deadline"
        assert proc.poll() is None, "run finished before the kill — too fast"
        proc.kill()  # SIGKILL: no teardown, mid-epoch state lost
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    b1_epochs = {m["epoch"] for m in metrics_of(mb)}

    out = subprocess.run(
        base + ["--out", str(tmp_path / "art_b"), "--checkpoint-dir", ck_b,
                "--metrics-log", mb],
        capture_output=True, text=True, timeout=600, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]

    b_hist = metrics_of(mb)
    resumed = [m for m in b_hist if m["epoch"] > committed]
    assert resumed, "resumed run recorded no epochs"
    # epochs after the kill point replay/continue bit-exactly
    a_by_epoch = {m["epoch"]: m for m in a_hist}
    for m in resumed:
        ref = a_by_epoch[m["epoch"]]
        assert m["val_loss"] == ref["val_loss"], (m["epoch"], m, ref)
        assert m["train_loss"] == ref["train_loss"]
        assert m["lr"] == ref["lr"]
    # epochs 0..committed ran before the kill (sanity on the injection)
    assert committed in b1_epochs

    # final exported metrics identical to the uninterrupted run
    man_a = json.loads((tmp_path / "art_a" / "manifest.json").read_text())
    man_b = json.loads((tmp_path / "art_b" / "manifest.json").read_text())
    assert man_a["metrics"] == man_b["metrics"]


def test_scaling_harness_runs():
    """The scaling benchmark executes on the virtual mesh and reports JSON."""
    out = subprocess.run(
        [sys.executable, "benchmarks/scaling.py", "--per-device-batch", "128",
         "--steps", "3", "--warmup", "1"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "dp_scaling"
    assert rec["results"][-1]["devices"] == 8
