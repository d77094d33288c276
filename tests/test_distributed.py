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
