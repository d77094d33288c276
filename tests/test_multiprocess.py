"""TRUE multi-process training (VERDICT r4 item 2).

The reference is single-device (`/root/reference/train.py:32`); the north
star is a multi-HOST pod slice. These tests launch 2 REAL processes — each
with 4 virtual CPU devices of its own (`xla_force_host_platform_device_count=4`)
— through ``jax.distributed.initialize`` against a localhost coordinator
(tests/mp_worker.py), run the full integrated mesh trainer over the global
4x2 (data, model) mesh, and assert the 2-process run reproduces the
single-process 8-device run's loss trajectory. Epoch/val tensors feed
per-process via addressable shards (``parallel/multiprocess.py``) — no
process ever transfers the whole epoch; the worker also records that its
result params were NOT fully addressable, i.e. the run was genuinely
distributed rather than 8 local devices wearing two process labels.
"""

from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_workers(tmp_path, nproc=2, local_devices=4, ckpt_dir=None,
                    n_epochs=None, timeout=900):
    """Run ``nproc`` real worker processes to completion; return their
    parsed result records (ordered by process id)."""
    port = _free_port()
    env = dict(os.environ)
    # repo on the path; REPLACES the sitecustomize dir that pins the TPU
    env["PYTHONPATH"] = REPO
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={local_devices}",
    })
    procs, outs = [], []
    for pid in range(nproc):
        out = str(tmp_path / f"mp_result_{pid}.json")
        outs.append(out)
        cmd = [sys.executable, WORKER, str(pid), str(nproc), str(port), out,
               ckpt_dir or "-"]
        if n_epochs is not None:
            cmd.append(str(n_epochs))
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    results = []
    for pid, p in enumerate(procs):
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()  # exact PIDs we started
            raise
        assert p.returncode == 0, f"worker {pid} failed:\n{stdout[-4000:]}"
        with open(outs[pid]) as f:
            results.append(json.load(f))
    return results


@pytest.fixture(scope="module")
def single_process_run():
    """The same problem on the in-process 8-device mesh (the reference
    trajectory; mp_worker shares the problem constants)."""
    import dataclasses

    from hhrs_tpu.config import ModelConfig, TrainConfig
    from hhrs_tpu.parallel.mesh import make_mesh
    from hhrs_tpu.train.trainer import train_dcn

    import mp_worker  # tests/ is on sys.path (pytest rootdir insertion)

    splits, dims, mcfg, tcfg = mp_worker.build_problem()
    mesh = make_mesh(*mp_worker.MESH_SHAPE)
    return train_dcn(splits, dims, mcfg, tcfg, mesh=mesh)


@pytest.fixture(scope="module")
def two_process_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mp")
    return _launch_workers(tmp, nproc=2, local_devices=4)


@pytest.mark.usefixtures("eight_devices")
def test_two_process_run_matches_single_process(single_process_run,
                                                two_process_run):
    r0, r1 = two_process_run
    assert r0["process_count"] == 2 and r0["global_devices"] == 8
    assert r0["local_devices"] == 4

    # genuinely distributed: each process held only its param shards
    assert r0["params_fully_addressable"] is False
    assert r1["params_fully_addressable"] is False

    # SPMD control flow never diverged between the two processes
    assert r0["history"] == r1["history"]
    assert r0["final_metrics"] == r1["final_metrics"]

    # ...and the distributed run reproduces the single-process trajectory
    ref = single_process_run
    ref_vl = np.array([h["val_loss"] for h in ref.history])
    mp_vl = np.array([h["val_loss"] for h in r0["history"]])
    assert len(ref_vl) == len(mp_vl)
    np.testing.assert_allclose(mp_vl, ref_vl, rtol=1e-4, atol=1e-6)
    assert [h["lr"] for h in r0["history"]] == [h["lr"] for h in ref.history]
    assert r0["final_metrics"]["val_logloss"] == pytest.approx(
        ref.final_metrics["val_logloss"], rel=1e-4)
    assert r0["final_metrics"]["val_auc"] == pytest.approx(
        ref.final_metrics["val_auc"], abs=1e-4)


def test_two_process_checkpoint_and_resume(tmp_path):
    """Multi-process checkpointing: sharded state gathers to replicated
    host copies, every process enters the orbax save (its barriers need
    all of them; the primary host writes), and a fresh 2-process launch
    resumes to the uninterrupted trajectory (same shared-filesystem
    contract as a pod slice)."""
    ckpt = str(tmp_path / "ckpt")

    # epochs 0-1 with checkpoints
    first = _launch_workers(tmp_path, nproc=2, local_devices=4,
                            ckpt_dir=ckpt, n_epochs=2)
    assert len(first[0]["history"]) == 2
    assert os.path.isdir(ckpt) and os.listdir(ckpt)

    # resume → epochs 2-3 (restored history carries epochs 0-1 forward);
    # compare the whole 4-epoch trajectory vs a one-shot 4-epoch run
    resumed = _launch_workers(tmp_path, nproc=2, local_devices=4,
                              ckpt_dir=ckpt, n_epochs=4)
    full = _launch_workers(tmp_path, nproc=2, local_devices=4, n_epochs=4)
    res_hist = resumed[0]["history"]
    full_hist = full[0]["history"]
    assert [h["epoch"] for h in res_hist] == [h["epoch"] for h in full_hist]
    assert res_hist[:2] == first[0]["history"]  # restored prefix, verbatim
    np.testing.assert_allclose(
        [h["val_loss"] for h in res_hist],
        [h["val_loss"] for h in full_hist], rtol=1e-4, atol=1e-6)


def test_two_process_host_death_midrun_resumes(tmp_path):
    """Multi-HOST fault injection (SURVEY §5): one of the two processes
    SIGKILLs itself at the end of epoch 1, BEFORE that epoch's checkpoint
    commits (orbax's save barrier never completes, so the partial step is
    discarded). The orchestrator — this test — kills the surviving peer
    (standard pod behavior: a dead host fails the job) and relaunches the
    whole 2-process job on the same checkpoint dir; the resumed run must
    reproduce the uninterrupted trajectory."""
    ckpt = str(tmp_path / "ckpt")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "MP_DIE_RANK": "1",
        "MP_DIE_AT_EPOCH": "1",
    })
    procs = []
    for pid in range(2):
        out = str(tmp_path / f"dead_{pid}.json")
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), out, ckpt, "3"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    # rank 1 SIGKILLs itself mid-run
    rc1 = procs[1].wait(timeout=600)
    assert rc1 == -signal.SIGKILL, rc1
    # the survivor is stuck in a collective with a dead peer — the
    # orchestrator (us) fails the job (exact PID we started)
    time.sleep(2)
    procs[0].kill()
    procs[0].wait(timeout=60)
    # epoch 0's checkpoint committed; epoch 1's partial save must NOT have
    assert os.path.isdir(ckpt)

    # full fresh relaunch resumes and finishes
    resumed = _launch_workers(tmp_path, nproc=2, local_devices=4,
                              ckpt_dir=ckpt, n_epochs=3)
    full = _launch_workers(tmp_path, nproc=2, local_devices=4, n_epochs=3)
    res_hist = resumed[0]["history"]
    full_hist = full[0]["history"]
    assert [h["epoch"] for h in res_hist] == [0, 1, 2]
    np.testing.assert_allclose(
        [h["val_loss"] for h in res_hist],
        [h["val_loss"] for h in full_hist], rtol=1e-4, atol=1e-6)


def test_two_process_train_cli_exports_once(tmp_path):
    """The production launch shape: `train.cli --distributed --mesh` in 2
    real processes (COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env — the
    jax.distributed contract parallel/distributed.py implements). The
    sharded result gathers inside export_artifacts; only the primary
    writes the artifact dir + registry row, and the artifacts load."""
    from hhrs_tpu.data.synthetic import write_synthetic_dataset

    data = str(tmp_path / "data")
    write_synthetic_dataset(data, n_users=250, n_items=70, n_reviews=5000,
                            seed=21)
    out = str(tmp_path / "arts")
    db = str(tmp_path / "reg.sqlite")
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "COORDINATOR_ADDRESS": f"localhost:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "hhrs_tpu.train.cli", "--synthetic",
             "--data", data, "--epochs", "2", "--mesh", "4x2",
             "--distributed", "--out", out, "--register-db", db],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    for pid, p in enumerate(procs):
        stdout, _ = p.communicate(timeout=900)
        assert p.returncode == 0, f"cli worker {pid} failed:\n{stdout[-4000:]}"

    from hhrs_tpu.db.registry import ModelRegistry
    from hhrs_tpu.train.artifacts import load_artifact_bundle

    bundle = load_artifact_bundle(out)
    assert bundle.item_embeddings.shape[1] == bundle.model_cfg.emb_dim
    assert len(ModelRegistry(db).list()) == 1  # one row, not two


def test_two_process_capped_exchange_matches_single_process(tmp_path):
    """The full production combo: 2 real processes, row-sharded tables,
    and the skew-bounded capped exchange (explicit shard_map all-to-all
    ACROSS process boundaries). Trajectory and per-epoch overflow rates
    must match the single-process 8-device capped run."""
    import mp_worker
    from hhrs_tpu.parallel.mesh import make_mesh
    from hhrs_tpu.train.trainer import train_dcn

    splits, dims, mcfg, tcfg = mp_worker.build_problem()
    ref = train_dcn(splits, dims, mcfg, tcfg,
                    mesh=make_mesh(*mp_worker.MESH_SHAPE),
                    explicit_exchange="capped",
                    exchange_capacity_factor=1.25)

    os.environ["MP_EXCHANGE"] = "capped"
    try:
        results = _launch_workers(tmp_path, nproc=2, local_devices=4)
    finally:
        os.environ.pop("MP_EXCHANGE", None)
    r0, r1 = results
    assert r0["history"] == r1["history"]
    np.testing.assert_allclose(
        [h["val_loss"] for h in r0["history"]],
        [h["val_loss"] for h in ref.history], rtol=1e-4, atol=1e-6)
    # identical kept sets → identical overflow accounting across layouts
    assert [h["exchange_overflow"] for h in r0["history"]] == [
        h["exchange_overflow"] for h in ref.history]
    assert any(h["exchange_overflow"] > 0 for h in r0["history"])


@pytest.mark.usefixtures("eight_devices")
def test_four_process_run_matches_single_process(single_process_run, tmp_path):
    """Process-count generality: the same global 8-device problem split
    4 ways (4 processes x 2 local devices) reproduces the trajectory too —
    the feeding/gather logic is layout-agnostic, not a 2-process special
    case."""
    results = _launch_workers(tmp_path, nproc=4, local_devices=2,
                              timeout=1200)
    assert results[0]["process_count"] == 4
    assert results[0]["global_devices"] == 8
    assert all(r["history"] == results[0]["history"] for r in results[1:])
    np.testing.assert_allclose(
        [h["val_loss"] for h in results[0]["history"]],
        [h["val_loss"] for h in single_process_run.history],
        rtol=1e-4, atol=1e-6)
