"""Profiling hooks: the jax.profiler trace context writes trace artifacts,
StepTimer summarizes, and the train CLI --profile-dir flag works e2e."""

import glob
import os
import time

import jax
import jax.numpy as jnp

from hhrs_tpu.utils.profiling import StepTimer, hlo_dump_env, trace


def test_trace_writes_artifacts(tmp_path):
    d = str(tmp_path / "tr")
    with trace(d):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace files written"


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        t.start()
        time.sleep(0.002)
        t.stop()
    s = t.summary(examples_per_step=100)
    assert s["steps"] == 3
    assert s["mean_ms"] >= 2.0
    assert s["examples_per_s"] > 0
    assert StepTimer().summary() == {"steps": 0}


def test_hlo_dump_env():
    env = hlo_dump_env("/tmp/hlo")
    assert "--xla_dump_to=/tmp/hlo" in env["XLA_FLAGS"]


def test_train_cli_profile_dir(tmp_path):
    from hhrs_tpu.train.cli import main

    prof = str(tmp_path / "prof")
    rc = main([
        "--synthetic", "--data", str(tmp_path / "d"), "--out", str(tmp_path / "a"),
        "--synth-users", "100", "--synth-items", "50", "--synth-reviews", "1200",
        "--epochs", "1", "--profile-dir", prof,
        "train.batch_size=256", "train.eval_batch_size=512",
    ])
    assert rc == 0
    assert glob.glob(os.path.join(prof, "**", "*"), recursive=True)
