"""One process of an N-process virtual-CPU-mesh training run.

Launched by tests/test_multiprocess.py (NOT a pytest file):

    python tests/mp_worker.py <pid> <nproc> <port> <out.json> [ckpt_dir] [n_epochs]

Each process initializes ``jax.distributed`` against a localhost
coordinator, gets ``local_devices`` virtual CPU devices from its own
XLA_FLAGS, builds the GLOBAL (data, model) mesh over all processes'
devices, loads the identical synthetic dataset, and runs the full
``train_dcn`` loop. The loss history + final metrics are dumped to
``out.json`` (every process writes its own copy — the test asserts they
agree bit-for-bit, i.e. the SPMD control flow never diverged).

The dataset/config constants are shared with the test so the in-test
single-process 8-device reference run trains the same problem.
"""

from __future__ import annotations

import json
import os
import signal
import sys

# Shared problem definition (imported by the test for the reference run).
DATA_KW = dict(n_users=250, n_items=70, n_reviews=5000, seed=21)
MODEL_KW = dict(emb_dim=8, hidden_dim=32, n_cross_layers=2, n_res_blocks=1,
                dropout=0.3)
TRAIN_KW = dict(batch_size=256, n_epochs=3, seed=7, drop_remainder=False,
                eval_batch_size=512, early_stop_patience=10)
MESH_SHAPE = (4, 2)  # (data, model) over the 8 global devices


def build_problem():
    from hhrs_tpu.config import ModelConfig, TrainConfig
    from hhrs_tpu.data.features import add_engineered_features
    from hhrs_tpu.data.ingest import noise_filter
    from hhrs_tpu.data.preprocess import Preprocessor
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset
    from hhrs_tpu.models.dcn import ModelDims

    ds = generate_synthetic_dataset(**DATA_KW)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id",
                                   "hotel_id": "item_id"})))
    splits, art = Preprocessor().fit_transform(df)
    return (splits, ModelDims.from_artifacts(art), ModelConfig(**MODEL_KW),
            TrainConfig(**TRAIN_KW))


def main() -> None:
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    ckpt_dir = sys.argv[5] if len(sys.argv) > 5 and sys.argv[5] != "-" else None
    n_epochs = int(sys.argv[6]) if len(sys.argv) > 6 else None

    import jax

    from hhrs_tpu.parallel.distributed import initialize_distributed

    assert initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid, timeout_s=120,
    )
    assert jax.process_count() == nproc

    from hhrs_tpu.parallel.mesh import make_mesh
    from hhrs_tpu.train.trainer import train_dcn

    splits, dims, mcfg, tcfg = build_problem()
    if n_epochs is not None:
        import dataclasses

        tcfg = dataclasses.replace(tcfg, n_epochs=n_epochs)
    mesh = make_mesh(*MESH_SHAPE)
    assert len(mesh.devices.flat) == nproc * jax.local_device_count()

    # Fault injection (tests/test_multiprocess.py): MP_DIE_RANK/MP_DIE_AT_EPOCH
    # make that process SIGKILL itself at the end of the given epoch —
    # before the periodic checkpoint save commits — simulating a host
    # dying mid-epoch on a pod slice.
    report_fn = None
    die_rank = os.environ.get("MP_DIE_RANK")
    if die_rank is not None and jax.process_index() == int(die_rank):
        die_epoch = int(os.environ.get("MP_DIE_AT_EPOCH", "1"))

        def report_fn(epoch, val_loss):
            if epoch >= die_epoch:
                os.kill(os.getpid(), signal.SIGKILL)
            return False

    # MP_EXCHANGE=capped runs the production combo: multi-process mesh +
    # skew-bounded explicit exchange (overflow counted per epoch).
    # MP_RESIDENT=1 uses the replicated device-resident dataset
    # (train.mesh_resident_data) instead of epoch streaming.
    if os.environ.get("MP_RESIDENT"):
        import dataclasses as _dc

        tcfg = _dc.replace(tcfg, mesh_resident_data=True)
    exchange = os.environ.get("MP_EXCHANGE") or None
    res = train_dcn(splits, dims, mcfg, tcfg, mesh=mesh,
                    checkpoint_dir=ckpt_dir, report_fn=report_fn,
                    explicit_exchange=exchange,
                    exchange_capacity_factor=float(
                        os.environ.get("MP_EXCHANGE_FACTOR", "1.25")))
    with open(out, "w") as f:
        json.dump({
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": jax.local_device_count(),
            "global_devices": jax.device_count(),
            "history": res.history,
            "final_metrics": res.final_metrics,
            # proof the run really was partially addressable (i.e. this
            # process did NOT hold the whole state/arrays locally)
            "params_fully_addressable": bool(
                res.params["user_embedding"].is_fully_addressable),
        }, f)


if __name__ == "__main__":
    main()
