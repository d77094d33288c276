"""Full-trainer throughput at the 500k-row scale config: the RESULTS.md
baseline setup (B=4096, threefry, f32 activation storage) vs the tuned
throughput stack (B=32768 + train.rng_impl=rbg + model.storage_dtype=
bfloat16 — each knob individually both-orders-validated at the step
level: batch_ab.py, prng_ab.py, storage_ab.py).

This is the end-to-end check that the step-level wins survive the
production loop — per-epoch shuffled index upload, on-device best
snapshot, per-epoch full-val eval, plateau bookkeeping. The reported
rate is train_dcn's own median per-epoch steady-state throughput
(epochs after the first; includes eval).

Protocol (RESULTS.md): both configs in ONE process, BOTH orders:

    python benchmarks/trainer_tuned.py bt && python benchmarks/trainer_tuned.py tb
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_EPOCHS = 4  # median over the 3 post-compile epochs


def main(argv=None) -> int:
    order = (argv or sys.argv[1:] or ["bt"])[0]
    if not (order and set(order) <= {"b", "t"}):
        sys.exit(f"usage: trainer_tuned.py [bt|tb] (got {order!r})")

    from hhrs_tpu.config import ModelConfig, TrainConfig
    from hhrs_tpu.data import Preprocessor, add_engineered_features
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset
    from hhrs_tpu.models.dcn import ModelDims
    from hhrs_tpu.train.trainer import train_dcn
    from hhrs_tpu.utils.logging import enable_compilation_cache

    enable_compilation_cache()
    ds = generate_synthetic_dataset(
        n_users=20_000, n_items=4_000, n_reviews=500_000, seed=11)
    df = add_engineered_features(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"}))
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)

    base_m = ModelConfig(emb_dim=16, hidden_dim=128, n_cross_layers=2,
                         n_res_blocks=1, dropout=0.6, compute_dtype="bfloat16")
    configs = {
        "b": ("baseline (B=4096, threefry, f32 storage)",
              base_m,
              TrainConfig(lr=1e-3, batch_size=4096, n_epochs=N_EPOCHS)),
        "t": ("tuned    (B=32768, rbg, bf16 storage)",
              ModelConfig(**{**base_m.__dict__, "storage_dtype": "bfloat16"}),
              TrainConfig(lr=1e-3, batch_size=32768, n_epochs=N_EPOCHS,
                          rng_impl="rbg")),
    }
    for c in order:
        name, mcfg, tcfg = configs[c]
        r = train_dcn(splits, dims, mcfg, tcfg)
        print("%s: %.3fM ex/s (median epoch, incl. eval)"
              % (name, r.examples_per_s / 1e6), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
