"""A/B: per-epoch validation cadence (train.eval_every) in the FULL tuned
trainer loop.

At the tuned flagship (B=32768) an epoch of a 500k-row dataset is only
~15 train steps (~29ms of device time), while the per-epoch full-val
eval + the D2H scalar fetch cost ~60ms+ on this tunneled backend — the
loop spends more time validating than training. ``train.eval_every=N``
(config.py) keeps step numerics identical and evaluates every Nth epoch
(plateau/early-stop/best-snapshot decisions then happen at that cadence;
the reference evaluates every epoch, train.py:228-238, which stays the
default).

Protocol (RESULTS.md): both variants in ONE process, BOTH orders:

    python benchmarks/eval_every_ab.py es && python benchmarks/eval_every_ab.py se
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_EPOCHS = 11  # 10 post-compile epochs; eval_every=5 evals at 4, 9, 10


def main(argv=None) -> int:
    order = (argv or sys.argv[1:] or ["es"])[0]
    if not (order and set(order) <= {"e", "s"}):
        sys.exit(f"usage: eval_every_ab.py [es|se] (got {order!r})")

    import dataclasses

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

    mcfg = ModelConfig(emb_dim=16, hidden_dim=128, n_cross_layers=2,
                       n_res_blocks=1, dropout=0.6, compute_dtype="bfloat16",
                       storage_dtype="bfloat16")
    tuned = TrainConfig(lr=1e-3, batch_size=32768, n_epochs=N_EPOCHS,
                        rng_impl="rbg", early_stop_patience=100)
    configs = {
        "e": ("eval_every=1 (reference cadence)", tuned),
        "s": ("eval_every=5 (sparse validation)",
              dataclasses.replace(tuned, eval_every=5)),
    }
    for c in order:
        name, tcfg = configs[c]
        r = train_dcn(splits, dims, mcfg, tcfg)
        print("%s: %.3fM ex/s (median epoch) — %d evals over %d epochs"
              % (name, r.examples_per_s / 1e6, len(r.history), N_EPOCHS),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
