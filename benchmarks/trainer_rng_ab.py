"""End-to-end trainer A/B: train.rng_impl threefry vs rbg on the
500k-row scale config (the RESULTS.md "trainer loop at scale" setup).

The step-level prng A/B (benchmarks/prng_ab.py) measured the TPU hardware
RBG at +28-30% on the flagship B=32768 step; this harness checks how much
of that survives the FULL production loop at B=4096 — per-epoch shuffled
index uploads, per-epoch full-val eval, plateau bookkeeping — where
dispatch and eval amortize differently.

Protocol (RESULTS.md): both variants in ONE process, BOTH orders across
two invocations; the reported rate is train_dcn's own median per-epoch
steady-state throughput (epochs after the first, robust to the tunnel's
compile stragglers):

    python benchmarks/trainer_rng_ab.py tr && python benchmarks/trainer_rng_ab.py rt
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_EPOCHS = 4  # median over the 3 post-compile epochs


def main(argv=None) -> int:
    order = (argv or sys.argv[1:] or ["tr"])[0]

    from hhrs_tpu.config import ModelConfig, TrainConfig
    from hhrs_tpu.data import add_engineered_features, Preprocessor
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
                       n_res_blocks=1, dropout=0.6, compute_dtype="bfloat16")

    names = {"t": "threefry2x32", "r": "rbg"}
    for c in order:
        impl = names[c]
        tcfg = TrainConfig(lr=1e-3, batch_size=4096, n_epochs=N_EPOCHS,
                           rng_impl=impl)
        r = train_dcn(splits, dims, mcfg, tcfg)
        print("%s: %.3fM ex/s (median epoch, incl. eval)"
              % (impl, r.examples_per_s / 1e6), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
