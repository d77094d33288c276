"""A/B: vectorized HPO (K trials in one vmapped program) vs the same K
trials run sequentially through train_dcn.

The reference's Optuna study trains trials strictly sequentially
(reference train.py:316) and converges to tiny configs — batch 512
(Documentation.md:194). At B=512 a train step is DISPATCH-bound on an
accelerator: the chip finishes long before the host can issue the next
program, and on this image's tunneled TPU every per-epoch D2H costs a
~25-50ms RTT on top. hpo/vectorized.py folds K same-architecture trials
into one program (lr/wd/dropout as vmapped runtime scalars), so one
dispatch drives K trials and the K per-epoch val fetches collapse into
one.

Fixed work per variant: K trials x E epochs at the reference's best
architecture (emb16 / hidden128 / 2 cross / 1 res / batch 512 — the
shapes the reference study actually converged to), early stop and
pruning disabled so both variants do identical step counts. Metric:
wall-clock for the whole block, plus the steady-state trial-epoch rate
(epochs after the first, compile excluded).

Protocol (RESULTS.md): both variants back-to-back in ONE process, BOTH
orders across processes:

    python benchmarks/vhpo_ab.py vs && python benchmarks/vhpo_ab.py sv
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 8
EPOCHS = 10
ARCH = {"emb_dim": 16, "hidden_dim": 128, "n_cross_layers": 2, "n_res_blocks": 1,
        "batch_size": 512, "optimizer": "adamw"}
# K scalar variants — the spread a TPE round would propose within one arch
SCALARS = [
    (1e-3 * (1.6 ** i), 10.0 ** -(2 + (i % 4)), 0.1 + 0.07 * i) for i in range(K)
]


def setup():
    from hhrs_tpu.config import ModelConfig, TrainConfig
    from hhrs_tpu.data import Preprocessor, add_engineered_features, noise_filter
    from hhrs_tpu.data.synthetic import generate_synthetic_dataset
    from hhrs_tpu.models.dcn import ModelDims
    from hhrs_tpu.utils.logging import enable_compilation_cache

    enable_compilation_cache()
    ds = generate_synthetic_dataset(n_users=3000, n_items=800, n_reviews=40000, seed=5)
    df = add_engineered_features(noise_filter(
        ds.reviews.rename(columns={"guest_id": "user_id", "hotel_id": "item_id"})
    ))
    splits, art = Preprocessor().fit_transform(df)
    dims = ModelDims.from_artifacts(art)
    mcfg = ModelConfig(emb_dim=ARCH["emb_dim"], hidden_dim=ARCH["hidden_dim"],
                       n_cross_layers=ARCH["n_cross_layers"],
                       n_res_blocks=ARCH["n_res_blocks"])
    tcfg = TrainConfig(batch_size=ARCH["batch_size"], optimizer=ARCH["optimizer"],
                       n_epochs=EPOCHS, early_stop_patience=10_000)
    trials = [dict(ARCH, lr=lr, weight_decay=wd, dropout=dr,
                   lr_plateau_patience=10_000, lr_plateau_factor=0.5)
              for lr, wd, dr in SCALARS]
    return splits, dims, mcfg, tcfg, trials


def run_vectorized(splits, dims, mcfg, tcfg, trials):
    from hhrs_tpu.hpo.vectorized import run_group

    t0 = time.perf_counter()
    results = run_group(splits, dims, mcfg, tcfg, trials)
    wall = time.perf_counter() - t0
    rate = results[0].group_examples_per_s  # K x per-lane steady rate
    return wall, rate


def run_sequential(splits, dims, mcfg, tcfg, trials):
    import dataclasses

    from hhrs_tpu.train.trainer import train_dcn

    t0 = time.perf_counter()
    rates = []
    for t in trials:
        m = dataclasses.replace(mcfg, dropout=float(t["dropout"]))
        tc = dataclasses.replace(tcfg, lr=float(t["lr"]),
                                 weight_decay=float(t["weight_decay"]),
                                 lr_plateau_patience=int(t["lr_plateau_patience"]),
                                 lr_plateau_factor=float(t["lr_plateau_factor"]))
        r = train_dcn(splits, dims, m, tc)
        rates.append(r.examples_per_s)
    wall = time.perf_counter() - t0
    # sequential "fleet rate": one trial's steady data rate (trials don't
    # overlap, so the fleet processes examples at the single-trial rate)
    return wall, sum(rates) / len(rates)


if __name__ == "__main__":
    order = sys.argv[1] if len(sys.argv) > 1 else "vs"
    ctx = setup()
    for c in order:
        if c == "v":
            wall, rate = run_vectorized(*ctx)
            print("vectorized: %5.1fs wall for %dx%d trial-epochs  (steady %.2fM ex/s aggregate)"
                  % (wall, K, EPOCHS, rate / 1e6))
        else:
            wall, rate = run_sequential(*ctx)
            print("sequential: %5.1fs wall for %dx%d trial-epochs  (steady %.2fM ex/s single-trial)"
                  % (wall, K, EPOCHS, rate / 1e6))
