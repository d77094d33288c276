"""A/B: lane reclamation and pruner choice in vectorized HPO (VERDICT r3
item 4: "aggressive pruning + no lane reclamation could easily
underperform sequential ASHA" — measure it).

Fixed TRIAL BUDGET (N trials asked, one shared architecture — the
reference-best shapes — so no variant pays extra XLA compiles), real
pruning decisions, real TPE proposals. Variants, selectable as order
letters:

  s  sequential ASHA        — train_dcn per trial, ASHA pruning
  m  vectorized K, median   — the r3 shipped default (no reclamation)
  a  vectorized K, ASHA     — aggressive pruning, dead lanes ride along
  r  vectorized K, ASHA + --reclaim-lanes — dead lanes refill immediately

Each variant runs its own fresh Study (same sampler seed). Pruning alters
which trials complete, so the comparable metric is USEFUL work per
wall-clock: completed trials/min and useful trial-epochs/s (an epoch of a
trial that was eventually told counts as useful; dormant-lane epochs are
the waste reclamation removes).

Protocol (RESULTS.md): every variant back-to-back in ONE process, both
orders across processes:

    python benchmarks/vhpo_reclaim_ab.py smar && python benchmarks/vhpo_reclaim_ab.py rams
"""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_TRIALS = 24
K = 8
EPOCHS = 8
ARCH = {"emb_dim": 16, "hidden_dim": 128, "n_cross_layers": 2, "n_res_blocks": 1,
        "batch_size": 512, "optimizer": "adamw"}


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
    mcfg = ModelConfig(**{k: ARCH[k] for k in
                          ("emb_dim", "hidden_dim", "n_cross_layers", "n_res_blocks")})
    tcfg = TrainConfig(batch_size=ARCH["batch_size"], optimizer=ARCH["optimizer"],
                       n_epochs=EPOCHS)
    return splits, dims, mcfg, tcfg


def make_study(pruner_kind: str):
    from hhrs_tpu.hpo.pruner import MedianPruner, SuccessiveHalvingPruner
    from hhrs_tpu.hpo.study import Study

    pruner = (SuccessiveHalvingPruner(min_resource=1, reduction_factor=3)
              if pruner_kind == "asha" else MedianPruner())
    return Study(journal_path=None, pruner=pruner, seed=7)


def make_report(trial):
    def report_fn(epoch, val_loss):
        trial.report(val_loss, epoch)
        return trial.should_prune()
    return report_fn


def summarize(study, wall):
    completed = [t for t in study.trials if t["state"] == "complete"]
    pruned = [t for t in study.trials if t["state"] == "pruned"]
    useful_epochs = sum(len(t.get("intermediates", {})) for t in study.trials)
    best = min((t["value"] for t in completed), default=float("nan"))
    return {
        "wall_s": round(wall, 1),
        "completed": len(completed),
        "pruned": len(pruned),
        "best": round(best, 5),
        "completed_per_min": round(60 * len(completed) / wall, 2),
        "useful_trial_epochs_per_s": round(useful_epochs / wall, 2),
    }


def run_sequential_asha(splits, dims, mcfg, tcfg):
    from hhrs_tpu.hpo.space import reference_search_space
    from hhrs_tpu.train.trainer import train_dcn

    study = make_study("asha")
    space = reference_search_space()
    t0 = time.perf_counter()
    while len(study.trials) < N_TRIALS:
        t = study.ask(space, 1, fixed=ARCH)[0]
        m = dataclasses.replace(mcfg, dropout=float(t.params["dropout"]))
        tc = dataclasses.replace(
            tcfg, lr=float(t.params["lr"]),
            weight_decay=float(t.params["weight_decay"]),
            lr_plateau_patience=int(t.params["lr_plateau_patience"]),
            lr_plateau_factor=float(t.params["lr_plateau_factor"]))
        r = train_dcn(splits, dims, m, tc, report_fn=make_report(t))
        study.tell(t, "pruned" if r.pruned else "complete",
                   None if r.pruned else r.best_val_loss)
    return summarize(study, time.perf_counter() - t0)


def run_vectorized(splits, dims, mcfg, tcfg, pruner_kind, reclaim):
    from hhrs_tpu.hpo.space import reference_search_space
    from hhrs_tpu.hpo.vectorized import run_group

    study = make_study(pruner_kind)
    space = reference_search_space()
    t0 = time.perf_counter()
    asked_total = 0
    while asked_total < N_TRIALS:
        k = min(K, N_TRIALS - asked_total)
        asked = study.ask(space, k, fixed=ARCH)
        asked_total += k
        all_members = list(asked)

        refill_fn = None
        if reclaim:
            def refill_fn():
                nonlocal asked_total
                if asked_total >= N_TRIALS:
                    return None
                t = study.ask(space, 1, fixed=ARCH)[0]
                asked_total += 1
                all_members.append(t)
                return t.params, make_report(t)

        # dropout is a per-lane VMAPPED scalar read from each trial's params
        # (hpo/vectorized.VMAPPED_KEYS) — mcfg.dropout never reaches the
        # compiled program
        results = run_group(
            splits, dims, mcfg, tcfg, [t.params for t in asked],
            report_fns=[make_report(t) for t in asked], refill_fn=refill_fn)
        for t, r in zip(all_members, results):
            study.tell(t, "pruned" if r.pruned else "complete",
                       None if r.pruned else r.best_val_loss)
    return summarize(study, time.perf_counter() - t0)


VARIANTS = {
    "s": ("sequential ASHA", lambda c: run_sequential_asha(*c)),
    "m": ("vectorized K=%d median" % K, lambda c: run_vectorized(*c, "median", False)),
    "a": ("vectorized K=%d ASHA" % K, lambda c: run_vectorized(*c, "asha", False)),
    "r": ("vectorized K=%d ASHA+reclaim" % K, lambda c: run_vectorized(*c, "asha", True)),
}

if __name__ == "__main__":
    order = sys.argv[1] if len(sys.argv) > 1 else "smar"
    ctx = setup()
    for ch in order:
        name, fn = VARIANTS[ch]
        out = fn(ctx)
        print(f"{name:32s} {out}")
