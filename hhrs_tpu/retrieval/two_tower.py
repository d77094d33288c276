"""Two-tower learned retriever — a second model family, beyond the reference.

The reference's candidate expansion reuses the RANKER's item-embedding
table through a kNN index (`/root/reference/main.py:268-270`, queried at
`:200`): retrieval quality is whatever BCE ranking training happened to
give those vectors. The standard production upgrade is a retrieval-trained
two-tower model (user tower · item tower, in-batch sampled-softmax): the
towers are optimized for exactly the task stage 1 performs — surfacing the
user's next positive out of the whole catalog.

TPU-first shape: both towers are small MLPs over embedding lookups, the
in-batch softmax is ONE [B, B] matmul on the MXU, and the whole train step
jits with the same zero-H2D loop mechanics as the DCN trainer (resident
dataset, per-epoch perm upload, device-carried step counter).

Positives: rows with ``was_booked == 1`` — the same label the ranker
trains on, so no extra data contract. The item tower consumes the item id
PLUS its categorical/numerical features, so cold items with few
interactions still get usable vectors from their features.

Opt-in end to end: training runs via ``python -m
hhrs_tpu.retrieval.two_tower``; the exported ``retrieval_embeddings.npy``
(internal-item-id row space, L2-normalized) replaces the ranker's item
table for the serve-side similarity/expansion surfaces only when the
operator passes ``--retrieval-embeddings`` (serve/cli.py) — the default
serve path stays reference-exact.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.ops.nn import embedding_init, linear_apply, linear_init

log = logging.getLogger(__name__)

RETRIEVAL_EMB = "retrieval_embeddings.npy"


@dataclass
class TwoTowerConfig:
    emb_dim: int = 32          # id-embedding width (both towers)
    hidden_dim: int = 64       # tower MLP hidden width
    out_dim: int = 32          # shared retrieval space width
    # Softer than the CV-contrastive 0.07 convention: swept on the dense
    # synthetic regime (T 0.07/0.1/0.2/0.35) — 0.2 maximized catalog
    # recall@100 (RESULTS.md r5); sharp temperatures overfit the noisy
    # booking signal.
    temperature: float = 0.2
    lr: float = 1e-3
    weight_decay: float = 1e-5
    batch_size: int = 1024     # in-batch negatives: B-1 negatives/positive
    n_epochs: int = 50         # ~the sweep's recall plateau; 120 overfits
    seed: int = 42


@dataclass
class TwoTowerResult:
    params: dict
    history: list = field(default_factory=list)
    final_recall_at_100: float = 0.0
    examples_per_s: float = 0.0


def init_two_tower(rng, dims: ModelDims, cfg: TwoTowerConfig) -> dict:
    ks = jax.random.split(rng, 8)
    cat_tables = [
        embedding_init(k, n, int(np.floor(np.sqrt(n))) + 1)
        for k, (_, n) in zip(jax.random.split(ks[2], max(len(dims.cat_dims), 1)),
                             dims.cat_dims)
    ]
    item_in = (cfg.emb_dim + sum(t.shape[1] for t in cat_tables)
               + dims.n_num_features)
    return {
        "user_embedding": embedding_init(ks[0], dims.n_users, cfg.emb_dim),
        "item_embedding": embedding_init(ks[1], dims.n_items, cfg.emb_dim),
        "cat_embeddings": cat_tables,
        "user_l1": linear_init(ks[3], cfg.emb_dim, cfg.hidden_dim),
        "user_l2": linear_init(ks[4], cfg.hidden_dim, cfg.out_dim),
        "item_l1": linear_init(ks[5], item_in, cfg.hidden_dim),
        "item_l2": linear_init(ks[6], cfg.hidden_dim, cfg.out_dim),
    }


def _l2norm(x, eps=1e-12):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def user_tower(params, user_ids):
    """[B] int32 → [B, out_dim] L2-normalized user vectors."""
    h = params["user_embedding"][user_ids]
    h = jax.nn.relu(linear_apply(params["user_l1"], h))
    return _l2norm(linear_apply(params["user_l2"], h))


def item_tower(params, item_ids, cat, num):
    """[M] ids + [M, C] cat + [M, F] num → [M, out_dim] normalized vectors."""
    parts = [params["item_embedding"][item_ids]]
    parts += [tab[cat[:, i]] for i, tab in enumerate(params["cat_embeddings"])]
    parts.append(num)
    h = jnp.concatenate(parts, axis=1)
    h = jax.nn.relu(linear_apply(params["item_l1"], h))
    return _l2norm(linear_apply(params["item_l2"], h))


def in_batch_softmax_loss(params, batch, temperature: float, log_q=None):
    """Contrastive in-batch sampled softmax: each positive pair's item
    competes against the other B-1 items in the batch (one [B, B] MXU
    matmul). Duplicate items inside a batch are masked out of each other's
    negative sets (a duplicate is a FALSE negative — same target item).

    ``log_q`` ([n_items] log sampling frequency): the logQ correction
    (sampled-softmax bias correction, Yi et al. 2019). In-batch negatives
    are drawn proportionally to item popularity, so WITHOUT the
    correction popular items are over-penalized as negatives and the
    model unlearns the popularity component of the signal — measured
    here: training DEGRADED catalog recall below the untrained model
    until the correction was added (RESULTS.md r5)."""
    u = user_tower(params, batch["user"])
    v = item_tower(params, batch["item"], batch["cat"], batch["num"])
    logits = (u @ v.T) / temperature  # [B, B]
    if log_q is not None:
        logits = logits - log_q[batch["item"]][None, :]
    same = batch["item"][:, None] == batch["item"][None, :]  # duplicates
    eye = jnp.eye(logits.shape[0], dtype=bool)
    logits = jnp.where(same & ~eye, -jnp.inf, logits)
    return -jnp.mean(jnp.diagonal(jax.nn.log_softmax(logits, axis=1)))


def train_two_tower(splits, dims: ModelDims, cfg: TwoTowerConfig,
                    eval_recall: bool = True) -> TwoTowerResult:
    """Train on the booked positives with the DCN trainer's loop mechanics
    (resident data, one perm upload/epoch, device-carried counter)."""
    import optax

    pos = np.asarray(splits.train_y) == 1.0
    n_pos = int(pos.sum())
    B = min(cfg.batch_size, n_pos)
    if B < 2:
        raise ValueError(f"need >=2 positive rows to form in-batch negatives, got {n_pos}")
    data = {
        "user": jnp.asarray(np.asarray(splits.train_user)[pos], jnp.int32),
        "item": jnp.asarray(np.asarray(splits.train_item)[pos], jnp.int32),
        "cat": jnp.asarray(np.asarray(splits.train_cat)[pos], jnp.int32),
        "num": jnp.asarray(np.asarray(splits.train_num)[pos], jnp.float32),
    }

    params = init_two_tower(jax.random.PRNGKey(cfg.seed), dims, cfg)
    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    opt = tx.init(params)

    # logQ correction table: empirical positive-frequency per item
    counts = np.bincount(np.asarray(splits.train_item)[pos],
                         minlength=dims.n_items).astype(np.float32)
    log_q = jnp.asarray(np.log(counts / n_pos + 1e-9))

    steps = max(n_pos // B, 1)
    perm_len = steps * B

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt, perm, s):
        idx = jax.lax.dynamic_slice_in_dim(perm, s * B, B)
        batch = jax.tree.map(lambda x: x[idx], data)
        loss, g = jax.value_and_grad(in_batch_softmax_loss)(
            params, batch, cfg.temperature, log_q)
        up, opt = tx.update(g, opt, params)
        return jax.tree.map(lambda a, u: a + u, params, up), opt, loss, s + 1

    result = TwoTowerResult(params=params)
    shuffle = np.random.default_rng(cfg.seed)
    epoch_times = []
    for epoch in range(cfg.n_epochs):
        t0 = time.perf_counter()
        perm = shuffle.permutation(n_pos)
        if perm_len > n_pos:
            perm = np.resize(perm, perm_len)
        perm = jnp.asarray(perm[:perm_len], jnp.int32)
        s = jnp.asarray(0, jnp.int32)
        losses = []
        for _ in range(steps):
            params, opt, loss, s = step(params, opt, perm, s)
            losses.append(loss)
        mean_loss = float(jax.device_get(jnp.mean(jnp.stack(losses))))
        result.history.append({"epoch": epoch, "train_loss": mean_loss})
        log.info("two-tower epoch %d: in-batch softmax loss %.4f", epoch, mean_loss)
        if epoch > 0:
            epoch_times.append(time.perf_counter() - t0)
    result.params = params
    if epoch_times:
        import statistics

        result.examples_per_s = steps * B / max(statistics.median(epoch_times), 1e-9)

    if eval_recall:
        result.final_recall_at_100 = catalog_recall(params, splits, k=100)
    return result


def catalog_recall(params, splits, k: int = 100, max_users: int = 512) -> float:
    """Two-tower retrieval recall@k through the SAME scorer-agnostic metric
    harness the DCN parity work uses (train/eval_retrieval.py), so numbers
    are comparable across model families."""
    from hhrs_tpu.train.eval_retrieval import (
        _item_feature_table, catalog_recall_from_scores)

    items, cat_tab, num_tab = _item_feature_table(splits)
    V = np.asarray(item_vectors(params, items, cat_tab, num_tab))

    @jax.jit
    def users_mat(uids):
        return user_tower(params, uids)

    def score_fn(user_chunk: np.ndarray) -> np.ndarray:
        U = np.asarray(users_mat(jnp.asarray(user_chunk, jnp.int32)))
        return U @ V.T

    return catalog_recall_from_scores(score_fn, items, splits, k=k,
                                      max_users=max_users)


def item_vectors(params, item_ids, cat, num) -> jnp.ndarray:
    """Jitted canonical item vectors for export/serve substitution."""
    return jax.jit(item_tower)(params, jnp.asarray(item_ids, jnp.int32),
                               jnp.asarray(cat, jnp.int32),
                               jnp.asarray(num, jnp.float32))


def export_retrieval_embeddings(out_dir: str, params, splits, dims: ModelDims) -> str:
    """Write retrieval_embeddings.npy: one L2-normalized vector per
    INTERNAL item id (the ranker artifact's item_embeddings row space, so
    the serve engine can substitute it 1:1). Items never seen in the
    splits keep their id-embedding-only vector (features zero)."""
    import os

    from hhrs_tpu.train.eval_retrieval import _item_feature_table

    items, cat_tab, num_tab = _item_feature_table(splits)
    n_cat = cat_tab.shape[1] if cat_tab.ndim == 2 else len(dims.cat_dims)
    full_cat = np.zeros((dims.n_items, n_cat), np.int32)
    full_num = np.zeros((dims.n_items, dims.n_num_features), np.float32)
    full_cat[items] = cat_tab
    full_num[items] = num_tab
    V = np.asarray(item_vectors(params, np.arange(dims.n_items, dtype=np.int32),
                                full_cat, full_num), np.float32)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, RETRIEVAL_EMB)
    np.save(path, V)
    return path


def main(argv=None) -> int:
    """CLI: train the retriever and export serve-substitutable vectors.

    python -m hhrs_tpu.retrieval.two_tower --synthetic --data DIR --out DIR
    """
    import argparse

    from hhrs_tpu.utils.logging import enable_compilation_cache, setup_logging

    setup_logging()
    p = argparse.ArgumentParser(description="Train the two-tower retriever")
    p.add_argument("--data", default="data")
    p.add_argument("--out", default="artifacts")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synth-users", type=int, default=2000)
    p.add_argument("--synth-items", type=int, default=500)
    p.add_argument("--synth-reviews", type=int, default=40000)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--emb-dim", type=int, default=None)
    args = p.parse_args(argv)
    enable_compilation_cache()

    from hhrs_tpu.config import build_config
    from hhrs_tpu.train.cli import build_dataset

    cfg_all = build_config([], log=log)
    splits, art = build_dataset(args, cfg_all)
    dims = ModelDims.from_artifacts(art)

    cfg = TwoTowerConfig()
    if args.epochs is not None:
        cfg = dataclasses.replace(cfg, n_epochs=args.epochs)
    if args.batch_size is not None:
        cfg = dataclasses.replace(cfg, batch_size=args.batch_size)
    if args.emb_dim is not None:
        cfg = dataclasses.replace(cfg, emb_dim=args.emb_dim)

    r = train_two_tower(splits, dims, cfg)
    log.info("two-tower catalog recall@100: %.4f (throughput %.0f ex/s)",
             r.final_recall_at_100, r.examples_per_s)
    path = export_retrieval_embeddings(args.out, r.params, splits, dims)
    log.info("retrieval embeddings exported to %s "
             "(serve with --retrieval-embeddings %s)", path, path)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
