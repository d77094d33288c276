"""Torch oracle: the reference's model + training loop, reimplemented.

This is a from-scratch replica of the reference semantics — architecture per
reference train.py:90-170 (scalar-gate cross layers, BN residual blocks,
⌊√n⌋+1 categorical dims) and training loop per reference train.py:195-253
(DataLoader shuffle, Adam/AdamW, BCEWithLogitsLoss, ReduceLROnPlateau on the
val loss, early-stop patience, best-checkpoint retention, final
LogLoss/AUC/RMSE eval). It exists so the JAX trainer's *quality* claims are
measured against the real reference loop, not asserted structurally:

  * ``benchmarks/parity_train.py`` runs this loop and ``train_dcn`` on the
    identical synthetic split over N seeds and compares the final-metric
    distributions (VERDICT round-1 item 1);
  * ``tests/test_parity_train.py`` runs both with identical initial weights
    and identical batch orders (``perms``) and asserts the val-loss
    trajectories agree step-for-step — training-loop parity, not just
    forward-pass parity.

torch is a dev/test dependency only; nothing on the serve or train hot path
imports this module.
"""

from __future__ import annotations

import copy

import numpy as np
import torch
import torch.nn as nn

from hhrs_tpu.config import ModelConfig, TrainConfig
from hhrs_tpu.models.dcn import ModelDims
from hhrs_tpu.train.metrics import auc_score, rmse_of_probs


class TorchCross(nn.Module):
    """Scalar-gate cross layer: x + x·(wᵀx) + b (reference train.py:90-99)."""

    def __init__(self, d: int):
        super().__init__()
        self.w = nn.Linear(d, 1, bias=False)
        self.b = nn.Parameter(torch.zeros(d))

    def forward(self, x):
        return x + x * self.w(x) + self.b


class TorchRes(nn.Module):
    """Linear→BN→ReLU→Dropout→Linear→BN + identity, ReLU (train.py:102-122)."""

    def __init__(self, h: int, dropout: float = 0.0):
        super().__init__()
        self.l1 = nn.Linear(h, h)
        self.bn1 = nn.BatchNorm1d(h)
        self.drop = nn.Dropout(dropout)
        self.l2 = nn.Linear(h, h)
        self.bn2 = nn.BatchNorm1d(h)

    def forward(self, x):
        h = self.drop(torch.relu(self.bn1(self.l1(x))))
        h = self.bn2(self.l2(h))
        return torch.relu(h + x)


class TorchDCN(nn.Module):
    """DCN-R assembly (reference train.py:125-170)."""

    def __init__(self, dims: ModelDims, cfg: ModelConfig):
        super().__init__()
        self.ue = nn.Embedding(dims.n_users, cfg.emb_dim)
        self.ie = nn.Embedding(dims.n_items, cfg.emb_dim)
        self.ce = nn.ModuleList(
            [nn.Embedding(n, cfg.cat_emb_dim(n)) for _, n in dims.cat_dims]
        )
        d_in = cfg.emb_dim * 2 + sum(cfg.cat_emb_dim(n) for _, n in dims.cat_dims) \
            + dims.n_num_features
        self.deep0 = nn.Linear(d_in, cfg.hidden_dim)
        self.res = nn.ModuleList(
            [TorchRes(cfg.hidden_dim, cfg.dropout) for _ in range(cfg.n_res_blocks)]
        )
        self.cross = nn.ModuleList([TorchCross(d_in) for _ in range(cfg.n_cross_layers)])
        self.final = nn.Linear(cfg.hidden_dim + d_in, 1)

    def forward(self, u, i, c, n):
        embs = [self.ue(u), self.ie(i)] + [e(c[:, k]) for k, e in enumerate(self.ce)]
        x0 = torch.cat(embs + [n], dim=1)
        deep = self.deep0(x0)
        for r in self.res:
            deep = r(deep)
        xc = x0
        for cr in self.cross:
            xc = cr(xc)
        return self.final(torch.cat([deep, xc], dim=1)).squeeze(-1)


def copy_params_to_torch(params: dict, tmodel: TorchDCN) -> None:
    """Copy our param pytree into the torch replica (for matched-init runs)."""

    def t(x):
        # np.array (copy) — torch warns on non-writable zero-copy views
        return torch.from_numpy(np.array(x, dtype=np.float32))

    with torch.no_grad():
        tmodel.ue.weight.copy_(t(params["user_embedding"]))
        tmodel.ie.weight.copy_(t(params["item_embedding"]))
        for k, e in enumerate(tmodel.ce):
            e.weight.copy_(t(params["cat_embeddings"][k]))
        tmodel.deep0.weight.copy_(t(params["initial_deep"]["kernel"]).T)
        tmodel.deep0.bias.copy_(t(params["initial_deep"]["bias"]))
        for k, r in enumerate(tmodel.res):
            bp = params["res_blocks"][k]
            r.l1.weight.copy_(t(bp["layer1"]["kernel"]).T)
            r.l1.bias.copy_(t(bp["layer1"]["bias"]))
            r.l2.weight.copy_(t(bp["layer2"]["kernel"]).T)
            r.l2.bias.copy_(t(bp["layer2"]["bias"]))
            r.bn1.weight.copy_(t(bp["bn1"]["scale"]))
            r.bn1.bias.copy_(t(bp["bn1"]["bias"]))
            r.bn2.weight.copy_(t(bp["bn2"]["scale"]))
            r.bn2.bias.copy_(t(bp["bn2"]["bias"]))
        for l in range(len(tmodel.cross)):
            tmodel.cross[l].w.weight.copy_(t(params["cross"]["w"][l])[None, :])
            tmodel.cross[l].b.copy_(t(params["cross"]["b"][l]))
        tmodel.final.weight.copy_(t(params["final"]["kernel"]).T)
        tmodel.final.bias.copy_(t(params["final"]["bias"]))


def _val_tensors(splits):
    return (
        torch.from_numpy(np.asarray(splits.val_user, np.int64)),
        torch.from_numpy(np.asarray(splits.val_item, np.int64)),
        torch.from_numpy(np.asarray(splits.val_cat, np.int64)),
        torch.from_numpy(np.asarray(splits.val_num, np.float32)),
        torch.from_numpy(np.asarray(splits.val_y, np.float32)),
    )


def catalog_recall_torch(
    model: "TorchDCN",
    splits,
    k: int = 100,
    max_users: int = 512,
    exclude_train: bool = True,
    user_chunk: int = 64,
    seed: int = 0,
) -> float:
    """Catalog-ranking recall@k of a torch DCN-R — the reference stack's
    side of the recall parity measurement (VERDICT r3 item 3).

    Uses the SAME metric harness as the JAX engine
    (train/eval_retrieval.py::catalog_recall_from_scores): identical user
    sample, item table, train-seen masking, and denominator convention —
    only the scoring stack differs.
    """
    from hhrs_tpu.train.eval_retrieval import (
        _item_feature_table,
        catalog_recall_from_scores,
    )

    items, X_cat, X_num = _item_feature_table(splits)
    M = len(items)
    t_item = torch.from_numpy(np.asarray(items, np.int64))
    t_cat = torch.from_numpy(np.asarray(X_cat, np.int64))
    t_num = torch.from_numpy(np.asarray(X_num, np.float32))

    model.eval()

    def score_fn(chunk: np.ndarray) -> np.ndarray:
        with torch.no_grad():
            out = []
            for u in chunk.tolist():
                users = torch.full((M,), int(u), dtype=torch.int64)
                out.append(model(users, t_item, t_cat, t_num).numpy())
        return np.stack(out)

    return catalog_recall_from_scores(
        score_fn, items, splits, k=k, max_users=max_users,
        exclude_train=exclude_train, user_chunk=user_chunk, seed=seed,
    )


def train_reference_loop(
    splits,
    dims: ModelDims,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    perms: list[np.ndarray] | None = None,
    init_params: dict | None = None,
    return_model: bool = False,
) -> dict:
    """The reference training loop (train.py:195-253), faithfully.

    ``perms`` (optional) injects an explicit per-epoch example order instead
    of the DataLoader's shuffle — used by the matched-mechanics parity test
    so both frameworks consume identical batches. ``init_params`` (optional)
    copies our JAX init into the replica for matched-init runs.

    Returns {'history': [per-epoch dicts], 'best_val_loss', 'best_epoch',
    'final_metrics': {...}} shaped like our TrainResult.
    """
    if model_cfg.arch != "dcnr" or model_cfg.cross_variant != "code":
        raise ValueError(
            "the torch oracle implements the reference architecture only "
            f"(arch='dcnr', cross_variant='code'); got arch={model_cfg.arch!r}, "
            f"cross_variant={model_cfg.cross_variant!r}"
        )

    torch.manual_seed(train_cfg.seed)
    model = TorchDCN(dims, model_cfg)
    if init_params is not None:
        copy_params_to_torch(init_params, model)

    if train_cfg.optimizer.lower() == "adamw":
        opt = torch.optim.AdamW(model.parameters(), lr=train_cfg.lr,
                                weight_decay=train_cfg.weight_decay)
    else:
        opt = torch.optim.Adam(model.parameters(), lr=train_cfg.lr,
                               weight_decay=train_cfg.weight_decay)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=train_cfg.lr_plateau_factor,
        patience=train_cfg.lr_plateau_patience,
    )
    loss_fn = nn.BCEWithLogitsLoss()

    tu = torch.from_numpy(np.asarray(splits.train_user, np.int64))
    ti = torch.from_numpy(np.asarray(splits.train_item, np.int64))
    tc = torch.from_numpy(np.asarray(splits.train_cat, np.int64))
    tn = torch.from_numpy(np.asarray(splits.train_num, np.float32))
    ty = torch.from_numpy(np.asarray(splits.train_y, np.float32))
    vu, vi, vc, vn, vy = _val_tensors(splits)

    n_train = tu.shape[0]
    B = train_cfg.batch_size
    gen = torch.Generator().manual_seed(train_cfg.seed)

    history = []
    best_val = float("inf")
    best_epoch = -1
    best_state = None
    epochs_no_improve = 0

    for epoch in range(train_cfg.n_epochs):
        if perms is not None:
            perm = np.asarray(perms[epoch])
        else:
            perm = torch.randperm(n_train, generator=gen).numpy()
        n_steps = n_train // B if train_cfg.drop_remainder else -(-n_train // B)
        model.train()
        losses = []
        for s in range(n_steps):
            idx = torch.from_numpy(perm[s * B:(s + 1) * B].astype(np.int64))
            opt.zero_grad()
            logits = model(tu[idx], ti[idx], tc[idx], tn[idx])
            loss = loss_fn(logits, ty[idx])
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))

        model.eval()
        with torch.no_grad():
            val_loss = float(loss_fn(model(vu, vi, vc, vn), vy))
        sched.step(val_loss)
        history.append({
            "epoch": epoch,
            "train_loss": float(np.mean(losses)),
            "val_loss": val_loss,
            "lr": opt.param_groups[0]["lr"],
        })

        if val_loss < best_val:
            best_val = val_loss
            best_epoch = epoch
            epochs_no_improve = 0
            best_state = copy.deepcopy(model.state_dict())
        else:
            epochs_no_improve += 1
        if epochs_no_improve >= train_cfg.early_stop_patience:
            break

    if best_state is not None:
        model.load_state_dict(best_state)
    model.eval()
    with torch.no_grad():
        logits = model(vu, vi, vc, vn).numpy()
    y = np.asarray(splits.val_y, np.float32)
    # torch BCEWithLogitsLoss mean, recomputed in numpy for exactness
    z = logits.astype(np.float64)
    logloss = float(np.mean(np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))))
    out = {
        "history": history,
        "best_val_loss": best_val,
        "best_epoch": best_epoch,
        "final_metrics": {
            "val_logloss": logloss,
            "val_auc": auc_score(y, logits),
            "val_rmse": rmse_of_probs(y, logits),
        },
    }
    if return_model:
        out["model"] = model  # best-checkpoint weights, eval mode
    return out
