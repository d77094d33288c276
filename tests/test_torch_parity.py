"""Cross-framework parity: our jnp DCN-R must produce the reference
architecture's exact outputs when given identical weights.

A torch replica of the reference model (architecture per reference
train.py:90-170: scalar-gate cross layers, BN residual blocks, ⌊√n⌋+1
categorical dims) is built fresh here, our params are copied in, and
logits/losses/BN updates are compared in both eval and train mode. This is
the SURVEY.md §4 'port-exact oracle' tier — it guards every semantic the
AUC parity target depends on (BN momentum/eps and biased/unbiased variance
split, init-independent forward math, BCE reduction).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from hhrs_tpu.compat.torch_ref import TorchCross, TorchDCN, TorchRes, copy_params_to_torch
from hhrs_tpu.config import ModelConfig
from hhrs_tpu.models.dcn import ModelDims, apply_dcn, init_dcn
from hhrs_tpu.train.metrics import bce_with_logits

DIMS = ModelDims(n_users=60, n_items=45, cat_dims=(("city", 7), ("hotel_type", 5)), n_num_features=11)
CFG = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=2, n_res_blocks=2, dropout=0.0)


@pytest.fixture  # function-scoped: torch BN mutates running stats in place
def setup():
    params, state = init_dcn(jax.random.PRNGKey(7), DIMS, CFG)
    tmodel = TorchDCN(DIMS, CFG)
    copy_params_to_torch(params, tmodel)
    B = 128
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    batch = dict(
        user=jax.random.randint(ks[0], (B,), 0, DIMS.n_users),
        item=jax.random.randint(ks[1], (B,), 0, DIMS.n_items),
        cat=jnp.stack([jax.random.randint(ks[2], (B,), 0, 7),
                       jax.random.randint(ks[2], (B,), 0, 5)], axis=1),
        num=jax.random.normal(ks[3], (B, 11)),
        y=jax.random.bernoulli(jax.random.PRNGKey(5), 0.5, (B,)).astype(jnp.float32),
    )
    tb = dict(
        u=torch.from_numpy(np.array(batch["user"])).long(),
        i=torch.from_numpy(np.array(batch["item"])).long(),
        c=torch.from_numpy(np.array(batch["cat"])).long(),
        n=torch.from_numpy(np.array(batch["num"], dtype=np.float32)),
        y=torch.from_numpy(np.array(batch["y"], dtype=np.float32)),
    )
    return params, state, tmodel, batch, tb


def test_eval_logits_match(setup):
    params, state, tmodel, batch, tb = setup
    ours, _ = apply_dcn(params, state, batch["user"], batch["item"], batch["cat"],
                        batch["num"], cfg=CFG, train=False)
    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(tb["u"], tb["i"], tb["c"], tb["n"]).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-5)


def test_train_mode_logits_and_bn_updates_match(setup):
    params, state, tmodel, batch, tb = setup
    ours, new_state = apply_dcn(params, state, batch["user"], batch["item"], batch["cat"],
                                batch["num"], cfg=CFG, train=True, rng=None)
    tmodel.train()
    theirs = tmodel(tb["u"], tb["i"], tb["c"], tb["n"]).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-5)

    # BatchNorm running-stat updates (momentum 0.1, unbiased var) match.
    for k, r in enumerate(tmodel.res):
        np.testing.assert_allclose(
            np.asarray(new_state["res_blocks"][k]["bn1"]["mean"]),
            r.bn1.running_mean.numpy(), rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(new_state["res_blocks"][k]["bn1"]["var"]),
            r.bn1.running_var.numpy(), rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(new_state["res_blocks"][k]["bn2"]["var"]),
            r.bn2.running_var.numpy(), rtol=1e-4, atol=1e-5,
        )


def test_bce_loss_matches(setup):
    params, state, tmodel, batch, tb = setup
    ours, _ = apply_dcn(params, state, batch["user"], batch["item"], batch["cat"],
                        batch["num"], cfg=CFG, train=False)
    loss_ours = float(bce_with_logits(ours, batch["y"]))
    tmodel.eval()
    with torch.no_grad():
        loss_theirs = float(nn.BCEWithLogitsLoss()(
            tmodel(tb["u"], tb["i"], tb["c"], tb["n"]), tb["y"]))
    assert loss_ours == pytest.approx(loss_theirs, rel=1e-4)


def test_init_distributions_match_torch_defaults():
    """Init ranges mirror torch defaults: U(±1/√fan_in) linear, N(0,1) emb."""
    params, _ = init_dcn(jax.random.PRNGKey(0), DIMS, CFG)
    k = np.asarray(params["initial_deep"]["kernel"])
    bound = 1.0 / np.sqrt(k.shape[0])
    assert np.abs(k).max() <= bound + 1e-7
    emb = np.asarray(params["user_embedding"])
    assert 0.8 < emb.std() < 1.2

@pytest.mark.parametrize("arch", ["cross_only", "deep_only"])
def test_ablation_arch_matches_torch(arch):
    """Ablation variants also compute the reference subnetworks exactly:
    cross_only = cross stack → head; deep_only = deep tower → head."""
    cfg = ModelConfig(emb_dim=8, hidden_dim=32, n_cross_layers=2, n_res_blocks=1,
                      dropout=0.0, arch=arch)
    params, state = init_dcn(jax.random.PRNGKey(3), DIMS, cfg)

    class TorchVariant(nn.Module):
        def __init__(self):
            super().__init__()
            self.ue = nn.Embedding(DIMS.n_users, cfg.emb_dim)
            self.ie = nn.Embedding(DIMS.n_items, cfg.emb_dim)
            self.ce = nn.ModuleList(
                [nn.Embedding(n, cfg.cat_emb_dim(n)) for _, n in DIMS.cat_dims]
            )
            d_in = cfg.emb_dim * 2 + sum(cfg.cat_emb_dim(n) for _, n in DIMS.cat_dims) \
                + DIMS.n_num_features
            if arch == "deep_only":
                self.deep0 = nn.Linear(d_in, cfg.hidden_dim)
                self.res = nn.ModuleList([TorchRes(cfg.hidden_dim)])
                self.final = nn.Linear(cfg.hidden_dim, 1)
            else:
                self.cross = nn.ModuleList([TorchCross(d_in) for _ in range(2)])
                self.final = nn.Linear(d_in, 1)

        def forward(self, u, i, c, n):
            embs = [self.ue(u), self.ie(i)] + [e(c[:, k]) for k, e in enumerate(self.ce)]
            x0 = torch.cat(embs + [n], dim=1)
            if arch == "deep_only":
                h = self.deep0(x0)
                for r in self.res:
                    h = r(h)
                return self.final(h).squeeze(-1)
            xc = x0
            for cr in self.cross:
                xc = cr(xc)
            return self.final(xc).squeeze(-1)

    tmodel = TorchVariant()
    t = lambda x: torch.from_numpy(np.array(x, dtype=np.float32))
    with torch.no_grad():
        tmodel.ue.weight.copy_(t(params["user_embedding"]))
        tmodel.ie.weight.copy_(t(params["item_embedding"]))
        for k, e in enumerate(tmodel.ce):
            e.weight.copy_(t(params["cat_embeddings"][k]))
        if arch == "deep_only":
            tmodel.deep0.weight.copy_(t(params["initial_deep"]["kernel"]).T)
            tmodel.deep0.bias.copy_(t(params["initial_deep"]["bias"]))
            bp = params["res_blocks"][0]
            r = tmodel.res[0]
            r.l1.weight.copy_(t(bp["layer1"]["kernel"]).T); r.l1.bias.copy_(t(bp["layer1"]["bias"]))
            r.l2.weight.copy_(t(bp["layer2"]["kernel"]).T); r.l2.bias.copy_(t(bp["layer2"]["bias"]))
            r.bn1.weight.copy_(t(bp["bn1"]["scale"])); r.bn1.bias.copy_(t(bp["bn1"]["bias"]))
            r.bn2.weight.copy_(t(bp["bn2"]["scale"])); r.bn2.bias.copy_(t(bp["bn2"]["bias"]))
        else:
            for l in range(2):
                tmodel.cross[l].w.weight.copy_(t(params["cross"]["w"][l])[None, :])
                tmodel.cross[l].b.copy_(t(params["cross"]["b"][l]))
        tmodel.final.weight.copy_(t(params["final"]["kernel"]).T)
        tmodel.final.bias.copy_(t(params["final"]["bias"]))

    B = 64
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    u = jax.random.randint(ks[0], (B,), 0, DIMS.n_users)
    i = jax.random.randint(ks[1], (B,), 0, DIMS.n_items)
    c = jnp.stack([jax.random.randint(ks[2], (B,), 0, 7),
                   jax.random.randint(ks[2], (B,), 0, 5)], axis=1)
    n = jax.random.normal(ks[3], (B, 11))

    ours, _ = apply_dcn(params, state, u, i, c, n, cfg=cfg, train=False)
    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(
            torch.from_numpy(np.array(u)).long(), torch.from_numpy(np.array(i)).long(),
            torch.from_numpy(np.array(c)).long(),
            torch.from_numpy(np.array(n, dtype=np.float32)),
        ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-5)
