"""Artifact export/load — the train→serve contract.

The reference ships five files (reference train.py:389-397):
final_dcn_model.pth, artifacts.gz, item_embeddings.npy, best_params.gz,
model_dims.gz. Here the contract is a single directory with an explicit
manifest:

  manifest.json        version, model config (the 'best params'), model dims,
                       final metrics, file inventory
  params.msgpack       model params + batch-norm state (flax msgpack codec)
  preproc.json         vocab maps, encoders, scaler stats, medians
  item_embeddings.npy  the trained item table (drives similarity retrieval,
                       reference main.py:259,268-270)
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass

import jax
import numpy as np
from flax import serialization

from hhrs_tpu.config import ModelConfig
from hhrs_tpu.data.preprocess import PreprocessArtifacts
from hhrs_tpu.models.dcn import ModelDims

MANIFEST = "manifest.json"
PARAMS = "params.msgpack"
PREPROC = "preproc.json"
ITEM_EMB = "item_embeddings.npy"

FORMAT_VERSION = 1


@dataclass
class ArtifactBundle:
    params: dict
    bn_state: dict
    model_cfg: ModelConfig
    dims: ModelDims
    preproc: PreprocessArtifacts
    item_embeddings: np.ndarray
    metrics: dict


def export_artifacts(
    out_dir: str,
    params: dict,
    bn_state: dict,
    model_cfg: ModelConfig,
    dims: ModelDims,
    preproc: PreprocessArtifacts,
    metrics: dict | None = None,
    train_cfg=None,
) -> None:
    """``train_cfg`` (optional TrainConfig) is recorded in the manifest as
    provenance — which optimizer/batch/rng_impl produced these weights —
    and is never read back by the serve path (model_config alone defines
    the serving program).

    Multi-process safe: on a multi-host run the params are row-sharded
    across processes — ``device_get`` of a partially-addressable array is
    an error — so the state gathers to replicated host copies first
    (every process joins the collective) and only process 0 writes files.
    """
    state = {"params": params, "bn_state": bn_state}
    import jax as _jax

    if _jax.process_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hhrs_tpu.parallel.multiprocess import replicated_host

        leaf = _jax.tree_util.tree_leaves(params)[0]
        mesh = getattr(leaf.sharding, "mesh", None)
        if mesh is not None:
            host = replicated_host(state, NamedSharding(mesh, P()))
        else:
            host = jax.device_get(state)
        if _jax.process_index() != 0:
            return  # primary writes; peers joined the gather above
    else:
        host = jax.device_get(state)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, PARAMS), "wb") as f:
        f.write(serialization.to_bytes(host))
    preproc.save(os.path.join(out_dir, PREPROC))
    np.save(
        os.path.join(out_dir, ITEM_EMB),
        np.asarray(host["params"]["item_embedding"], dtype=np.float32),
    )
    manifest = {
        "format_version": FORMAT_VERSION,
        "model_config": dataclasses.asdict(model_cfg),
        "model_dims": dims.to_dict(),
        "metrics": metrics or {},
        "files": [PARAMS, PREPROC, ITEM_EMB],
    }
    if train_cfg is not None:
        manifest["train_config"] = dataclasses.asdict(train_cfg)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)


def load_artifact_bundle(out_dir: str) -> ArtifactBundle:
    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(f"artifact format {manifest['format_version']} != {FORMAT_VERSION}")

    mc = manifest["model_config"]
    model_cfg = ModelConfig(**{k: v for k, v in mc.items() if k in ModelConfig.__dataclass_fields__})
    dims = ModelDims.from_dict(manifest["model_dims"])
    preproc = PreprocessArtifacts.load(os.path.join(out_dir, PREPROC))

    # Pytree skeleton via eval_shape (structure + shapes only — a real
    # init_dcn would sample every embedding table just to be overwritten,
    # seconds of waste at production table sizes).
    from hhrs_tpu.models.dcn import init_dcn

    shapes = jax.eval_shape(lambda: init_dcn(jax.random.PRNGKey(0), dims, model_cfg))
    skeleton = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype),
        {"params": shapes[0], "bn_state": shapes[1]},
    )
    with open(os.path.join(out_dir, PARAMS), "rb") as f:
        restored = serialization.from_bytes(skeleton, f.read())

    item_embeddings = np.load(os.path.join(out_dir, ITEM_EMB))
    return ArtifactBundle(
        params=jax.device_put(restored["params"]),
        bn_state=jax.device_put(restored["bn_state"]),
        model_cfg=model_cfg,
        dims=dims,
        preproc=preproc,
        item_embeddings=item_embeddings,
        metrics=manifest.get("metrics", {}),
    )
