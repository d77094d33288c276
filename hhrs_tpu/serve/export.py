"""Exported ranker: the trained DCN-R scoring program serialized as a
portable StableHLO artifact (``jax.export``).

The reference can only deploy by shipping its Python model classes plus a
``state_dict`` and reconstructing the module at load time (reference
main.py:256-266 rebuilds DCN_RecSys from five joblib/npy files). The
TPU-native equivalent is compile-once, serve-anywhere: ``export_ranker``
lowers the eval-mode forward pass — weights embedded as constants, batch
dimension symbolic — to a versioned StableHLO module that any XLA runtime
(TPU server, CPU box, a non-Python serving stack) can execute with ZERO
model code. Round-trip parity with ``apply_dcn`` holds to f32
fusion-order noise (same math and constants, separately compiled
programs — tests/test_export_ranker.py).

What it is NOT: the full two-stage request program. Candidate generation
and MMR close over the live review universe, which changes with every
data refresh — freezing it into an immutable artifact would be wrong by
design. The exported unit is the model half (stage 2), the piece with
expensive-to-ship Python dependencies; retrieval state stays data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RANKER_FILE = "ranker.stablehlo"


def export_ranker(bundle, *, platforms: tuple = ("tpu", "cpu")) -> bytes:
    """Serialize the bundle's eval-mode scoring program.

    The batch dimension is symbolic: one exported module serves any
    candidate count. ``platforms`` lowers one module executable on every
    listed backend (cross-platform lowering — no TPU needed to EXPORT
    for TPU).
    """
    from hhrs_tpu.models.dcn import apply_dcn

    # jnp leaves, not numpy: a numpy table indexed by a tracer would try a
    # concrete __array__ conversion at trace time
    params = jax.tree.map(jnp.asarray, bundle.params)
    bn_state = jax.tree.map(jnp.asarray, bundle.bn_state)
    cfg = bundle.model_cfg
    dims = bundle.dims

    def score(user_ids, item_ids, cat_features, num_features):
        logits, _ = apply_dcn(params, bn_state, user_ids, item_ids,
                              cat_features, num_features, cfg=cfg, train=False)
        return logits

    (b,) = jax.export.symbolic_shape("b")
    specs = (
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b, len(dims.cat_dims)), jnp.int32),
        jax.ShapeDtypeStruct((b, dims.n_num_features), jnp.float32),
    )
    exported = jax.export.export(jax.jit(score), platforms=list(platforms))(*specs)
    return exported.serialize()


def save_ranker(bundle, path: str, *, platforms: tuple = ("tpu", "cpu")) -> str:
    data = export_ranker(bundle, platforms=platforms)
    with open(path, "wb") as f:
        f.write(data)
    return path


class ExportedRanker:
    """Deserialized scoring program. ``__call__`` matches the exported
    signature and returns logits; no hhrs_tpu model code runs."""

    def __init__(self, exported):
        self._exported = exported
        # Exported.call is designed to be embedded under jit: invoked bare
        # it re-traces the whole module EVERY call (measured 6.5ms vs
        # 0.83ms for the same program at B=4096 on the chip — pure host
        # retrace overhead, r4). One jit wrapper compiles once per concrete
        # batch shape and then runs at native speed.
        self._call = jax.jit(exported.call)

    @classmethod
    def load(cls, path: str) -> "ExportedRanker":
        with open(path, "rb") as f:
            data = f.read()
        return cls(jax.export.deserialize(bytearray(data)))

    @property
    def platforms(self) -> tuple:
        return tuple(self._exported.platforms)

    def __call__(self, user_ids, item_ids, cat_features, num_features):
        # jnp.asarray handles lists/numpy/jax inputs uniformly; routing
        # through np.asarray would device_get a jax-array input to host
        # and re-upload it EVERY call (a full tunnel round trip, r4).
        return self._call(
            jnp.asarray(user_ids, jnp.int32),
            jnp.asarray(item_ids, jnp.int32),
            jnp.asarray(cat_features, jnp.int32),
            jnp.asarray(num_features, jnp.float32),
        )


def main(argv=None) -> int:
    """``python -m hhrs_tpu.serve.export --artifacts DIR [--out F]``"""
    import argparse
    import logging

    from hhrs_tpu.db.registry import resolve_artifacts_dir
    from hhrs_tpu.train.artifacts import load_artifact_bundle
    from hhrs_tpu.utils.logging import setup_logging

    setup_logging()
    log = logging.getLogger("hhrs_tpu.serve.export")
    p = argparse.ArgumentParser(
        description="Export the trained ranker as a portable StableHLO module")
    p.add_argument("--artifacts", required=True,
                   help="artifact dir, or 'registry:<db>' for the active model")
    p.add_argument("--out", default=None,
                   help=f"output path (default <artifacts>/{RANKER_FILE})")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets (default tpu,cpu)")
    args = p.parse_args(argv)

    import os

    adir = resolve_artifacts_dir(args.artifacts)
    out = args.out or os.path.join(adir, RANKER_FILE)
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    bundle = load_artifact_bundle(adir)
    save_ranker(bundle, out, platforms=platforms)
    size = os.path.getsize(out)
    log.info("exported %s ranker (%s) -> %s (%.1f KB)",
             bundle.model_cfg.arch, "/".join(platforms), out, size / 1024)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
