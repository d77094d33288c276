"""Parallelism layer: device meshes, sharding rules, collectives.

The reference has no distributed machinery at all (SURVEY.md §2 last rows:
no torch.distributed / NCCL / MPI anywhere; single device at reference
train.py:32). This package supplies the TPU-native story from scratch:

  * ``mesh``      — ``jax.sharding.Mesh`` construction over real chips or a
                    virtual CPU device set (tests / dryrun);
  * ``sharding``  — partitioning rules for the DCN-R param pytree:
                    embedding tables row-sharded over the ``model`` axis,
                    dense layers replicated, batch over the ``data`` axis;
  * ``embedding`` — explicit shard_map row-sharded lookups (masked-gather +
                    psum, and the all-to-all ID-exchange variant for
                    multi-host tables);
  * ``trainer``   — the pjit'ed data+model-parallel train step where XLA
                    inserts the psum gradient reduction and the cross-shard
                    BatchNorm statistics automatically.
"""

from hhrs_tpu.parallel.mesh import make_mesh, mesh_shape_for
from hhrs_tpu.parallel.sharding import (
    batch_pspec,
    param_pspecs,
    param_shardings,
    shard_pytree,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "batch_pspec",
    "param_pspecs",
    "param_shardings",
    "shard_pytree",
]
