"""Device-mesh construction.

One mesh, two logical axes:

  * ``data``  — batch parallelism (gradients psum-reduced across it);
  * ``model`` — table parallelism (embedding rows sharded across it; the
    retrieval item-embedding matrix shards over the same axis).

On a real pod slice the mesh should be built with
``jax.experimental.mesh_utils.create_device_mesh`` so the axes ride ICI
neighbor links; on the virtual CPU backend (tests, driver dryrun) a plain
reshape of ``jax.devices()`` is used.
"""

from __future__ import annotations

import logging

import numpy as np
import jax
from jax.sharding import Mesh

log = logging.getLogger(__name__)


def mesh_shape_for(n_devices: int, model_axis: int | None = None) -> tuple[int, int]:
    """Pick a (data, model) grid for ``n_devices``.

    Strategy: give the model axis the requested size (largest power-of-two
    divisor ≤ requested, so it always divides), rest to data. Defaults to
    model=2 when n_devices ≥ 4 — enough to exercise row-sharded tables —
    else a pure-DP mesh.
    """
    if model_axis is None:
        model_axis = 2 if n_devices >= 4 else 1
    m = 1
    while m * 2 <= model_axis and n_devices % (m * 2) == 0:
        m *= 2
    return n_devices // m, m


def make_mesh(
    n_data: int = -1,
    n_model: int = 1,
    axis_names: tuple = ("data", "model"),
    devices=None,
    hardware_order: bool | str = "auto",
) -> Mesh:
    """Build a 2-D mesh. ``n_data=-1`` → use every device not on model.

    ``hardware_order`` lays the grid out with
    ``mesh_utils.create_device_mesh`` so neighboring mesh coordinates map
    to ICI-adjacent chips — the right choice on a real slice: the model
    axis's all-to-all/psum then rides nearest-neighbor links. The default
    ``"auto"`` uses it on TPU backends and falls back to a plain
    deterministic reshape elsewhere (virtual CPU tests) or if the topology
    helper rejects the shape.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_model < 1 or (n_data < 1 and n_data != -1):
        raise ValueError(f"mesh axes must be >= 1, got {n_data}x{n_model}")
    if n_data == -1:
        if n % n_model != 0:
            raise ValueError(f"{n} devices not divisible by model axis {n_model}")
        n_data = n // n_model
    if n_data * n_model > n:
        raise ValueError(f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, have {n}")
    if n_data * n_model < n:
        log.warning("mesh %dx%d uses %d of %d available devices — the rest idle",
                    n_data, n_model, n_data * n_model, n)
    if hardware_order == "auto":
        hardware_order = devices[0].platform == "tpu"
    if hardware_order:
        from jax.experimental import mesh_utils

        try:
            grid = mesh_utils.create_device_mesh(
                (n_data, n_model), devices=devices[: n_data * n_model]
            )
        except Exception as e:  # odd shapes the topology helper rejects
            log.warning("create_device_mesh failed (%s); plain reshape layout", e)
            grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    else:
        grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


def pad_to_shards(n: int, mesh: Mesh | None) -> int:
    """Smallest multiple of the mesh's device count that is ≥ ``n``.

    Explicit ``device_put`` shardings require even shards, so every
    row-sharded serve-side axis is padded up to this length (``n`` itself
    when there is no mesh). The CALLER decides what the pad rows contain —
    inert review rows, dump kNN slots, NEG_INF-scored items — because that
    is where exactness lives; this helper only owns the arithmetic.
    """
    m = int(mesh.devices.size) if mesh is not None else 1
    return -(-n // m) * m


def row_shardings(mesh: Mesh):
    """The serve-side NamedSharding quartet for row-sharding over ALL mesh
    axes: ``(rows, rows2d, cols2d, replicated)`` —

      * ``rows``   — ``P(axes)``: 1-D array sharded on its only axis;
      * ``rows2d`` — ``P(axes, None)``: 2-D sharded on rows;
      * ``cols2d`` — ``P(None, axes)``: 2-D sharded on columns;
      * ``replicated`` — ``P()``: every device holds a full copy.

    Shared by the candidate generator and the ranking engine so their
    program-space item axes stay consistent by construction.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    return (
        NamedSharding(mesh, P(axes)),
        NamedSharding(mesh, P(axes, None)),
        NamedSharding(mesh, P(None, axes)),
        NamedSharding(mesh, P()),
    )


def mesh_from_spec(spec: str, **kwargs) -> Mesh:
    """Parse a CLI ``--mesh`` spec — ``DATA`` or ``DATAxMODEL`` (e.g. ``8``,
    ``4x2``) — into a mesh. Shared by the train/serve/hpo CLIs.

    Raises ``ValueError`` on a malformed spec (CLIs surface it as a usage
    error) and propagates ``make_mesh``'s device-count errors.
    """
    import re

    m = re.fullmatch(r"(\d+)(?:[xX](\d+))?", spec.strip())
    if not m or int(m.group(1)) < 1 or int(m.group(2) or 1) < 1:
        raise ValueError(f"--mesh must be DATA or DATAxMODEL (e.g. 4x2), got {spec!r}")
    return make_mesh(int(m.group(1)), int(m.group(2) or 1), **kwargs)
