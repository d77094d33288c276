"""Per-process global-array feeding for multi-host training.

The reference trains strictly single-device (`/root/reference/train.py:32`)
— multi-HOST training is a north-star absence row (SURVEY.md §2). In a
multi-process (multi-host) run, ``jax.devices()`` spans every host but each
process can only write to its OWN chips: a plain ``jax.device_put`` of an
epoch tensor would need the whole array on every host anyway, and a
process-0-only feed does not exist in the runtime. The JAX-native contract
is per-process addressable-shard feeding: each process materializes exactly
the index ranges its local devices own and the runtime assembles one global
``jax.Array`` (the same mechanism as
``jax.make_array_from_process_local_data``, expressed through
``jax.make_array_from_callback`` so it is correct for ANY sharding layout —
batch-sharded epochs, row-sharded tables, replicated scalars — without
per-layout slicing arithmetic here).

Every process must hold the same logical host array (all hosts load the
same dataset and compute the same shuffled permutation from the shared
seed — deterministic by construction in ``train_dcn``); what this module
avoids is every host TRANSFERRING the full array to its devices.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["is_multiprocess", "put_global", "put_global_tree", "replicated_host"]


def is_multiprocess() -> bool:
    """True in a ``jax.distributed``-initialized multi-process run."""
    return jax.process_count() > 1


def put_global(host, sharding):
    """One global device array under ``sharding`` from a host array.

    Single-process: a plain ``jax.device_put`` (on the tunneled TPU the
    batched pytree ``device_put`` is the measured fast path — RESULTS.md).
    Multi-process: ``jax.make_array_from_callback`` — the callback receives
    each ADDRESSABLE device's index tuple, so this process slices and
    uploads only the shards its devices own.
    """
    if not is_multiprocess():
        return jax.device_put(host, sharding)
    import numpy as np

    host = np.asarray(host)
    return jax.make_array_from_callback(host.shape, sharding, lambda idx: host[idx])


def put_global_tree(host_tree, sharding_tree):
    """``put_global`` over a matching pytree of arrays and shardings.

    Single-process this is ONE batched ``jax.device_put`` call (one
    dispatch, transfers issued together — load-bearing on the tunneled
    backend where per-call latency dominates bytes).
    """
    if not is_multiprocess():
        return jax.device_put(host_tree, sharding_tree)
    return jax.tree.map(put_global, host_tree, sharding_tree)


def replicated_host(tree, rep_sharding):
    """Host copy of a (possibly non-addressable) sharded pytree.

    ``jax.device_get`` of an array whose shards live on other hosts is an
    error; gathering to a replicated layout first makes every leaf fully
    addressable everywhere. Used by the trainer's checkpoint path in
    multi-process mode (each host then holds the full state and every
    process calls the orbax save — its barriers require all processes —
    while orbax's primary host does the writing). Single-process callers
    should keep using ``device_get`` directly — no gather program needed.
    """
    gathered = _gather_fn(rep_sharding)(tree)
    return jax.device_get(gathered)


@functools.lru_cache(maxsize=8)
def _gather_fn(rep_sharding):
    """One cached jitted identity per replicated sharding: a fresh lambda
    per call would re-trace (and re-compile per pytree shape) on EVERY
    checkpoint save."""
    return jax.jit(lambda t: t, out_shardings=rep_sharding)
