"""Multi-host initialization (SURVEY.md §5: distributed comm backend).

The reference has no distributed story at all. Here: a thin, failure-aware
wrapper over ``jax.distributed.initialize`` — the entry point that turns N
TPU hosts into one ``jax.devices()`` view, after which every sharding in
``hhrs_tpu.parallel`` works unchanged (XLA routes collectives over ICI
within a slice and DCN across slices).

Environment autodetection covers Cloud TPU pods (JAX reads the TPU
metadata itself — call with no args) and explicit coordinator setups
(COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env, the jax.distributed
contract). ``initialize_distributed`` is a no-op for single-process runs,
and failures surface as a clear RuntimeError after the timeout instead of
a hang — the failure-detection behavior SURVEY.md §5 calls for.
"""

from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    timeout_s: int = 300,
) -> bool:
    """Initialize multi-host JAX; returns True if distributed mode is on.

    Single-process (no coordinator configured anywhere): returns False
    without touching jax.distributed.
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    on_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if coordinator_address is None and not on_tpu_pod:
        if num_processes is not None or process_id is not None:
            # Partial config is the dangerous case: this host would train
            # ALONE and write artifacts while its peers block on the
            # coordinator until timeout — exactly the silent divergence
            # this wrapper exists to prevent. Fail loudly instead.
            raise RuntimeError(
                "NUM_PROCESSES/PROCESS_ID configured "
                f"(n={num_processes}, id={process_id}) but no "
                "COORDINATOR_ADDRESS — refusing to fall back to a "
                "single-process run on a multi-host launch"
            )
        log.info("single-process run (no coordinator configured)")
        return False

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=timeout_s,
        )
    except Exception as e:  # noqa: BLE001 — convert hangs/timeouts to a clear failure
        raise RuntimeError(
            f"jax.distributed.initialize failed after {timeout_s}s "
            f"(coordinator={coordinator_address}, n={num_processes}, id={process_id}): {e}"
        ) from e

    log.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True
