"""Orbax checkpoint/resume for training state.

The reference's only checkpointing is per-trial ``torch.save`` of the best
state dict (reference train.py:243-245) — a crash mid-sweep loses the
in-flight trial and the training loop has no resume at all. Here the FULL
loop state checkpoints every epoch — params, BN state, optimizer moments,
the best-so-far snapshot, the jax PRNG key, plus host-side loop metadata
(epoch counter, history, plateau-scheduler state, the numpy shuffle-rng
bit-generator state) — so ``train_dcn(checkpoint_dir=...)`` resumes
bit-exactly from the last completed epoch after a kill (fault-injection
test: tests/test_checkpoint.py).
"""

from __future__ import annotations

import logging
import os

import jax
import orbax.checkpoint as ocp

log = logging.getLogger(__name__)


class TrainCheckpointer:
    """Thin CheckpointManager wrapper: array state + JSON metadata per epoch."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def latest_epoch(self) -> int | None:
        return self._mngr.latest_step()

    def save(self, epoch: int, state, meta: dict) -> None:
        self._mngr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
        )

    def restore(self, epoch: int, abstract_state):
        """abstract_state: a pytree with the target structure (e.g. freshly
        initialized state) — restored arrays overlay it."""
        out = self._mngr.restore(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return out["state"], out["meta"]

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()
