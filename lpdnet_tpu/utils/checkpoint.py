"""Orbax checkpoint/resume for the full train-state pytree.

Reference: ``torch.save({'epoch','state_dict','optimizer'})`` + ``--resume``
(SURVEY C17). Here the whole TrainState (params, optimizer state, BatchNorm
stats, step) plus the epoch counter checkpoint atomically; restore is exact
(SURVEY §5 failure-recovery row: deterministic data order is keyed by
(epoch, step), so resume reproduces the run).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from lpdnet_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True
            ),
        )

    def save(self, epoch: int, state: TrainState, wait: bool = False) -> None:
        payload = {
            "state": {
                "step": state.step,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
            },
            "epoch": epoch,
        }
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))
        if wait:
            self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, epoch: Optional[int] = None
                ) -> Tuple[TrainState, int]:
        """Restore into the structure of ``state``; returns (state, epoch)."""
        target = {
            "state": {
                "step": state.step,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
            },
            "epoch": 0,
        }
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(target)
        )
        s = restored["state"]
        new_state = state.replace(
            step=s["step"],
            params=s["params"],
            batch_stats=s["batch_stats"],
            opt_state=s["opt_state"],
        )
        return new_state, int(restored["epoch"])

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
