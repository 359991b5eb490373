"""Orbax checkpoint/resume for the full train-state pytree.

Reference: ``torch.save({'epoch','state_dict','optimizer'})`` + ``--resume``
(SURVEY C17). Here the whole TrainState (params, optimizer state, BatchNorm
stats, step) plus the epoch counter checkpoint atomically; restore is exact
(SURVEY §5 failure-recovery row: deterministic data order is keyed by
(epoch, step), so resume reproduces the run).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from lpdnet_tpu.train.state import TrainState


def save_config(cfg, log_dir: str) -> str:
    """Persist the full Config tree as JSON next to the checkpoints so
    evaluation/resume can reconstruct the exact model without re-passing
    flags (the reference relies on the user re-supplying matching CLI
    args)."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, "config.json")
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    return path


def load_config(log_dir: str):
    """Rebuild a Config from ``config.json`` if present, else None."""
    from lpdnet_tpu import configs as C

    path = os.path.join(log_dir, "config.json")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    return C.Config(
        model=C.ModelConfig(
            **{**raw["model"],
               "features": C.FeatureConfig(**raw["model"]["features"])}
        ),
        data=C.DataConfig(**raw["data"]),
        train=C.TrainConfig(
            **{**raw["train"],
               "loss": C.LossConfig(**raw["train"]["loss"]),
               "mining": C.MiningConfig(**raw["train"]["mining"])}
        ),
        eval=C.EvalConfig(**raw["eval"]),
        mesh=C.MeshConfig(**raw["mesh"]),
    )


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
