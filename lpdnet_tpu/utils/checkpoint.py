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
    if "knn_window" not in raw["model"]:
        # Config saved before the Morton-window field existed: letting it
        # inherit the current default (256) would silently evaluate an
        # old checkpoint under approximate-kNN forward semantics it was
        # never trained or audited with. Pin the old exact-scan behavior
        # and say so (ADVICE round 2).
        import warnings

        warnings.warn(
            f"{path} predates ModelConfig.knn_window; pinning "
            "knn_window=None (exact full-scan kNN, the behavior when it "
            "was saved) instead of the current approximate default",
            stacklevel=2,
        )
        raw["model"]["knn_window"] = None
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
    """Orbax-backed manager. Saves are ASYNC (a background thread writes
    while training continues; Orbax registers a key only once the write
    completes, so a crash mid-write falls back to the previous complete
    checkpoint). Keys are arbitrary monotone ints — the loop uses the
    global step, so epoch-end and mid-epoch saves share one sequence."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True
            ),
        )
        self._restored_key: Optional[int] = None

    def save(
        self,
        key: int,
        state: TrainState,
        epoch: int = 0,
        extra: Optional[dict] = None,
        wait: bool = False,
    ) -> None:
        """``extra``: arrays/scalars carried alongside the state (resume
        position, mining cache). Written synchronously as an ``.npz``
        sidecar BEFORE the async Orbax save is triggered, so any key Orbax
        registers as complete has its sidecar on disk; the Orbax payload
        keeps a fixed structure (evaluate/tests restore without knowing
        extra shapes)."""
        key = int(key)
        if key in set(self._mgr.all_steps()):
            # Only ONE collision is legitimate: re-saving the exact key a
            # degenerate resume just restored (state on disk is identical —
            # advance the position sidecar only). Anything else means a
            # fresh run is writing into a log dir that already holds a
            # different run's checkpoints: swallowing that would silently
            # drop the new state while the sidecar advances, corrupting a
            # later resume.
            if key != self._restored_key:
                raise FileExistsError(
                    f"checkpoint key {key} already exists in "
                    f"{self.directory} (from a previous run?); resume it "
                    f"with --resume or use a fresh log_dir"
                )
            if extra is not None:
                self.save_extra_only(key, extra)
            return
        if extra is not None and jax.process_index() == 0:
            # Host-side sidecar: one writer only (Orbax's own multihost
            # logic handles the payload; every process still calls
            # self._mgr.save below — it carries a global barrier).
            import numpy as _np

            _np.savez(self._extra_path(key), **extra)
            self._prune_extras()
        payload = {
            "state": {
                "step": state.step,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
            },
            "epoch": epoch,
        }
        self._mgr.save(key, args=ocp.args.StandardSave(payload))
        if wait:
            self._mgr.wait_until_finished()

    def _extra_path(self, key: int) -> str:
        return os.path.join(self.directory, f"resume_{int(key):010d}.npz")

    def _prune_extras(self, keep: int = 5) -> None:
        import glob

        files = sorted(glob.glob(os.path.join(self.directory, "resume_*.npz")))
        for f in files[:-keep]:
            try:
                os.remove(f)
            except OSError:
                pass

    def save_extra_only(self, key: int, extra: dict) -> None:
        """Overwrite just the position sidecar of an already-saved key
        (e.g. a step save landing on the epoch boundary: the state is
        identical, only the resume position advances)."""
        if jax.process_index() != 0:
            return
        import numpy as _np

        _np.savez(self._extra_path(int(key)), **extra)

    def load_extra(self, key: int) -> Optional[dict]:
        """The sidecar saved with ``key``, or None (e.g. pruned/legacy)."""
        import numpy as _np

        path = self._extra_path(key)
        if not os.path.isfile(path):
            return None
        with _np.load(path) as z:
            return {k: z[k] for k in z.files}

    def latest_key(self) -> Optional[int]:
        return self._mgr.latest_step()

    # Back-compat name (keys were epochs before step-level checkpointing).
    latest_epoch = latest_key

    def restore(self, state: TrainState, key: Optional[int] = None
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
        key = key if key is not None else self._mgr.latest_step()
        if key is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        self._restored_key = int(key)
        restored = self._mgr.restore(
            key, args=ocp.args.StandardRestore(target)
        )
        s = restored["state"]
        new_state = state.replace(
            step=s["step"],
            params=s["params"],
            batch_stats=s["batch_stats"],
            opt_state=s["opt_state"],
        )
        return new_state, int(restored["epoch"])

    def restore_sharded(
        self, state: TrainState, key: Optional[int] = None
    ) -> Tuple[TrainState, int]:
        """Restore into the *sharded device structure* of ``state``.

        For multi-process tensor parallelism: ``state``'s leaves are
        ``jax.Array``s carrying ``NamedSharding``s over a (possibly
        multi-host) mesh; the abstract target hands those shardings to
        Orbax, which reads each process's shards straight from the
        TensorStore payload — the full array never materializes on any
        single host. The on-disk format is identical to the host-numpy
        path, so checkpoints cross-restore between the two (a sharded-TP
        run can be resumed single-process and vice versa).
        """

        def abstract(x):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)

        target = {
            "state": jax.tree_util.tree_map(
                abstract,
                {
                    "step": state.step,
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                },
            ),
            "epoch": 0,
        }
        key = key if key is not None else self._mgr.latest_step()
        if key is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        self._restored_key = int(key)
        restored = self._mgr.restore(
            key, args=ocp.args.StandardRestore(target)
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
