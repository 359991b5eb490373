"""Multi-process (multi-host) runtime: jax.distributed bootstrap +
process-local batch feeding + primary-process guards.

The reference is strictly single-process (``nn.DataParallel`` — SURVEY
C20/C21); everything else in this framework already scales over a
``jax.sharding.Mesh``, but real TPU pods beyond one host — and every
multislice topology ``make_multislice_mesh`` targets — run one process per
host, each seeing only its local chips. Three things change, and this
module owns all of them:

1. **Bootstrap** (:func:`initialize`): ``jax.distributed.initialize`` must
   run before the backend exists; afterwards ``jax.devices()`` is global
   and the same mesh-building code as single-process works unchanged.
2. **Batch feeding** (:func:`shard_batch_mp`,
   :func:`make_mp_sweep_embed_fn`): a process can only upload to its own
   devices, so global host batches become ``jax.Array``s via
   ``jax.make_array_from_process_local_data`` — each process feeds the
   rows its devices own. Jitted programs, shardings, and collectives are
   untouched: GSPMD sees the same global program either way.
3. **Side effects** (:func:`is_primary`): checkpoints, metrics JSONL, and
   eval reports are written by process 0 only (every process computes the
   same replicated values; writing them N times would race on shared
   filesystems).

Determinism story: tuple assembly stays keyed by (seed, epoch, batch) on
every process, so all processes assemble identical global batches and
slice their own rows — the loss trajectory is bit-comparable to the
single-process run over the same global mesh (tested in
``tests/test_multiprocess.py`` with a 2-process x 4-device CPU cluster).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or auto-detect) the distributed runtime. Call before any other
    JAX use — the CLIs do this first thing when given ``--num_processes``.

    With all arguments None this is TPU-pod auto-detection (the launcher
    environment supplies coordination); explicit arguments are for CPU/GPU
    clusters and the tests' subprocess fleets.
    """
    import jax

    if coordinator_address is None and num_processes is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def add_cli_args(parser) -> None:
    """The multi-process flags shared by train.py / evaluate.py."""
    parser.add_argument(
        "--distributed", action="store_true",
        help="join a multi-process runtime with auto-detection "
             "(TPU pod/multislice launchers supply coordination)",
    )
    parser.add_argument(
        "--coordinator", default=None,
        help="coordinator address host:port (explicit multi-process init, "
             "e.g. CPU/GPU clusters or tests)",
    )
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)


def initialize_from_args(args) -> bool:
    """Bootstrap from CLI flags; returns True if distributed init ran.
    Must be called before any other JAX use."""
    if getattr(args, "num_processes", None):
        initialize(args.coordinator, args.num_processes, args.process_id)
        return True
    if (getattr(args, "coordinator", None) is not None
            or getattr(args, "process_id", None) is not None):
        # Refuse to run N independent single-process jobs into one shared
        # log_dir because one flag was forgotten — that corrupts
        # checkpoints/sidecars far into training instead of failing here.
        raise ValueError(
            "--coordinator/--process_id require --num_processes "
            "(explicit multi-process init needs all three)"
        )
    if getattr(args, "distributed", False):
        initialize()
        return True
    return False


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns side effects (checkpoints, logs)."""
    import jax

    return jax.process_index() == 0


_slice_cache: Dict = {}


def process_local_slice(mesh, axis: str, global_rows: int) -> slice:
    """The rows of a ``P(axis)``-sharded batch owned by this process.

    The mesh must give this process a contiguous block of positions along
    ``axis`` (true for meshes built from ``jax.devices()`` order, whose
    ids group by process; ``make_multislice_mesh`` rows group by slice =
    process group, which is also contiguous) and ``axis`` must divide the
    batch — both are asserted loudly rather than mis-fed silently.

    Memoized per (mesh, axis, rows): the device-grid scan is constant for
    a given mesh but sits on the per-batch feeding path (``shard_batch_mp``
    calls this for every tuple leaf of every training step).
    """
    import jax

    cache_key = (mesh, axis, global_rows)
    cached = _slice_cache.get(cache_key)
    if cached is not None:
        return cached

    axis_size = mesh.shape[axis]
    if global_rows % axis_size:
        raise ValueError(
            f"batch rows {global_rows} not divisible by mesh axis "
            f"{axis!r} ({axis_size})"
        )
    block = global_rows // axis_size
    axis_idx = list(mesh.axis_names).index(axis)
    grid = mesh.devices
    pid = jax.process_index()
    positions = sorted(
        {
            idx[axis_idx]
            for idx in np.ndindex(grid.shape)
            if grid[idx].process_index == pid
        }
    )
    if not positions:
        raise ValueError(
            f"process {pid} owns no devices in mesh {mesh.shape}"
        )
    if positions != list(range(positions[0], positions[-1] + 1)):
        raise ValueError(
            f"process {pid}'s devices are not contiguous along {axis!r} "
            f"(positions {positions}); build the mesh in jax.devices() "
            "order"
        )
    result = slice(positions[0] * block, (positions[-1] + 1) * block)
    _slice_cache[cache_key] = result
    return result


def shard_batch_mp(batch: Any, mesh, axis: str = "data") -> Any:
    """Multi-process ``shard_batch``: every process holds the full host
    batch (assembly is deterministic and duplicated — cheap next to the
    device step) and uploads ONLY its own rows; the result is the same
    global batch-sharded ``jax.Array`` the single-process path produces."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        sl = process_local_slice(mesh, axis, x.shape[0])
        return jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(x[sl]), x.shape
        )

    return jax.tree_util.tree_map(put, batch)


def replicate_mp(tree: Any, mesh) -> Any:
    """Multi-process ``replicate``: identical host values on every process
    (same init seed / same restored checkpoint) become fully-replicated
    global arrays."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, x.shape
        )

    return jax.tree_util.tree_map(put, tree)


def make_mp_sweep_embed_fn(embed_fn, mesh, axis: str, batch_size: int):
    """Wrap a jitted embed fn for multi-process descriptor sweeps: the
    caller (eval / mining, via their ``local_rows`` parameter) feeds only
    this process's rows of each padded batch; the wrapper assembles the
    global array and calls the unchanged collective program. Descriptors
    come back replicated, so every process sees the full sweep result."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def mp_embed(variables, local_pts):
        arr = jax.make_array_from_process_local_data(
            sharding, local_pts, (batch_size, *local_pts.shape[1:])
        )
        return embed_fn(variables, arr)

    return mp_embed


def sweep_local_rows(mesh, axis: str, batch_size: int) -> Optional[slice]:
    """The ``local_rows`` slice eval/mining sweeps should load, or None
    in single-process runs (load everything)."""
    import jax

    if jax.process_count() == 1:
        return None
    return process_local_slice(mesh, axis, batch_size)
