"""Full retrieval benchmark: descriptor sweeps + all-run-pair recall.

Reference: ``evaluate()`` / ``evaluate_model()`` / ``get_latent_vectors()``
in ``evaluate.py`` (SURVEY C18, call stack §3.2): embed every database and
query run, then for every ordered pair of distinct runs compute recall@1..25,
top-1% recall, and top-1 similarity; average across pairs and append a text
report to the output file.

Descriptor extraction is the batched jitted embed function (batch-sharded
over the mesh when one is given); tail batches are padded to keep a single
compiled shape.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from lpdnet_tpu.eval.recall import get_recall
from lpdnet_tpu.utils.pipeline import pad_batch, sweep_embed
from lpdnet_tpu.utils.wire import encode_points


def get_latent_vectors(
    embed_fn: Callable,
    variables,
    entries: Dict[int, Dict],
    loader: Callable[[str], np.ndarray],
    batch_size: int = 64,
    batch_loader: Optional[Callable[[List[str]], np.ndarray]] = None,
    embed_many_fn: Optional[Callable] = None,
    chunk: int = 0,
    transfer_dtype: str = "float32",
    local_rows: Optional[slice] = None,
) -> np.ndarray:
    """Descriptors for one run's submaps, in index order (padded tail).

    ``batch_loader`` (e.g. the native C++ threaded reader,
    ``lpdnet_tpu.data.native_loader``) loads each file batch in parallel;
    without it, files load one by one through ``loader``.

    ``embed_many_fn`` (from ``make_embed_many_fn``) with ``chunk`` > 1
    chains that many batches per device dispatch (fast-DMA hosts only —
    see ``EvalConfig.sweep_chunk``). ``transfer_dtype`` of 'float16' or
    'int16' (fixed-point, ~3e-5 exact — utils/wire.py) halves upload
    volume; the embed fns decode back to f32 before any compute.

    ``local_rows`` (multi-process runs — ``parallel/multiprocess.py``):
    this process loads and uploads only its slice of each padded batch;
    ``embed_fn`` must then be a ``make_mp_sweep_embed_fn`` wrapper. The
    returned descriptors are the full (replicated) sweep either way.
    """
    indices = sorted(entries.keys())

    def batches():
        for start in range(0, len(indices), batch_size):
            ids = indices[start : start + batch_size]
            names = [entries[i]["query"] for i in ids]
            if local_rows is not None:
                pad = batch_size - len(names)
                names = (names + [names[-1]] * pad)[local_rows]
            if batch_loader is not None:
                pts = batch_loader(names)
            else:
                pts = np.stack([loader(n) for n in names])
            # strict on multi-process sweeps: the wire dtype is baked into
            # the shared SPMD program and must not vary per process with
            # the data (utils/wire.py).
            yield encode_points(
                pad_batch(pts, batch_size if local_rows is None
                          else len(names)), transfer_dtype,
                strict=local_rows is not None,
            ), len(ids)

    nbatches = -(-len(indices) // batch_size)
    return sweep_embed(
        embed_fn, embed_many_fn, variables, batches(), nbatches, chunk
    )


def evaluate_model(
    embed_fn: Callable,
    variables,
    database_sets: Sequence[Dict[int, Dict]],
    query_sets: Sequence[Dict[int, Dict]],
    loader: Callable[[str], np.ndarray],
    batch_size: int = 64,
    num_neighbors: int = 25,
    batch_loader: Optional[Callable[[List[str]], np.ndarray]] = None,
    embed_many_fn: Optional[Callable] = None,
    chunk: int = 0,
    transfer_dtype: str = "float32",
    local_rows: Optional[slice] = None,
    return_vectors: bool = False,
) -> Dict[str, object]:
    """Run the full benchmark; returns averaged metrics.

    ``query_sets[n][i][m]`` holds the true-positive database indices of
    query ``i`` (run ``n``) in database run ``m`` (reference pickle layout,
    SURVEY C9).  ``return_vectors`` adds the per-run descriptor matrices
    to the result (fidelity audits compare them across aggregation
    modes — scripts/world_audit.py).
    """
    database_vectors = [
        get_latent_vectors(
            embed_fn, variables, s, loader, batch_size, batch_loader,
            embed_many_fn, chunk, transfer_dtype, local_rows,
        )
        for s in database_sets
    ]
    query_vectors = [
        get_latent_vectors(
            embed_fn, variables, s, loader, batch_size, batch_loader,
            embed_many_fn, chunk, transfer_dtype, local_rows,
        )
        for s in query_sets
    ]

    # Dispatch every pair's kNN retrieval before syncing any of them: the
    # dispatches queue on the device and the host round-trips overlap
    # (retrieval is RTT-bound on tunneled hosts, not compute-bound).
    # Each run's descriptor matrix uploads ONCE (Oxford has ~44 runs =
    # ~1900 ordered pairs; re-uploading per pair would move ~1 GB), and
    # each pair's indices start their device-to-host copy at dispatch so
    # the scoring loop's np.asarray finds them already on host.
    import jax

    from lpdnet_tpu.eval.recall import knn_retrieve

    db_dev = [jax.device_put(np.asarray(v)) for v in database_vectors]
    q_dev = [jax.device_put(np.asarray(v)) for v in query_vectors]
    pairs = []
    for m in range(len(database_sets)):
        for n in range(len(query_sets)):
            if m == n:
                continue
            k = min(num_neighbors, database_vectors[m].shape[0])
            idx, _ = knn_retrieve(db_dev[m], q_dev[n], k)
            try:
                idx.copy_to_host_async()
            except AttributeError:
                pass
            pairs.append((m, n, idx))

    recalls = []
    one_percents = []
    similarities: List[float] = []
    for m, n, idx in pairs:
        q_entries = query_sets[n]
        tps = [q_entries[i].get(m, []) for i in sorted(q_entries.keys())]
        res = get_recall(
            database_vectors[m], query_vectors[n], tps, num_neighbors,
            precomputed_idx=idx,
        )
        if res["num_evaluated"] == 0:
            continue
        recalls.append(res["recall"])
        one_percents.append(res["one_percent_recall"])
        similarities.extend(res["top1_similarity"])

    ave_recall = (
        np.mean(recalls, axis=0) if recalls else np.zeros(num_neighbors)
    )
    out: Dict[str, object] = {
        "ave_recall": ave_recall,
        "ave_one_percent_recall": float(np.mean(one_percents)) if one_percents else 0.0,
        "average_similarity": float(np.mean(similarities)) if similarities else 0.0,
        "num_pairs": len(recalls),
    }
    if return_vectors:
        out["database_vectors"] = [np.asarray(v) for v in database_vectors]
        out["query_vectors"] = [np.asarray(v) for v in query_vectors]
    return out


def format_results(results: Dict[str, object]) -> str:
    """The reference's appended-text report layout (SURVEY C18)."""
    lines = [
        "Average Recall @N:",
        str(np.asarray(results["ave_recall"])),
        "",
        "Average Similarity:",
        str(results["average_similarity"]),
        "",
        "Average Top 1% Recall:",
        str(results["ave_one_percent_recall"]),
        "",
    ]
    return "\n".join(lines)


def report_path(log_dir: str, output_file: str, prefix: str = "") -> str:
    """Where a recall report lands: ``eval.output_file`` is log_dir-relative
    (the reference's ``cfg.OUTPUT_FILE`` semantics), but an absolute path is
    honored as-is — previously it was string-concatenated under log_dir,
    silently nesting the report. A per-set ``prefix`` (``--all_sets``)
    applies to the basename either way."""
    if os.path.isabs(output_file):
        d, b = os.path.split(output_file)
        return os.path.join(d, prefix + b)
    d, b = os.path.split(output_file)
    return os.path.join(log_dir, d, prefix + b)


def write_results(results: Dict[str, object], output_file: str) -> None:
    """Append the reference's text report AND a machine-readable JSONL twin
    (``<output_file>.jsonl``) — one JSON object per eval run, so recall
    curves diff/plot without parsing the text layout (SURVEY §5 metrics
    row)."""
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
    with open(output_file, "a") as f:
        f.write(format_results(results))
        f.write("\n")
    record = {
        "ave_recall": np.asarray(results["ave_recall"]).tolist(),
        "ave_one_percent_recall": results["ave_one_percent_recall"],
        "average_similarity": results["average_similarity"],
        "num_pairs": results["num_pairs"],
    }
    with open(output_file + ".jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
