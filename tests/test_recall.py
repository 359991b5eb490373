"""Recall computation vs an sklearn-KDTree transcription of the reference's
``get_recall`` (SURVEY C18)."""

import numpy as np
from sklearn.neighbors import KDTree

from lpdnet_tpu.eval.recall import get_recall, knn_retrieve


def reference_get_recall(db, q, true_positives, num_neighbors=25):
    """Literal transcription of the reference algorithm with sklearn."""
    tree = KDTree(db)
    threshold = max(int(round(len(db) / 100.0)), 1)
    recall = [0.0] * num_neighbors
    one_percent = 0
    sims = []
    num_eval = 0
    k = min(num_neighbors, len(db))
    for i in range(len(q)):
        tp = true_positives[i]
        if len(tp) == 0:
            continue
        num_eval += 1
        _, idx = tree.query(q[i : i + 1], k=k)
        for j in range(k):
            if idx[0][j] in tp:
                if j == 0:
                    sims.append(np.dot(q[i], db[idx[0][j]]))
                recall[j] += 1
                if j < threshold:
                    one_percent += 1
                break
    recall = (np.cumsum(recall) / num_eval) * 100
    return recall, one_percent / num_eval * 100, sims


def test_knn_retrieve_matches_kdtree(rng):
    db = rng.randn(200, 16).astype(np.float32)
    q = rng.randn(30, 16).astype(np.float32)
    idx, dist = knn_retrieve(db, q, 10)
    tree = KDTree(db)
    ref_d, ref_i = tree.query(q, k=10)
    np.testing.assert_allclose(
        np.asarray(dist), ref_d.astype(np.float32) ** 2, rtol=1e-3, atol=1e-4
    )
    assert (np.asarray(idx) == ref_i).mean() > 0.99


def test_get_recall_matches_reference(rng):
    db = rng.randn(150, 8).astype(np.float32)
    q = db[:40] + rng.randn(40, 8).astype(np.float32) * 0.3
    tps = [[i] if i % 5 else [] for i in range(40)]  # some skipped
    got = get_recall(db, q, tps, num_neighbors=25)
    want_recall, want_op, want_sims = reference_get_recall(db, q, tps)
    np.testing.assert_allclose(got["recall"], want_recall, atol=1e-6)
    np.testing.assert_allclose(got["one_percent_recall"], want_op, atol=1e-6)
    np.testing.assert_allclose(
        sorted(got["top1_similarity"]), sorted(want_sims), rtol=1e-4
    )


def test_get_recall_perfect_retrieval():
    db = np.eye(10, dtype=np.float32)
    q = db.copy()
    tps = [[i] for i in range(10)]
    got = get_recall(db, q, tps, num_neighbors=5)
    np.testing.assert_allclose(got["recall"], 100.0)
    assert got["one_percent_recall"] == 100.0


def test_knn_retrieve_near_identical_descriptors(rng):
    """Collapsed descriptors (random-init models, near-duplicate submaps):
    gaps ~1e-5 sit below the matmul decomposition's fp32 cancellation
    noise; the exact re-rank stage must still retrieve self at distance 0
    (regression: all queries used to return one arbitrary tied index)."""
    base = rng.randn(256).astype(np.float32)
    base /= np.linalg.norm(base)
    db = base[None, :] + rng.randn(500, 256).astype(np.float32) * 1e-4
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[:50].copy()  # exact duplicates of the first 50 rows
    idx, sqd = knn_retrieve(db, q, 3)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(50))
    np.testing.assert_allclose(np.asarray(sqd)[:, 0], 0.0, atol=1e-9)


def test_report_path_semantics():
    """eval.output_file is log_dir-relative (reference cfg.OUTPUT_FILE);
    absolute paths are honored as-is with per-set prefixes applied to the
    basename (previously an absolute path was string-concatenated under
    log_dir, nesting the report silently)."""
    from lpdnet_tpu.eval.evaluate import report_path

    assert report_path("log", "results.txt") == "log/results.txt"
    assert report_path("log", "results.txt", prefix="oxford_") == (
        "log/oxford_results.txt"
    )
    assert report_path("log", "/abs/out.txt") == "/abs/out.txt"
    assert report_path("log", "/abs/out.txt", prefix="university_") == (
        "/abs/university_out.txt"
    )


def test_report_path_relative_subdir_prefixes_basename():
    from lpdnet_tpu.eval.evaluate import report_path

    assert report_path("log", "reports/run.txt", prefix="oxford_") == (
        "log/reports/oxford_run.txt"
    )
