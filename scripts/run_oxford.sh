#!/usr/bin/env bash
# Full Oxford RobotCar reproduction runbook — the reference's two-stage
# benchmark (SURVEY §6, BASELINE configs 3-5) as one command. Run from the
# repo root with the reference dataset layout on disk:
#
#   benchmark_datasets/
#     oxford/<run>/pointcloud_locations_20m_10overlap.csv
#     oxford/<run>/pointcloud_20m_10overlap/*.bin        (4096-pt submaps)
#     university|residential|business/<run>/pointcloud_centroids_25.csv
#     university|residential|business/<run>/pointcloud_25m_25/*.bin
#
# Usage: scripts/run_oxford.sh [DATASET_FOLDER] [LOG_ROOT]
#
# Tuple/eval pickles are generated INTO the dataset folder (the layout
# evaluate.py --all_sets discovers; same pattern the fabricated-world E2E
# test drives — tests/test_refine_e2e.py). Every stage is restartable:
# training resumes from its log dir via --resume; pickles are only
# rebuilt when absent. U.S. test-region centers default to published
# Oxford p1-p4 only — pass them via
#   lpdnet_tpu.data.generate_queries --regions_json
# if your refined split needs them pinned (see docs/ROADMAP.md).
set -euo pipefail

DATASET=${1:-benchmark_datasets}
OUT=${2:-oxford_runs}
PY=${PYTHON:-python}
# Extra CLI args (e.g. tiny --set overrides for smoke tests; see
# tests/test_scripts.py::test_run_oxford_runbook_smoke).
TRAIN_ARGS=${TRAIN_ARGS:-}
EVAL_ARGS=${EVAL_ARGS:-}
GEN_ARGS=${GEN_ARGS:-}

mkdir -p "$OUT"

echo "== stage 0: training/test tuples (baseline 10m/50m + refine 12.5m) =="
[ -f "$DATASET/training_queries_baseline.pickle" ] || \
  $PY -m lpdnet_tpu.data.generate_queries \
    --dataset_folder "$DATASET" --out_dir "$DATASET" --mode baseline $GEN_ARGS
[ -f "$DATASET/training_queries_refine.pickle" ] || \
  $PY -m lpdnet_tpu.data.generate_queries \
    --dataset_folder "$DATASET" --out_dir "$DATASET" --mode refine $GEN_ARGS
# All eight eval pickles must exist, else regenerate — a partially-written
# set (crash mid-generation) would silently shrink the 4-set benchmark.
eval_pickles_complete=1
for ds in oxford university residential business; do
  for kind in database query; do
    [ -f "$DATASET/${ds}_evaluation_${kind}.pickle" ] || eval_pickles_complete=0
  done
done
[ "$eval_pickles_complete" = 1 ] || \
  $PY -m lpdnet_tpu.data.generate_queries \
    --dataset_folder "$DATASET" --out_dir "$DATASET" --mode test_sets \
    --datasets oxford university residential business $GEN_ARGS

echo "== stage 1: LPD-Net baseline training (Oxford tuples) =="
$PY train.py --preset lpd_baseline \
  --dataset_folder "$DATASET" --log_dir "$OUT/log_baseline" \
  $( [ -d "$OUT/log_baseline/checkpoints" ] && echo --resume ) $TRAIN_ARGS

echo "== stage 2: baseline evaluation (Oxford) =="
$PY evaluate.py --log_dir "$OUT/log_baseline" \
  --dataset_folder "$DATASET" $EVAL_ARGS

echo "== stage 3: refined training (Oxford + U.S. tuples) =="
$PY train.py --preset refine \
  --dataset_folder "$DATASET" --log_dir "$OUT/log_refine" \
  $( [ -d "$OUT/log_refine/checkpoints" ] && echo --resume ) $TRAIN_ARGS

echo "== stage 4: refined evaluation (all four sets) =="
$PY evaluate.py --log_dir "$OUT/log_refine" --all_sets \
  --dataset_folder "$DATASET" $EVAL_ARGS

echo "== stage 5: fidelity audit (exact-kNN forward, Oxford) =="
$PY evaluate.py --log_dir "$OUT/log_refine" --exact_knn \
  --dataset_folder "$DATASET" \
  --output_file results_exact.txt $EVAL_ARGS

echo "done. Reports: $OUT/log_*/ (+ .jsonl twins)"
echo "North star (BASELINE.json): Oxford ave recall@1% within 0.5 pts of 94.92"
