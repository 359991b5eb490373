#!/bin/bash
# Round-5 TPU battery, part 1 (VERDICT round-4 item 1): re-validate — or
# revert — the end-of-round kNN-geometry default flip (512/256 -> 256/128,
# commit 406fb3f). Re-runs EVERY fidelity/perf gate at the SHIPPED
# defaults, plus the geometry sweep the flip's config comment cites but
# no artifact records. Restartable (sentinel files per step).
#
# Usage: bash scripts/round5_tpu_runs.sh [/tmp/r5]
set -u
OUT=${1:-/tmp/r5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  if [ -f "$OUT/$name.done" ]; then echo "== $name: done, skip"; return 0; fi
  echo "== $name: start $(date +%H:%M:%S)"
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.done"; echo "== $name: OK $(date +%H:%M:%S)"
  else
    echo "== $name: FAILED rc=$? (see $OUT/$name.log)"; return 1
  fi
}

# 0. Tunnel probe (fail fast if wedged).
step probe 300 python -u -c "
from lpdnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import time, numpy as np, jax, jax.numpy as jnp
x = jnp.ones((256,256)); y=(x@x).block_until_ready()
t=time.perf_counter(); float(np.asarray(y[0,0]))
print('RTT %.0f ms' % ((time.perf_counter()-t)*1e3))
" || exit 1

# 1. THE geometry sweep (publishes the table the 406fb3f config comment
#    cites). Head-to-head old (512,256) vs shipped (256,128) plus
#    neighbours, both aggregations, at bench's best batch (64) and the
#    sweep harness's round-4 batch (32) to reconcile with the PERF_LOG
#    "4138 vs 3904, NOT flipped" record.
step sweep_lse_b64 3600 python scripts/tune_knobs.py --agg lse --batch 64 \
  --combos 0.85,512,256 0.85,256,128 0.85,256,256 0.85,128,64 0.85,512,128 0.85,1024,512
step sweep_max_b64 3600 python scripts/tune_knobs.py --agg max --batch 64 \
  --combos 0.85,512,256 0.85,256,128
step sweep_lse_b32 2400 python scripts/tune_knobs.py --agg lse --batch 32 \
  --combos 0.85,512,256 0.85,256,128
step sweep_max_b32 2400 python scripts/tune_knobs.py --agg max --batch 32 \
  --combos 0.85,512,256 0.85,256,128

# 2. Dress rehearsal under the PURE shipped default stack (auto->lse,
#    block 256 / window 128, kth reuse + ulp inflation) — the evidence
#    406fb3f shipped without.
step rehearsal_def 4800 python train.py --synthetic --synthetic_scale full \
  --trunk lpdnet --dtype bfloat16 --log_dir "$OUT/vfull_def" --max_epoch 8

# 3. Max-aggregation control at the shipped geometry (fidelity-gate
#    checkpoint + in-train control).
step rehearsal_max 4800 python train.py --synthetic --synthetic_scale full \
  --trunk lpdnet --dtype bfloat16 --log_dir "$OUT/vfull_max" --max_epoch 8 \
  --set model.aggregation=max

# 4. t0 x levels fidelity sweep at the shipped geometry, from the max
#    checkpoint (the round-4 sweep ran at 512/256; geometry changes the
#    masks so the knee must be re-measured).
step fidelity 4800 python scripts/lse_fidelity.py --log_dir "$OUT/vfull_max" \
  --t0 12,24,48 --levels 2,3 --batches 4 --batch 64 \
  --json "$OUT/lse_fidelity_geo256.json"

# 5. 768-query retrieval audit on one shared world: exact oracle, max,
#    max-ckpt-under-lse, and the default-trained checkpoint.
step audit 4800 python scripts/big_eval_ab.py --pairs \
  "$OUT/vfull_max:exact" "$OUT/vfull_max:max" "$OUT/vfull_max:lse" \
  "$OUT/vfull_def:lse" --json "$OUT/big_eval_geo256.json"

# 6. Headline benches at the shipped defaults (BENCH_r04's 4751/s is the
#    only prior artifact at this config; fill in train/eval/latency).
step bench_inf 2400 python bench.py
step bench_train 3600 python bench.py --mode train
step bench_eval 3600 python bench.py --mode eval
step bench_latency 2400 python bench.py --mode latency

# 7. Mining rehearsal at 21.7k under the shipped defaults.
step mining 5400 python scripts/mining_rehearsal.py --agg lse \
  --num_submaps 21700 --queries 120

# 8. Discriminating-world fidelity audit (VERDICT round-4 items 2/3):
#    a 2-epoch flagship checkpoint trained on the 'hard' world, then
#    recall + per-submap descriptor cosine for the exact oracle, max,
#    the lse default, and the tie-corrected variant on hard AND ground.
step train_hard 2400 python train.py --synthetic --synthetic_scale full \
  --synthetic_world hard --trunk lpdnet --dtype bfloat16 \
  --log_dir "$OUT/hard_ckpt" --max_epoch 2
step world_audit 2400 python scripts/world_audit.py \
  --log_dir "$OUT/hard_ckpt" --worlds hard ground \
  --modes exact max lse lse_tie --json "$OUT/world_audit.json"

# 9. Train-step batch-axis sweep (VERDICT round-4 item 5).
step train_batch 2400 python scripts/bench_train_batch.py \
  --batches 2 4 8 16 --json "$OUT/train_batch_sweep.json"

echo "== all steps attempted; summary:"
ls "$OUT"/*.done 2>/dev/null | sed 's/.*\//  /; s/\.done//'
