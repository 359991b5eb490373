#!/bin/bash
# Round-4 TPU battery (VERDICT round-3 items 1, 3, 4, 5, 6): dress
# rehearsals under max and lse, flagship fidelity gates + t0 sweep,
# retrieval audits, benches, mining rehearsal under lse, and the LSE
# train-step compile timing. Each step logs under $OUT and is skipped if
# its sentinel exists, so the script is restartable after tunnel wedges.
#
# Usage: bash scripts/round4_tpu_runs.sh [/tmp/r4]
set -u
OUT=${1:-/tmp/r4}
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
step probe 180 python -u -c "
from lpdnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import time, numpy as np, jax, jax.numpy as jnp
x = jnp.ones((256,256)); y=(x@x).block_until_ready()
t=time.perf_counter(); float(np.asarray(y[0,0]))
print('RTT %.0f ms' % ((time.perf_counter()-t)*1e3))
" || exit 1

# 1. Dress rehearsal under max (control + the fidelity-gate checkpoint).
step rehearsal_max 3600 python train.py --synthetic --synthetic_scale full \
  --trunk lpdnet --dtype bfloat16 --log_dir "$OUT/vfull_max" --max_epoch 8

# 2. Dress rehearsal under lse (the gate: 100% recall@1, comparable loss).
step rehearsal_lse 3600 python train.py --synthetic --synthetic_scale full \
  --trunk lpdnet --dtype bfloat16 --log_dir "$OUT/vfull_lse" --max_epoch 8 \
  --set model.aggregation=lse

# 3. Flagship fidelity gates + t0 sweep from the max-trained checkpoint.
step fidelity 3600 python scripts/lse_fidelity.py --log_dir "$OUT/vfull_max" \
  --t0 12,24,48,96 --batches 4 --batch 64 --json "$OUT/lse_fidelity.json"

# 4. Retrieval audits (fresh synthetic world; evaluate CLI restores the
#    max checkpoint and overrides the aggregation per run).
step eval_exact 2400 python evaluate.py --synthetic --log_dir "$OUT/vfull_max" \
  --exact_knn --output_file "$OUT/eval_exact.txt"
step eval_max 2400 python evaluate.py --synthetic --log_dir "$OUT/vfull_max" \
  --output_file "$OUT/eval_max.txt"
step eval_lse 2400 python evaluate.py --synthetic --log_dir "$OUT/vfull_max" \
  --set model.aggregation=lse --output_file "$OUT/eval_lse.txt"
# ... and the lse-trained checkpoint under its own mode.
step eval_lse_ckpt 2400 python evaluate.py --synthetic \
  --log_dir "$OUT/vfull_lse" --output_file "$OUT/eval_lse_ckpt.txt"

# 5. Benches, both aggregations (JSON lines land in the logs).
step bench_inf_max 2400 python bench.py --agg max
step bench_inf_lse 2400 python bench.py --agg lse
step bench_train_max 3600 python bench.py --mode train --agg max
step bench_train_lse 3600 python bench.py --mode train --agg lse
step bench_eval_lse 3600 python bench.py --mode eval --agg lse
step bench_eval_max 3600 python bench.py --mode eval --agg max
step bench_latency_lse 2400 python bench.py --mode latency --agg lse

# 6. Mining rehearsal under lse (cache refresh + step dilation at 21.7k).
step mining_lse 5400 python scripts/mining_rehearsal.py --agg lse \
  --num_submaps 21700 --queries 120

# 7. LSE vs max train-step COLD compile timing on the TPU backend
#    (bisect input; JAX_COMPILATION_CACHE off via a throwaway dir).
step compile_lse 3600 env JAX_COMPILATION_CACHE_DIR="$OUT/cc_lse" \
  python -u scripts/compile_probe.py lse train
step compile_max 3600 env JAX_COMPILATION_CACHE_DIR="$OUT/cc_max" \
  python -u scripts/compile_probe.py max train

echo "== all steps attempted; summary:"
ls "$OUT"/*.done 2>/dev/null | sed 's/.*\//  /; s/\.done//'
