#!/bin/bash
# Round-5 TPU battery, part 2: convergence-grade fidelity evidence on the
# DISCRIMINATING worlds. The part-1 world audit (world_audit.json) ran from
# a 2-epoch hard-world checkpoint — enough to quantify the lse-vs-max
# residual (±1.4 r@1 pts) but not to show the default stack's behavior at
# convergence on a world with real resolution. This battery trains the
# full 8-epoch flagship rehearsal on the 'hard' world under BOTH the pure
# default stack (auto->lse) and the max control, then audits both
# checkpoints on hard AND ground (exact / max / lse), giving:
#   - in-train recall trajectories where the eval has resolution
#     (the clustered flagship world saturates >=94% by epoch 1),
#   - cross-checkpoint, cross-world recall deltas at convergence,
#   - the per-submap descriptor-cosine tail from trained (not random
#     nor 2-epoch) weights.
# Restartable (sentinel files per step), same harness as part 1.
#
# Usage: bash scripts/round5_tpu_runs2.sh [/tmp/r5b2]
set -u
OUT=${1:-/tmp/r5b2}
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

# 1. 8-epoch flagship rehearsal on the hard world, pure default stack.
step hard_def 7200 python train.py --synthetic --synthetic_scale full \
  --synthetic_world hard --trunk lpdnet --dtype bfloat16 \
  --log_dir "$OUT/hard_def" --max_epoch 8

# 2. Max-aggregation control, same world/seed/schedule.
step hard_max 7200 python train.py --synthetic --synthetic_scale full \
  --synthetic_world hard --trunk lpdnet --dtype bfloat16 \
  --log_dir "$OUT/hard_max" --max_epoch 8 --set model.aggregation=max

# 3/4. Cross-world audits from both converged checkpoints.
step audit_def 2400 python scripts/world_audit.py \
  --log_dir "$OUT/hard_def" --worlds hard ground \
  --modes exact max lse --json "$OUT/world_audit_conv_def.json"
step audit_max 2400 python scripts/world_audit.py \
  --log_dir "$OUT/hard_max" --worlds hard ground \
  --modes exact max lse --json "$OUT/world_audit_conv_max.json"

echo "== all steps attempted; summary:"
for f in "$OUT"/*.done; do echo "  $(basename "$f" .done)"; done
