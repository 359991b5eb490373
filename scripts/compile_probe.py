"""Cold-compile timer for the flagship train step / embed (VERDICT
round-3 item 5: the LSE train step cold-compiles in >~9 min on the axon
TPU backend while CPU compiles both aggregation modes in ~30 s).

Usage: python scripts/compile_probe.py {max,lse} {train,embed}
Set JAX_COMPILATION_CACHE_DIR to a throwaway dir for a true cold timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lpdnet_tpu.utils.cache import honor_env_platforms
honor_env_platforms()
import jax, jax.numpy as jnp, numpy as np
from lpdnet_tpu.configs import ModelConfig, TrainConfig
from lpdnet_tpu.train.state import create_train_state
from lpdnet_tpu.train.step import make_train_step

agg = sys.argv[1] if len(sys.argv) > 1 else "lse"
mode = sys.argv[2] if len(sys.argv) > 2 else "train"
cfg_m = ModelConfig(trunk="lpdnet", compute_dtype="bfloat16", aggregation=agg)
cfg_t = TrainConfig(batch_num_queries=2)
model, state = create_train_state(cfg_m, cfg_t, jax.random.key(0))
b, p, m = 2, cfg_t.positives_per_query, cfg_t.negatives_per_query
batch = {
    "query": np.zeros((b, 4096, 3), np.float32),
    "positives": np.zeros((b, p, 4096, 3), np.float32),
    "negatives": np.zeros((b, m, 4096, 3), np.float32),
    "other_neg": np.zeros((b, 4096, 3), np.float32),
}
if mode == "train":
    step = make_train_step(model, cfg_t.loss, donate=False)
    t0 = time.perf_counter()
    lowered = step.lower(state, batch) if hasattr(step, "lower") else None
    print("lower: %.1fs" % (time.perf_counter() - t0), flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print("compile[%s %s]: %.1fs" % (agg, mode, time.perf_counter() - t0), flush=True)
else:
    from lpdnet_tpu.train.step import make_embed_fn
    embed = make_embed_fn(model)
    x = np.zeros((64, 4096, 3), np.float32)
    t0 = time.perf_counter()
    lowered = embed.lower({"params": state.params, "batch_stats": state.batch_stats}, x)
    print("lower: %.1fs" % (time.perf_counter() - t0), flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print("compile[%s %s]: %.1fs" % (agg, mode, time.perf_counter() - t0), flush=True)
