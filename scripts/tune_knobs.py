#!/usr/bin/env python
"""Sweep the throughput/fidelity knobs on the attached accelerator.

For each (recall_target, knn_block, knn_window) combination: full LPD
inference throughput (scan-chained, like bench.py) and descriptor cosine
against the exact full-scan reference. Use to re-derive the defaults on new
hardware generations — the current ones (0.85 / 512 / 256) came from the
v5e sweep in docs/PERF_LOG.md, whose headline lesson is that ``approx_min_k``
favours power-of-two candidate windows (win = block + 2*window).

  python scripts/tune_knobs.py                      # default grid
  python scripts/tune_knobs.py --combos 0.85,512,256 0.8,1024,512
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_GRID = [
    (0.85, 512, 256),
    (0.85, 512, 768),
    (0.85, 1024, 512),
    (0.80, 512, 256),
    (0.80, 1024, 512),
    (0.80, 256, 384),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--combos", nargs="*", default=None,
        help="rt,block,window triples (e.g. 0.85,512,256)",
    )
    ap.add_argument("--agg", default=None, choices=["max", "lse"],
                    help="override ModelConfig.aggregation for the sweep")
    args = ap.parse_args()

    from lpdnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from lpdnet_tpu.configs import FeatureConfig, ModelConfig
    from lpdnet_tpu.data.synthetic import make_synthetic_dataset
    from lpdnet_tpu.models.model import init_model

    combos = DEFAULT_GRID
    if args.combos:
        combos = []
        for c in args.combos:
            rt, blk, w = c.split(",")
            combos.append((float(rt), int(blk), int(w)))

    b = args.batch
    ds = make_synthetic_dataset(
        num_places=8, submaps_per_place=(b + 7) // 8, num_points=4096
    )
    keys = list(ds.queries.keys())[:b]
    pts = jnp.asarray(
        np.stack([ds.loader(ds.queries[k]["query"]) for k in keys])
        .astype(np.float32)
    )

    ref_cfg = ModelConfig(
        trunk="lpdnet", compute_dtype="bfloat16", exact_knn=True,
        knn_window=None,
    )
    ref_model, variables = init_model(ref_cfg, jax.random.key(0), batch_size=1)
    d_ref = np.asarray(
        jax.jit(lambda v, x: ref_model.apply(v, x, train=False))(
            variables, pts
        )
    )

    def run(cfg):
        model, _ = init_model(cfg, jax.random.key(0), batch_size=1)

        @jax.jit
        def bench(variables, points):
            def body(carry, _):
                out = model.apply(
                    variables, points + carry * 1e-30, train=False
                )
                return jnp.sum(out), None

            c, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=args.iters
            )
            return c

        d = np.asarray(
            jax.jit(lambda v, x: model.apply(v, x, train=False))(
                variables, pts
            )
        )
        cos = np.sum(d * d_ref, -1) / (
            np.linalg.norm(d, axis=-1) * np.linalg.norm(d_ref, axis=-1)
        )
        np.asarray(bench(variables, pts))
        t0 = time.perf_counter()
        np.asarray(bench(variables, pts))
        rate = b * args.iters / (time.perf_counter() - t0)
        return rate, float(cos.mean()), float(cos.min())

    rows = []
    for rt, blk, w in combos:
        kw = {} if args.agg is None else {"aggregation": args.agg}
        cfg = ModelConfig(
            trunk="lpdnet", compute_dtype="bfloat16", knn_window=w,
            features=FeatureConfig(k=20, knn_block=blk, recall_target=rt),
            **kw,
        )
        rate, cmean, cmin = run(cfg)
        rows.append({
            "recall_target": rt, "knn_block": blk, "knn_window": w,
            "window_width": blk + 2 * w,
            "submaps_per_sec": round(rate, 1),
            "cosine_mean": round(cmean, 6), "cosine_min": round(cmin, 6),
        })
        print(
            f"rt={rt} block={blk} w={w} (win {blk + 2 * w}): "
            f"{rate:7.1f} submaps/s  cos min {cmin:.6f}",
            file=sys.stderr, flush=True,
        )

    best = max(rows, key=lambda r: r["submaps_per_sec"])
    print(json.dumps({"best": best, "rows": rows}))


if __name__ == "__main__":
    main()
