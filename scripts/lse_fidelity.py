#!/usr/bin/env python
"""Flagship-scale LSE fidelity gates (VERDICT round-3 item 1a/1b).

Everything runs at the checkpoint's own shape (the flagship: 4096 pts,
1024-D trunk, 64 clusters, 256-D descriptors) from a REAL trained
checkpoint (a dress-rehearsal log dir — ``train.py --synthetic
--synthetic_scale full``):

  A. **Descriptor cosine, LSE vs max**, per t0, on fresh synthetic
     clouds the checkpoint never saw — with throughput per t0, so the
     fidelity/throughput knee is measured, not guessed. The max path is
     ALSO compared against the exact-kNN max oracle, which calibrates
     what "approximation noise" already means on the shipped default.
  B. **Degenerate inputs**: near-zero channel std (one point repeated —
     std underflow guard), near-tie clusters (every neighbourhood value
     within ~1e-3 — smooth-max bias stress), an axis-aligned plane
     (collinear/coplanar eigen-feature edge) — finite descriptors and a
     cosine floor on each.

The retrieval-audit gate (C) rides the existing CLI and is run by the
round driver next to this script:
  python evaluate.py --synthetic --log_dir <dir> --exact_knn   # oracle
  python evaluate.py --synthetic --log_dir <dir>               # max approx
  python evaluate.py --synthetic --log_dir <dir> --set model.aggregation=lse

Usage:
  python scripts/lse_fidelity.py --log_dir /tmp/vfull_max \
      --t0 12,24,48,96 --batches 4 --batch 64
  python scripts/lse_fidelity.py --log_dir ... --json out.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fresh_clouds(rng, b, n):
    """Submap-like clouds: cluster mixtures, the dress-rehearsal family
    (data/synthetic.py) but a fresh, unseen draw."""
    out = np.empty((b, n, 3), np.float32)
    for i in range(b):
        n_clusters = rng.randint(3, 8)
        centers = rng.uniform(-0.8, 0.8, size=(n_clusters, 3))
        scales = rng.uniform(0.02, 0.15, size=(n_clusters, 1))
        pts = []
        for ci in range(n_clusters):
            cnt = n // n_clusters + (1 if ci < n % n_clusters else 0)
            pts.append(centers[ci] + rng.randn(cnt, 3) * scales[ci])
        out[i] = np.concatenate(pts)[:n].clip(-1, 1)
    return out


def degenerate_clouds(rng, b, n):
    """The LSE op's numeric edges: (label, (b, n, 3) batch)."""
    reps = np.repeat(rng.randn(b, 1, 3).astype(np.float32) * 0.1, n, axis=1)
    tie = rng.randn(b, 1, 3).astype(np.float32) * 0.3 + 1e-3 * rng.randn(
        b, n, 3
    ).astype(np.float32)
    t = np.linspace(-1, 1, n, dtype=np.float32)
    plane = np.stack(
        [np.tile(t, (b, 1)),
         rng.uniform(-1, 1, (b, n)).astype(np.float32),
         np.zeros((b, n), np.float32)], axis=-1,
    )
    return [
        ("repeated-point (zero std)", np.clip(reps, -1, 1)),
        ("near-tie cluster", np.clip(tie, -1, 1)),
        ("coplanar sheet", plane),
    ]


def cos_stats(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    c = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-30
    )
    return float(c.min()), float(c.mean())


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log_dir", required=True,
                    help="trained dress-rehearsal log dir (config.json + "
                         "checkpoints/)")
    ap.add_argument("--t0", default="12,24,48,96")
    ap.add_argument("--levels", default="2",
                    help="comma list of lse_levels values to cross with "
                         "the t0 sweep (anchor levels, ops/lse.py)")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4,
                    help="timing scan-chain length per throughput point")
    ap.add_argument("--best", action="store_true")
    ap.add_argument("--json", default=None, help="also write results here")
    args = ap.parse_args()

    from lpdnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from lpdnet_tpu.train.state import create_train_state
    from lpdnet_tpu.train.step import make_embed_fn
    from lpdnet_tpu.utils.checkpoint import CheckpointManager, load_config

    cfg = load_config(args.log_dir)
    if cfg is None:
        raise SystemExit(f"no config.json under {args.log_dir}")
    model_cfg = cfg.model
    kind = "checkpoints_best" if args.best else "checkpoints"
    mgr = CheckpointManager(os.path.join(args.log_dir, kind))
    _, state = create_train_state(model_cfg, cfg.train, jax.random.key(0))
    state, epoch = mgr.restore(state)
    mgr.close()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print(f"checkpoint: epoch {epoch}, trunk={model_cfg.trunk}, "
          f"N={model_cfg.num_points}, D={model_cfg.feature_dim}, "
          f"K={model_cfg.num_clusters}, trained agg="
          f"{model_cfg.aggregation!r}", file=sys.stderr)

    rng = np.random.RandomState(7)
    n = model_cfg.num_points
    clouds = [
        jnp.asarray(fresh_clouds(rng, args.batch, n))
        for _ in range(args.batches)
    ]

    def embed_for(**kw):
        from lpdnet_tpu.models.model import build_model

        m = build_model(dataclasses.replace(model_cfg, **kw))
        return make_embed_fn(m)

    def run(embed, xs):
        return [np.asarray(embed(variables, x)) for x in xs]

    def throughput(embed, x):
        # Time `iters` sequential embeds after a warmup; the dispatches
        # queue on the device, so only the final sync pays tunnel RTT
        # (bench.py's scan-chain measures the same thing more precisely —
        # this is a relative knee-finder, not the headline number).
        embed(variables, x)  # warm/compile
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = embed(variables, x)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / args.iters
        return x.shape[0] / dt

    results = {"epoch": int(epoch), "gates": {}}

    # --- calibration: the shipped max default vs the exact-max oracle ---
    emb_max = embed_for(aggregation="max")
    emb_exact = embed_for(aggregation="max", exact_knn=True)
    d_max = run(emb_max, clouds)
    d_exact = run(emb_exact, clouds)
    mn, mean = cos_stats(np.concatenate(d_max), np.concatenate(d_exact))
    rate_max = throughput(emb_max, clouds[0])
    print(f"[calibration] max-approx vs max-exact: cos min {mn:.6f} "
          f"mean {mean:.6f}; max-approx {rate_max:.0f} submaps/s",
          file=sys.stderr)
    results["gates"]["max_vs_exact"] = {
        "cos_min": mn, "cos_mean": mean, "rate_max": rate_max,
    }

    # --- gate A: LSE vs max per (t0, levels), with throughput -------------
    t0_list = [float(t) for t in args.t0.split(",")]
    levels_list = [int(v) for v in args.levels.split(",")]
    sweep = []
    for lv in levels_list:
        for t0v in t0_list:
            emb_lse = embed_for(aggregation="lse", lse_t0=t0v, lse_levels=lv)
            d_lse = run(emb_lse, clouds)
            mn_a, mean_a = cos_stats(
                np.concatenate(d_lse), np.concatenate(d_max)
            )
            mn_e, mean_e = cos_stats(
                np.concatenate(d_lse), np.concatenate(d_exact)
            )
            rate = throughput(emb_lse, clouds[0])
            print(f"[t0={t0v:g} levels={lv}] cos vs max-approx: min "
                  f"{mn_a:.6f} mean {mean_a:.6f} | vs exact oracle: min "
                  f"{mn_e:.6f} mean {mean_e:.6f} | {rate:.0f} submaps/s "
                  f"({rate / rate_max:.2f}x max)", file=sys.stderr)
            sweep.append({
                "t0": t0v, "levels": lv,
                "cos_min_vs_max": mn_a, "cos_mean_vs_max": mean_a,
                "cos_min_vs_exact": mn_e, "cos_mean_vs_exact": mean_e,
                "rate": rate, "speedup_vs_max": rate / rate_max,
            })
    results["gates"]["t0_sweep"] = sweep

    # --- gate B: degenerate inputs at the default t0, with and without
    # the per-row tie-explosion correction (configs lse_tie_correction) --
    t0_default = model_cfg.lse_t0
    emb_lse = embed_for(aggregation="lse", lse_t0=t0_default)
    emb_lse_tc = embed_for(
        aggregation="lse", lse_t0=t0_default, lse_tie_correction=True
    )
    degen = []
    for label, pts in degenerate_clouds(rng, min(8, args.batch), n):
        x = jnp.asarray(pts)
        dl = np.asarray(emb_lse(variables, x))
        dtc = np.asarray(emb_lse_tc(variables, x))
        dm = np.asarray(emb_max(variables, x))
        finite = bool(np.all(np.isfinite(dl)))
        mn_d, mean_d = cos_stats(dl, dm)
        mn_t, mean_t = cos_stats(dtc, dm)
        print(f"[degenerate] {label}: finite={finite}, cos vs max min "
              f"{mn_d:.6f} mean {mean_d:.6f} | tie-corrected min "
              f"{mn_t:.6f} mean {mean_t:.6f}", file=sys.stderr)
        degen.append({
            "case": label, "finite": finite,
            "cos_min_vs_max": mn_d, "cos_mean_vs_max": mean_d,
            "tc_cos_min_vs_max": mn_t, "tc_cos_mean_vs_max": mean_t,
        })
    results["gates"]["degenerate"] = degen

    print(json.dumps(results))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
