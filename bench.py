#!/usr/bin/env python
"""Benchmark: 4096-pt submap inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "submaps_per_sec_per_chip", "value": N, "unit": "submaps/s",
   "vs_baseline": N / 1000}

``vs_baseline`` is measured against the project north-star from
BASELINE.json: >= 1000 submaps/sec/chip for full LPD-Net inference
(on-device 10-D eigen-features + dual-kNN graph trunk + NetVLAD) on v5e.
The PyTorch reference publishes no throughput numbers (BASELINE.md), so the
north-star target is the baseline denominator.

Extra diagnostic metrics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


# Peak dense bf16 matmul FLOP/s per chip, by PJRT device_kind (public specs).
# MFU = achieved FLOP/s (XLA cost_analysis of the compiled program) / peak.
_PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
}


def _peak_flops() -> float:
    """Peak bf16 FLOP/s of device 0, or 0.0 when unknown (CPU, new kinds)."""
    import jax

    kind = jax.devices()[0].device_kind
    for name, peak in _PEAK_BF16_FLOPS.items():
        if kind.startswith(name):
            return peak
    return 0.0


def _aot_compile(jitted, *args):
    """One AOT compile (reused for execution, so the program compiles
    exactly once) + its FLOP count from XLA cost analysis. NB: XLA counts
    a lax.scan body ONCE — the trip count is NOT multiplied (verified
    empirically with a counted-matmul scan), so scan-chained callers must
    multiply by their own iteration count. 0.0 if the backend can't
    report it."""
    compiled = jitted.lower(*args).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        flops = 0.0
    return compiled, flops


def _mfu(flops_total: float, seconds: float) -> float:
    """Model FLOP utilization vs the chip's bf16 peak (0.0 when unknown)."""
    peak = _peak_flops()
    if not peak or not flops_total or seconds <= 0:
        return 0.0
    return flops_total / seconds / peak



# Model-config overrides applied to every mode's ModelConfig (CLI
# --agg/--lse_t0): lets the same harness A/B alternative forward paths
# (e.g. the gather-free LSE aggregation) without editing the file.
_MODEL_OVERRIDES = {}


def _model_cfg(**kw):
    import dataclasses

    from lpdnet_tpu.configs import ModelConfig

    cfg = ModelConfig(**kw)
    if _MODEL_OVERRIDES:
        cfg = dataclasses.replace(cfg, **_MODEL_OVERRIDES)
    return cfg


def bench_throughput(
    batch_sizes=(16, 32, 64),
    iters: int = 10,
    trunk: str = "lpdnet",
):
    """Time ``iters`` forwards chained inside ONE jitted lax.scan.

    Two reasons: (1) this backend's ``block_until_ready`` does not wait for
    remote completion (only host transfer does), and (2) a single dispatch
    amortizes the ~24 ms tunnel round-trip out of the measurement. The scan
    carry perturbs the input each iteration so XLA cannot hoist the forward
    out of the loop.
    """
    import jax
    import jax.numpy as jnp

    from lpdnet_tpu.configs import ModelConfig
    from lpdnet_tpu.models.model import init_model

    cfg = _model_cfg(trunk=trunk, compute_dtype="bfloat16")
    model, variables = init_model(cfg, jax.random.key(0), batch_size=1)

    @jax.jit
    def run(variables, points):
        def body(carry, _):
            out = model.apply(
                variables, points + carry * 1e-30, train=False
            )
            return jnp.sum(out), None
        carry, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=iters
        )
        return carry

    rs = np.random.RandomState(0)
    best = 0.0
    best_bs = 0
    best_mfu = 0.0
    best_gflops = 0.0
    for bs in batch_sizes:
        pts = jnp.asarray(
            rs.randn(bs, cfg.num_points, 3).astype(np.float32) * 0.3
        )
        try:
            # NB: XLA cost_analysis counts a scan body ONCE (trip count
            # NOT multiplied — verified empirically), so `flops` is one
            # forward's cost and the measurement covers `iters` of them.
            run_c, flops = _aot_compile(run, variables, pts)
            np.asarray(run_c(variables, pts))  # warm
            t0 = time.perf_counter()
            np.asarray(run_c(variables, pts))  # host transfer = full sync
            dt = time.perf_counter() - t0
        except Exception as e:  # OOM at large batch: stop scaling up
            print(f"batch {bs}: {type(e).__name__}: {e}", file=sys.stderr)
            break
        rate = bs * iters / dt
        mfu = _mfu(flops * iters, dt)
        gflops_per_submap = flops / bs / 1e9
        print(
            f"batch {bs}: {rate:.1f} submaps/s ({dt / iters * 1e3:.2f} "
            f"ms/iter, {gflops_per_submap:.2f} GFLOP/submap, "
            f"mfu {mfu * 100:.2f}%)",
            file=sys.stderr,
        )
        if rate > best:
            best, best_bs, best_mfu = rate, bs, mfu
            best_gflops = gflops_per_submap
    return best, best_bs, best_mfu, best_gflops


def bench_train_step(batch_queries=2, iters=8):
    """Lazy-quadruplet training-step throughput (BASELINE config 4):
    forward + loss + backward + Adam update on reference-sized tuples
    (1 query + 2 positives + 18 negatives + other_neg, 4096 points)."""
    import jax
    import jax.numpy as jnp

    from lpdnet_tpu.configs import ModelConfig, TrainConfig
    from lpdnet_tpu.train.state import create_train_state
    from lpdnet_tpu.train.step import make_train_step

    cfg_m = _model_cfg(trunk="lpdnet", compute_dtype="bfloat16")
    cfg_t = TrainConfig(batch_num_queries=batch_queries)
    model, state = create_train_state(cfg_m, cfg_t, jax.random.key(0))
    step = make_train_step(model, cfg_t.loss, donate=False)

    rs = np.random.RandomState(0)
    n = cfg_m.num_points
    batch = {
        "query": jnp.asarray(rs.randn(batch_queries, n, 3).astype(np.float32) * 0.3),
        "positives": jnp.asarray(rs.randn(batch_queries, 2, n, 3).astype(np.float32) * 0.3),
        "negatives": jnp.asarray(rs.randn(batch_queries, 18, n, 3).astype(np.float32) * 0.3),
        "other_neg": jnp.asarray(rs.randn(batch_queries, n, 3).astype(np.float32) * 0.3),
    }
    step_c, step_flops = _aot_compile(step, state, batch)
    state, loss = step_c(state, batch)
    np.asarray(loss)  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step_c(state, batch)
    np.asarray(loss)
    dt = time.perf_counter() - t0
    queries_per_sec = batch_queries * iters / dt
    submaps_per_sec = queries_per_sec * 22
    mfu = _mfu(step_flops * iters, dt)
    print(
        f"train step: {dt / iters * 1e3:.1f} ms "
        f"({queries_per_sec:.2f} queries/s, {submaps_per_sec:.1f} submaps/s, "
        f"{step_flops / 1e9:.1f} GFLOP/step, mfu {mfu * 100:.2f}%)",
        file=sys.stderr,
    )
    return queries_per_sec, submaps_per_sec, mfu


def bench_eval(
    db_size: int = 2048,
    q_size: int = 512,
    num_runs: int = 2,
    batch_size: int = 64,
    num_points: int = 4096,
    pool: int = 128,
):
    """Batched-eval throughput (BASELINE config 3): database + query
    descriptor extraction through the native .bin batch loader, then
    recall@25 retrieval over a ~4k-descriptor database.

    Cloud contents don't affect cost (fixed shapes), so a small pool of
    distinct 4096-pt clouds is written to disk once and entries reference it
    cyclically — the IO path (real file reads through the C++ thread pool)
    and the device path (embed + retrieval) are the real ones.
    """
    import shutil
    import tempfile

    import jax

    from lpdnet_tpu.configs import ModelConfig, TrainConfig
    from lpdnet_tpu.data.binio import load_pc_file, save_pc_file
    from lpdnet_tpu.data.native_loader import NativeBatchLoader
    from lpdnet_tpu.eval.evaluate import get_latent_vectors
    from lpdnet_tpu.eval.recall import get_recall, knn_retrieve
    from lpdnet_tpu.models.model import init_model
    from lpdnet_tpu.train.step import make_embed_fn

    cfg = _model_cfg(trunk="lpdnet", compute_dtype="bfloat16")
    model, variables = init_model(cfg, jax.random.key(0), batch_size=1)
    embed = make_embed_fn(model)

    tmpdir = tempfile.mkdtemp(prefix="lpd_bench_eval_")
    try:
        rs = np.random.RandomState(0)
        for i in range(pool):
            save_pc_file(
                rs.randn(num_points, 3).astype(np.float32) * 0.3,
                f"{tmpdir}/pool/{i:04d}.bin",
            )

        def entry_set(count):
            return {
                i: {"query": f"pool/{i % pool:04d}.bin"} for i in range(count)
            }

        database_sets = [entry_set(db_size) for _ in range(num_runs)]
        query_sets = [entry_set(q_size) for _ in range(num_runs)]
        tps = [[i % db_size] for i in range(q_size)]

        def loader(fname):
            return load_pc_file(fname, tmpdir, num_points)

        nbl = NativeBatchLoader(num_points=num_points, dims=3)
        batch_loader = (
            (lambda names: nbl.load(names, tmpdir)) if nbl.is_native else None
        )
        print(f"native batch loader: {nbl.is_native}", file=sys.stderr)

        # Warm both compiled programs (embed at the padded batch shape;
        # retrieval at the (db, q, 25) shape) out of the measurement.
        warm = {i: database_sets[0][i] for i in range(batch_size)}
        get_latent_vectors(
            embed, variables, warm, loader, batch_size, batch_loader,
            transfer_dtype="int8",
        )
        np.asarray(
            knn_retrieve(
                np.zeros((db_size, cfg.output_dim), np.float32),
                np.zeros((q_size, cfg.output_dim), np.float32),
                25,
            )[0]
        )

        t0 = time.perf_counter()
        db_vecs = [
            get_latent_vectors(
                embed, variables, s, loader, batch_size, batch_loader,
                transfer_dtype="int8",
            )
            for s in database_sets
        ]
        q_vecs = [
            get_latent_vectors(
                embed, variables, s, loader, batch_size, batch_loader,
                transfer_dtype="int8",
            )
            for s in query_sets
        ]
        t_embed = time.perf_counter() - t0

        one_percents = []
        t1 = time.perf_counter()
        # Dispatch-all-then-score: overlaps the per-pair device RTT
        # (mirrors evaluate_model's pipelined retrieval).
        pairs = [
            (m, n, knn_retrieve(db_vecs[m], q_vecs[n], 25)[0])
            for m in range(num_runs)
            for n in range(num_runs)
            if m != n
        ]
        for m, n, idx in pairs:
            res = get_recall(
                db_vecs[m], q_vecs[n], tps, 25, precomputed_idx=idx
            )
            one_percents.append(res["one_percent_recall"])
        t_retrieval = time.perf_counter() - t1

        total_submaps = num_runs * (db_size + q_size)
        total_queries = num_runs * (num_runs - 1) * q_size
        embed_rate = total_submaps / t_embed
        retrieval_rate = total_queries / t_retrieval
        e2e_rate = total_submaps / (t_embed + t_retrieval)
        print(
            f"eval embed: {total_submaps} submaps in {t_embed:.2f}s "
            f"({embed_rate:.1f}/s); retrieval: {total_queries} queries in "
            f"{t_retrieval * 1e3:.1f}ms ({retrieval_rate:.0f}/s); "
            f"end-to-end {e2e_rate:.1f} submaps/s",
            file=sys.stderr,
        )
        return embed_rate, retrieval_rate, e2e_rate, total_submaps
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def bench_latency(iters: int = 50):
    """Serving latency: ONE 4096-pt submap end-to-end (B=1), the
    place-recognition online path (embed a just-captured submap). Reuses
    the throughput harness (same scan-chained measurement protocol) at
    batch size 1; reports ms/submap."""
    rate, _, mfu, _ = bench_throughput(batch_sizes=(1,), iters=iters)
    ms = 1e3 / rate
    print(f"latency: {ms:.2f} ms/submap (B=1)", file=sys.stderr)
    return ms, mfu


def _wait_for_backend() -> None:
    """The tunneled TPU backend occasionally wedges (PERF_LOG round 3:
    trivial roundtrips hanging for ~1 h before recovering) — and the hang
    sits inside backend registration, where no in-process timeout can
    reach it. Probe in a subprocess with a timeout and retry with backoff,
    so a transient wedge delays the bench instead of hanging it forever.

    Env knobs: BENCH_BACKEND_WAIT_S (total retry budget, default 1800,
    0 disables the guard), BENCH_BACKEND_PROBE_TIMEOUT_S (per-probe kill
    timeout, default 180 — a healthy tunneled handshake takes ~20-60 s).
    """
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "").strip().lower().startswith("cpu"):
        return
    budget = float(os.environ.get("BENCH_BACKEND_WAIT_S", "1800"))
    if budget <= 0:
        return
    probe_timeout = float(
        os.environ.get("BENCH_BACKEND_PROBE_TIMEOUT_S", "180"))
    probe = (
        "import jax, numpy as np; "
        "a = jax.device_put(np.ones((8, 128), np.float32)); "
        "a.block_until_ready(); print(jax.devices()[0].platform)"
    )

    import tempfile

    def run_probe():
        """Returns (status, stderr_tail): status 'ok' | 'fail' | 'hang'.
        Output goes to a temp file, not a pipe — after a kill of a child
        wedged in uninterruptible device I/O, a pipe-draining
        communicate() would block forever (the hang this guard exists to
        prevent); a file lets us abandon the corpse and move on."""
        with tempfile.TemporaryFile() as out:
            p = subprocess.Popen(
                [sys.executable, "-c", probe],
                stdout=out, stderr=subprocess.STDOUT,
            )
            try:
                rc = p.wait(timeout=probe_timeout)
            except subprocess.TimeoutExpired:
                p.kill()
                try:
                    p.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    pass  # D-state corpse; abandon it
                return "hang", ""
            out.seek(0)
            tail = out.read().decode(errors="replace")[-2000:]
            if rc == 0 and tail.strip().splitlines()[-1:] == ["cpu"]:
                # jax fell back to CPU silently (deterministic accelerator
                # init failure, not a wedge): an rc-0 CPU probe must NOT
                # greenlight the bench to publish CPU throughput against
                # the TPU north-star.
                return "fail", tail + "\n(probe ran on CPU fallback)"
            return ("ok" if rc == 0 else "fail"), tail

    deadline = time.time() + budget
    attempt = 0
    fast_fails = 0
    while True:
        attempt += 1
        status, tail = run_probe()
        if status == "ok":
            if attempt > 1:
                print(f"backend probe recovered on attempt {attempt}",
                      file=sys.stderr)
            return
        if status == "fail":
            # A deterministic startup error (version mismatch, chip busy,
            # broken install) is not a transient wedge: surface it and
            # stop burning the retry budget after 3 consecutive fails.
            fast_fails += 1
            print(f"backend probe {attempt} exited nonzero:\n{tail}",
                  file=sys.stderr)
            if fast_fails >= 3:
                print("backend probe failing deterministically; giving up",
                      file=sys.stderr)
                sys.exit(4)
        else:
            fast_fails = 0
        if time.time() >= deadline:
            print(
                f"backend unreachable after {budget:.0f} s ({attempt} "
                "probes) — wedged tunnel; refusing to hang in backend init",
                file=sys.stderr,
            )
            sys.exit(3)
        print(f"backend probe {attempt} {status}; retrying", file=sys.stderr)
        time.sleep(min(60.0, max(5.0, deadline - time.time())))


def main():
    import argparse

    from lpdnet_tpu.utils.cache import enable_compilation_cache

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--mode", default="inference",
                    choices=["inference", "train", "pointnetvlad", "eval",
                             "latency"])
    ap.add_argument("--agg", default=None, choices=["max", "lse"],
                    help="override ModelConfig.aggregation (LPD trunk)")
    ap.add_argument("--lse_t0", type=float, default=None,
                    help="override ModelConfig.lse_t0")
    ap.add_argument("--lse_levels", type=int, default=None,
                    help="override ModelConfig.lse_levels (anchor levels)")
    ap.add_argument("--lse_fused", default=None,
                    choices=["off", "on"],
                    help="override ModelConfig.lse_fused (fused Pallas "
                         "LSE kernel)")
    ap.add_argument("--lse_tie", action="store_true",
                    help="set ModelConfig.lse_tie_correction")
    ap.add_argument("--train_batch", type=int, default=2,
                    help="train mode: batch_num_queries (the reference "
                         "config is 2 = 44 submaps/step; the round-5 "
                         "batch-axis probe sweeps this)")
    args = ap.parse_args()
    if args.agg is not None:
        _MODEL_OVERRIDES["aggregation"] = args.agg
    if args.lse_t0 is not None:
        _MODEL_OVERRIDES["lse_t0"] = args.lse_t0
    if args.lse_levels is not None:
        _MODEL_OVERRIDES["lse_levels"] = args.lse_levels
    if args.lse_fused is not None:
        _MODEL_OVERRIDES["lse_fused"] = args.lse_fused
    if args.lse_tie:
        _MODEL_OVERRIDES["lse_tie_correction"] = True

    _wait_for_backend()
    enable_compilation_cache()
    if args.mode == "latency":
        ms, mfu = bench_latency()
        print(json.dumps({
            "metric": "embed_latency_ms_per_submap",
            "value": round(ms, 2),
            "unit": "ms",
            "vs_baseline": round(1000.0 / ms / 1000.0, 4),
            "detail": {
                "model": "lpdnet bf16, B=1 single-submap serving path",
                "num_points": 4096,
                "mfu": round(mfu, 4),
            },
        }))
        return
    if args.mode == "pointnetvlad":
        best, best_bs, mfu, gflops = bench_throughput(trunk="pointnetvlad")
        print(json.dumps({
            "metric": "pointnetvlad_submaps_per_sec_per_chip",
            "value": round(best, 2),
            "unit": "submaps/s",
            "vs_baseline": round(best / 1000.0, 4),
            "detail": {"model": "pointnetvlad bf16 (STN + shared MLP + NetVLAD)",
                       "num_points": 4096, "best_batch": best_bs,
                       "mfu": round(mfu, 4),
                       "gflops_per_submap": round(gflops, 2)},
        }))
        return
    if args.mode == "eval":
        embed_rate, retrieval_rate, e2e_rate, total = bench_eval()
        print(json.dumps({
            "metric": "eval_submaps_per_sec_per_chip",
            "value": round(e2e_rate, 2),
            "unit": "submaps/s",
            "vs_baseline": round(e2e_rate / 1000.0, 4),
            "detail": {
                "pipeline": "native .bin batch load + int8 wire + lpdnet bf16 "
                            "embed + recall@25 retrieval (2 runs, 2048-db)",
                "total_submaps": total,
                "embed_submaps_per_sec": round(embed_rate, 1),
                "retrieval_queries_per_sec": round(retrieval_rate, 1),
            },
        }))
        return
    if args.mode == "train":
        qps, sps, mfu = bench_train_step(batch_queries=args.train_batch)
        print(json.dumps({
            "metric": "train_queries_per_sec_per_chip",
            "value": round(qps, 3),
            "unit": "queries/s",
            "vs_baseline": round(sps / 1000.0, 4),
            "detail": {
                "model": "lpdnet bf16, lazy quadruplet, "
                         f"B={args.train_batch} "
                         "(ref config 2)",
                "tuples": "1q + 2pos + 18neg + other",
                "submaps_per_sec": round(sps, 1),
                "mfu": round(mfu, 4),
            },
        }))
        return
    if args.trace:
        import jax.profiler

        jax.profiler.start_trace(args.trace)
    best, best_bs, mfu, gflops = bench_throughput()
    if args.trace:
        import jax.profiler

        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}", file=sys.stderr)
    result = {
        "metric": "submaps_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "submaps/s",
        "vs_baseline": round(best / 1000.0, 4),
        "detail": {
            "model": "lpdnet bf16 (on-device 10-D features + dual-kNN + NetVLAD)",
            "num_points": 4096,
            "best_batch": best_bs,
            "mfu": round(mfu, 4),
            "gflops_per_submap": round(gflops, 2),
            "baseline": "north-star 1000 submaps/s/chip (BASELINE.json)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
