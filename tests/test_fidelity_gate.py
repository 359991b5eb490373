"""Slow-lane fidelity gate for the DEFAULT stack (round-5, VERDICT r4 item 6).

Round 4's process hole: a behavior-affecting default flip (kNN geometry)
shipped with zero gate able to object.  This test is that gate: it
quick-trains the DEFAULT config (aggregation='auto' — whatever it
resolves to TODAY) on the discriminating `hard` world, then audits the
shipped default stack against the reference-semantics `max` path and the
exact-kNN oracle on both discriminating worlds (`hard` + the
ground-plane-dominated `ground`).  A future change to ANY
fidelity-relevant default — aggregation resolution, `lse_t0`,
`lse_levels`, `lse_tie_correction`, selection `recall_target`, kNN
geometry policy — re-measures here and must keep the gate green or ship
with this file's thresholds consciously re-calibrated (which is exactly
the review surface round 4 lacked).

Calibrated 2026-08-20 on CPU (the test lane's platform; fully
deterministic seeds).  Observed at calibration (8-epoch train, loss
~0.59):

  hard:   exact r@1 56.25, max 53.12, default 46.88;
          cos(default, max)  mean 0.977, p1 0.794
  ground: max 31.25, default 31.25;
          cos(default, max)  mean 0.9985, p1 0.9850

Sensitivity (the gate MUST catch these, verified at calibration):
  lse_t0=6      -> hard mean cosine 0.948  (< 0.96 gate)  FAILS
  lse_levels=1  -> hard mean cosine 0.648, recall gap 21.9 FAILS

The worlds are sized so the exact oracle lands far below 100% —
unsaturated, so recall deltas carry signal (VERDICT r4 item 2/missing 1;
contrast docs/results_round4/big_eval_ab_postinflation.json where every
mode read 100%).
"""

import dataclasses

import numpy as np
import jax
import pytest

from lpdnet_tpu.configs import FeatureConfig, ModelConfig, TrainConfig
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.data.tuples import TupleSampler
from lpdnet_tpu.eval.evaluate import evaluate_model
from lpdnet_tpu.models.model import build_model
from lpdnet_tpu.train.state import create_train_state
from lpdnet_tpu.train.step import make_embed_fn, make_train_step

N = 256

WORLD_KW = dict(
    num_places=16, submaps_per_place=6, num_points=N, num_runs=2,
    num_families=4, family_spread=0.12, jitter=0.03, occlusion=1.2,
    seed=5,
)


def default_model_config():
    """The DEFAULT stack, shrunk in size only.

    Size fields (num_points, dims, k, geometry) must shrink to stay
    CPU-feasible; every fidelity-relevant knob (aggregation, lse_*,
    exact_knn, recall_target, compute_dtype) stays at its ModelConfig
    default so this gate re-measures whatever is shipped.
    """
    return ModelConfig(
        trunk="lpdnet", num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32, graph_k=6, features=FeatureConfig(k=6, knn_block=64),
        knn_window=32, compute_dtype="bfloat16",
    )


@pytest.fixture(scope="module")
def trained(request):
    """8-epoch quick train of the DEFAULT config on the hard world."""
    base = default_model_config()
    tcfg = TrainConfig(
        batch_num_queries=4, positives_per_query=2, negatives_per_query=4,
        base_learning_rate=2e-3,
    )
    model, state = create_train_state(base, tcfg, jax.random.key(0))
    world = make_synthetic_dataset(world="hard", **WORLD_KW)
    step = make_train_step(model, tcfg.loss)
    sampler = TupleSampler(world.queries, world.loader, num_pos=2, num_neg=4)
    rng = np.random.RandomState(0)
    loss = None
    for _ in range(8):
        for _ids, batch in sampler.epoch_batches(4, rng, rotate=True,
                                                 jitter=True):
            state, loss = step(state, batch)
    # The gate's premise is a genuinely trained net (random init showed
    # no mode separation at calibration: everything cosine >= 0.99).
    assert float(loss) < 1.0, float(loss)
    return base, {"params": state.params, "batch_stats": state.batch_stats}


def _audit(variables, mcfg, world):
    embed = make_embed_fn(build_model(mcfg))
    m = evaluate_model(
        embed, variables, world.database_sets, world.query_sets,
        world.loader, batch_size=32, return_vectors=True,
    )
    vecs = np.concatenate(m["database_vectors"] + m["query_vectors"], axis=0)
    return float(m["ave_recall"][0]), vecs


def _cos(a, b):
    c = np.sum(a * b, axis=1) / np.maximum(
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-12
    )
    return float(c.mean()), float(np.percentile(c, 1.0))


@pytest.mark.slow
def test_default_stack_fidelity_gate(trained):
    base, variables = trained
    exact_cfg = dataclasses.replace(base, aggregation="max", exact_knn=True)
    max_cfg = dataclasses.replace(base, aggregation="max")

    hard = make_synthetic_dataset(world="hard", **WORLD_KW)
    r1_exact, _ = _audit(variables, exact_cfg, hard)
    r1_max, v_max = _audit(variables, max_cfg, hard)
    r1_def, v_def = _audit(variables, base, hard)

    # The world must discriminate: a saturated audit (everything ~100%)
    # measures nothing (round-4 missing #1).
    assert r1_exact < 90.0, r1_exact
    # Catastrophic-collapse floor and retrieval-neutrality band for the
    # default aggregation vs reference max semantics (calibration:
    # 46.88 vs 53.12; lse_levels=1 regression showed a 21.9-pt gap).
    assert r1_def >= 35.0, (r1_def, r1_max)
    assert r1_def >= r1_max - 15.0, (r1_def, r1_max)

    mean_c, p1_c = _cos(v_def, v_max)
    # Calibration: mean 0.977 / p1 0.794.  lse_t0=6 -> mean 0.948 (fails);
    # lse_levels=1 -> mean 0.648 (fails).
    assert mean_c >= 0.96, (mean_c, p1_c)
    assert p1_c >= 0.70, (mean_c, p1_c)


@pytest.mark.slow
def test_default_stack_ground_world_gate(trained):
    """Coplanar-sheet geometry (the tie-explosion world, VERDICT r4
    weak 3): the default path must stay descriptor-faithful to max
    semantics when 60% of points lie in one ground plane."""
    base, variables = trained
    max_cfg = dataclasses.replace(base, aggregation="max")
    ground = make_synthetic_dataset(world="ground", ground_frac=0.6,
                                    **WORLD_KW)
    r1_max, v_max = _audit(variables, max_cfg, ground)
    r1_def, v_def = _audit(variables, base, ground)

    assert r1_def >= r1_max - 12.5, (r1_def, r1_max)
    mean_c, p1_c = _cos(v_def, v_max)
    # Calibration: mean 0.9985 / p1 0.9850; lse_levels=1 -> mean 0.9795
    # (fails the 0.99 gate).
    assert mean_c >= 0.99, (mean_c, p1_c)
    assert p1_c >= 0.95, (mean_c, p1_c)
