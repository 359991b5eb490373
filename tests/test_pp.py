"""Pipeline parallelism (parallel/pp.py) on the virtual CPU fleet.

The staged forward must reproduce the monolithic DescriptorNet exactly
(same math, same params — stage variables are subtrees of the full tree),
the stack packing must round-trip losslessly, and the pipelined train step
must match a microbatch-sequential reference (full model applied per
microbatch with BN statistics carried) in loss AND gradients — the
gradient check exercises jax.grad through the whole scan/ppermute/switch
schedule.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpdnet_tpu.configs import FeatureConfig, LossConfig, ModelConfig, TrainConfig
from lpdnet_tpu.data.synthetic import make_synthetic_dataset
from lpdnet_tpu.data.tuples import TupleSampler
from lpdnet_tpu.losses import loss_from_config
from lpdnet_tpu.models.model import init_model
from lpdnet_tpu.parallel.pp import (
    PPTrainState,
    build_plan,
    create_pp_train_state,
    make_pp_embed_fn,
    make_pp_mesh,
    make_pp_train_step,
    place_stacks,
    stacks_to_variables,
    variables_to_stacks,
)
from lpdnet_tpu.train.step import _flatten_tuples

N = 64


def tiny_cfg(**kw) -> ModelConfig:
    # Pin max so the plain staged-parity tests keep covering the gather
    # path; the *_lse tests override aggregation explicitly ('auto'
    # resolves to lse since round 4).
    return ModelConfig(
        trunk="lpdnet", num_points=N, feature_dim=64, num_clusters=8,
        output_dim=32, graph_k=6, features=FeatureConfig(k=6, knn_block=64),
        **{"aggregation": "max", **kw},
    )


@pytest.fixture(scope="module")
def bits():
    cfg = tiny_cfg()
    model, variables = init_model(cfg, jax.random.key(0), batch_size=1)
    pts = (
        np.random.RandomState(1).randn(8, N, 3).astype(np.float32) * 0.3
    )
    return cfg, model, variables, jnp.asarray(pts)


def test_stack_roundtrip(bits):
    cfg, model, variables, _ = bits
    for s in (1, 2, 3, 4):
        plan = build_plan(cfg, s, variables)
        pstack, sstack = variables_to_stacks(plan, variables)
        assert pstack.shape == (s, plan.p_max)
        back = stacks_to_variables(plan, pstack, sstack)
        for src, dst in (
            (variables["params"], back["params"]),
            (variables["batch_stats"], back["batch_stats"]),
        ):
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)
                ),
                src, dst,
            )


def test_plan_rejects_bad_stage_counts(bits):
    cfg, _, variables, _ = bits
    with pytest.raises(ValueError, match="num_stages"):
        build_plan(cfg, 5, variables)
    with pytest.raises(NotImplementedError, match="trunks"):
        build_plan(
            ModelConfig(trunk="nope", num_points=N), 2, variables
        )


@pytest.mark.parametrize("stages,micro", [
    # Suite-hygiene round 5: the PointNetVLAD-trunk PP variants run in
    # the slow lane; default-lane PP parity coverage is the LPD trunk
    # (flagship family) + the LSE default below.
    pytest.param(3, 2, marks=pytest.mark.slow),
    pytest.param(2, 4, marks=pytest.mark.slow),
])
def test_pp_embed_pointnetvlad_matches_full_model(stages, micro):
    """The baseline PointNetVLAD trunk (SURVEY C10) pipelines too: units
    [STN + mlp1] -> [mlp2] -> [head]; the staged forward must reproduce
    the monolithic model exactly."""
    cfg = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=64,
        num_clusters=8, output_dim=32,
    )
    model, variables = init_model(cfg, jax.random.key(2), batch_size=1)
    pts = jnp.asarray(
        np.random.RandomState(3).randn(8, N, 3).astype(np.float32) * 0.3
    )
    ref = model.apply(variables, pts, train=False)

    plan = build_plan(cfg, stages, variables)
    mesh = make_pp_mesh(stages)
    pstack, sstack = place_stacks(plan, mesh, variables)
    embed = make_pp_embed_fn(
        plan, mesh, microbatch_size=pts.shape[0] // micro
    )
    out = embed(pstack, sstack, pts)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_pp_embed_pointnetvlad_feature_transform_matches_full_model():
    """use_feature_transform=True routes through _PNBackUnit's fstn branch
    (64x64 feature alignment, off in the reference defaults) — the param
    path mapping ('trunk','fstn') and the staged einsum must reproduce the
    monolithic forward exactly."""
    cfg = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=64,
        num_clusters=8, output_dim=32, use_feature_transform=True,
    )
    model, variables = init_model(cfg, jax.random.key(5), batch_size=1)
    pts = jnp.asarray(
        np.random.RandomState(7).randn(8, N, 3).astype(np.float32) * 0.3
    )
    ref = model.apply(variables, pts, train=False)

    plan = build_plan(cfg, 3, variables)
    mesh = make_pp_mesh(3)
    pstack, sstack = place_stacks(plan, mesh, variables)
    embed = make_pp_embed_fn(plan, mesh, microbatch_size=4)
    out = embed(pstack, sstack, pts)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_pp_embed_rejects_width_mismatch(bits):
    """The plan's activation-buffer layout is static: a batch wider than
    the planned input (e.g. 13-channel precomputed features against a
    3-channel plan) must fail loud, not silently truncate stage 0."""
    cfg, _, variables, pts = bits
    plan = build_plan(cfg, 2, variables)
    mesh = make_pp_mesh(2)
    pstack, sstack = place_stacks(plan, mesh, variables)
    embed = make_pp_embed_fn(plan, mesh, microbatch_size=4)
    wide = jnp.concatenate(
        [pts, jnp.zeros((*pts.shape[:-1], 10), pts.dtype)], axis=-1
    )
    with pytest.raises(ValueError, match="channel inputs"):
        embed(pstack, sstack, wide)
    # And a plan built FOR 13-wide inputs accepts them.
    plan13 = build_plan(cfg, 2, variables, input_width=13)
    assert plan13.in_widths[0] == 13


@pytest.mark.parametrize("stages,micro", [
    # Default lane keeps one uneven-partition shape; the 4-stage max shape
    # moved to --runslow in round 5's third hygiene pass (4-stage coverage
    # stays on the default lane via the LSE sibling below, plus
    # dryrun_multichip and the slow-lane train-step matrix).
    pytest.param(4, 2, marks=pytest.mark.slow),
    pytest.param(2, 4, marks=pytest.mark.slow),
    pytest.param(1, 8, marks=pytest.mark.slow),
    (3, 1),
])
def test_pp_embed_matches_full_model(bits, stages, micro):
    cfg, model, variables, pts = bits
    ref = model.apply(variables, pts, train=False)

    plan = build_plan(cfg, stages, variables)
    mesh = make_pp_mesh(stages)
    pstack, sstack = place_stacks(plan, mesh, variables)
    embed = make_pp_embed_fn(plan, mesh, microbatch_size=pts.shape[0] // micro)
    out = embed(pstack, sstack, pts)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


@pytest.mark.parametrize("stages,micro", [
    (4, 2),
    pytest.param(2, 4, marks=pytest.mark.slow),
])
def test_pp_embed_lse_matches_full_model(stages, micro):
    """aggregation='lse' composes with PP (VERDICT round-3 item 2): the
    staged forward must reproduce the monolithic LSE model exactly — the
    stage units build their aggregator from the SAME shared helper
    (models/lpdnet.py make_lse_agg), so the comparison is bit-for-bit up
    to f32 reduction order."""
    cfg = tiny_cfg(aggregation="lse", lse_t0=24.0)
    model, variables = init_model(cfg, jax.random.key(0), batch_size=1)
    pts = jnp.asarray(
        np.random.RandomState(2).randn(8, N, 3).astype(np.float32) * 0.3
    )
    ref = model.apply(variables, pts, train=False)

    plan = build_plan(cfg, stages, variables)
    mesh = make_pp_mesh(stages)
    pstack, sstack = place_stacks(plan, mesh, variables)
    embed = make_pp_embed_fn(plan, mesh, microbatch_size=pts.shape[0] // micro)
    out = embed(pstack, sstack, pts)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_pp_embed_bf16_matches_full_model():
    """PP under bfloat16 compute — the FLAGSHIP dtype. Latent round-4
    bug (found by the round-5 review follow-up): the head stage's dummy
    activation was ``zeros_like(act_in)``, and act_in is always upcast
    to f32 in the schedule, so with wire=bf16 the lax.switch branches
    disagreed on the activation dtype and PP failed at TRACE time for
    every bf16 config (all prior PP tests ran f32). The fix emits the
    dummy in the wire dtype; this pins trace success + parity."""
    cfg = ModelConfig(
        trunk="lpdnet", num_points=128, feature_dim=32, num_clusters=8,
        output_dim=32, graph_k=6, features=FeatureConfig(k=6, knn_block=64),
        knn_window=32, compute_dtype="bfloat16", aggregation="lse",
    )
    model, variables = init_model(cfg, jax.random.key(0), batch_size=2)
    pts = jnp.asarray(
        np.random.RandomState(5).randn(2, 128, 3).astype(np.float32) * 0.3
    )
    ref = np.asarray(model.apply(variables, pts, train=False))
    plan = build_plan(cfg, 2, variables)
    mesh = make_pp_mesh(2)
    pstack, sstack = place_stacks(plan, mesh, variables)
    embed = make_pp_embed_fn(plan, mesh, microbatch_size=1)
    out = np.asarray(embed(pstack, sstack, pts))
    # bf16 wire: staged activations cross one extra cast pair vs the
    # monolithic forward, so parity is to bf16 resolution, not f32.
    cos = np.sum(out * ref, axis=-1)
    assert cos.min() > 0.999, cos
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=1e-2)


@pytest.mark.slow
def test_pp_train_step_lse_matches_microbatched_reference():
    """Pipelined LSE training == the sequential-microbatch reference (the
    same bar the max path holds): loss and first-step Adam moments.

    Runs the exact path (f32 distances, hard top_k, f32 LSE matmuls): in
    approx mode the staged and monolithic programs fuse the bf16
    exp/mask matmuls differently, and the resulting h-fuzz flips
    near-kth mask membership in the feature-space graph — discrete
    gradient-routing noise (measured up to ~6e-3 on BN biases) that the
    approx-mode EMBED parity test above shows is forward-benign. Exact
    mode removes the nondeterminism so this is a pure wiring check."""
    cfg = tiny_cfg(aggregation="lse", lse_t0=24.0, exact_knn=True)
    model, variables = init_model(cfg, jax.random.key(0), batch_size=1)
    loss_cfg = LossConfig(lazy=True, ignore_zero_loss=False)
    train_cfg = TrainConfig(
        batch_num_queries=2, positives_per_query=2, negatives_per_query=4,
        base_learning_rate=1e-3, loss=loss_cfg,
    )
    batch = _tuple_batch(b=2)
    flat, p, m = _flatten_tuples(jax.tree_util.tree_map(jnp.asarray, batch))
    micro, stages = 2, 3
    b, t = 2, 1 + p + m + 1
    inputs = flat.reshape(micro, flat.shape[0] // micro, N, 3)

    (ref_loss, _), ref_grads = _microbatched_reference(
        model, variables["params"], variables["batch_stats"], inputs,
        loss_cfg, b, t,
    )

    plan = build_plan(cfg, stages, variables)
    mesh = make_pp_mesh(stages)
    state = create_pp_train_state(plan, mesh, variables, train_cfg)
    step = make_pp_train_step(
        plan, loss_cfg, mesh, microbatches=micro, donate=False
    )
    new_state, loss = step(state, batch)
    assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)

    mu = new_state.opt_state[0].mu
    grad_vars = stacks_to_variables(
        plan, mu / (1.0 - 0.9), jnp.zeros_like(new_state.sstack)
    )
    flat_ref = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    }
    flat_pp = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(
            grad_vars["params"]
        )[0]
    }
    assert set(flat_ref) == set(flat_pp)
    for k in flat_ref:
        # No discrete gather tie-flips on the LSE path (soft aggregation),
        # so the tolerance is pure f32 reduction-order noise.
        np.testing.assert_allclose(
            np.asarray(flat_pp[k]), np.asarray(flat_ref[k]),
            atol=2e-4, rtol=1e-2, err_msg=k,
        )


def _microbatched_reference(model, params, batch_stats, inputs, loss_cfg,
                            b, t):
    """Sequential-microbatch forward with carried BN state: the semantics
    the pipeline implements (per-microbatch batch statistics)."""

    def loss_fn(params):
        bs = batch_stats
        descs = []
        for i in range(inputs.shape[0]):
            out, mut = model.apply(
                {"params": params, "batch_stats": bs},
                inputs[i], train=True, mutable=["batch_stats"],
            )
            bs = mut["batch_stats"]
            descs.append(out)
        desc = jnp.concatenate(descs, axis=0).reshape(b, t, -1)
        p = 2
        m = 4
        loss = loss_from_config(
            loss_cfg, desc[:, 0], desc[:, 1:1 + p],
            desc[:, 1 + p:1 + p + m], desc[:, -1],
        )
        return loss, bs

    return jax.value_and_grad(loss_fn, has_aux=True)(params)


def _tuple_batch(b=2):
    ds = make_synthetic_dataset(
        num_places=6, submaps_per_place=4, num_points=N
    )
    sampler = TupleSampler(ds.queries, ds.loader, num_pos=2, num_neg=4)
    rng = np.random.RandomState(0)
    _, batch = next(sampler.epoch_batches(b, rng))
    return batch


@pytest.mark.slow
@pytest.mark.parametrize("stages,micro", [(3, 2), (4, 4)])
def test_pp_train_step_matches_microbatched_reference(bits, stages, micro):
    cfg, model, variables, _ = bits
    loss_cfg = LossConfig(lazy=True, ignore_zero_loss=False)
    train_cfg = TrainConfig(
        batch_num_queries=2, positives_per_query=2, negatives_per_query=4,
        base_learning_rate=1e-3, loss=loss_cfg,
    )
    batch = _tuple_batch(b=2)
    flat, p, m = _flatten_tuples(
        jax.tree_util.tree_map(jnp.asarray, batch)
    )
    b, t = 2, 1 + p + m + 1
    inputs = flat.reshape(micro, flat.shape[0] // micro, N, 3)

    (ref_loss, ref_stats), ref_grads = _microbatched_reference(
        model, variables["params"], variables["batch_stats"], inputs,
        loss_cfg, b, t,
    )

    plan = build_plan(cfg, stages, variables)
    mesh = make_pp_mesh(stages)
    state = create_pp_train_state(plan, mesh, variables, train_cfg)
    step = make_pp_train_step(
        plan, loss_cfg, mesh, microbatches=micro, donate=False
    )
    new_state, loss = step(state, batch)

    assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)

    # Gradients: recover the per-parameter trees from the step's update.
    # Adam's first moment after step 1 is (1 - b1) * grad, so compare the
    # moment stack against the reference grads.
    mu = new_state.opt_state[0].mu
    grad_vars = stacks_to_variables(
        plan, mu / (1.0 - 0.9), jnp.zeros_like(new_state.sstack)
    )
    flat_ref = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    }
    flat_pp = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(
            grad_vars["params"]
        )[0]
    }
    assert set(flat_ref) == set(flat_pp)
    for k in flat_ref:
        # Two noise sources between the pipelined schedule and the
        # python-loop reference: f32 reduction-order noise (~2e-5 abs) and
        # DISCRETE near-tie flips in the feature-space kNN graph (noise in
        # h flips a neighbour choice, which routes max-aggregation grads
        # differently — measured <=2e-4 abs on <0.3% of edge_feature
        # elements). Real wiring bugs produce O(1) differences.
        np.testing.assert_allclose(
            np.asarray(flat_pp[k]), np.asarray(flat_ref[k]),
            atol=5e-4, rtol=1e-2, err_msg=k,
        )

    # BN statistics: the pipeline's final stats must match the carried
    # reference state.
    pp_stats = stacks_to_variables(
        plan, new_state.pstack, new_state.sstack
    )["batch_stats"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        ref_stats, pp_stats,
    )


@pytest.mark.parametrize("data,stages,micro", [
    (2, 2, 2),
    pytest.param(2, 4, 1, marks=pytest.mark.slow),
    pytest.param(4, 2, 2, marks=pytest.mark.slow),
])
def test_dp_pp_embed_matches_full_model(bits, data, stages, micro):
    """DPxPP (2-D (data, stage) mesh): the staged forward with microbatch
    rows sharded over pipeline replicas must still reproduce the monolithic
    model exactly — eval mode uses running BN stats, so there is no
    per-replica statistics caveat."""
    cfg, model, variables, pts = bits
    ref = model.apply(variables, pts, train=False)

    plan = build_plan(cfg, stages, variables)
    mesh = make_pp_mesh(stages, data=data)
    assert mesh.axis_names == ("data", "stage")
    pstack, sstack = place_stacks(plan, mesh, variables)
    embed = make_pp_embed_fn(
        plan, mesh, microbatch_size=pts.shape[0] // micro, data_axis="data"
    )
    out = embed(pstack, sstack, pts)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def _dp_microbatched_reference(model, params, batch_stats, inputs, ndata,
                               loss_cfg, b, t):
    """Per-replica sequential reference for DPxPP: each data slice runs the
    microbatch-sequential forward on ITS rows with its own carried BN
    state (per-replica statistics), the loss is computed once over the
    globally reassembled descriptors, and the final BN states average
    across replicas."""
    m, bm = inputs.shape[:2]
    rows = bm // ndata

    def loss_fn(params):
        descs = [[None] * ndata for _ in range(m)]
        finals = []
        for d in range(ndata):
            bs = batch_stats
            for i in range(m):
                out, mut = model.apply(
                    {"params": params, "batch_stats": bs},
                    inputs[i, d * rows:(d + 1) * rows],
                    train=True, mutable=["batch_stats"],
                )
                bs = mut["batch_stats"]
                descs[i][d] = out
            finals.append(bs)
        desc = jnp.concatenate(
            [jnp.concatenate(row, axis=0) for row in descs], axis=0
        ).reshape(b, t, -1)
        p, mneg = 2, 4
        loss = loss_from_config(
            loss_cfg, desc[:, 0], desc[:, 1:1 + p],
            desc[:, 1 + p:1 + p + mneg], desc[:, -1],
        )
        mean_stats = jax.tree_util.tree_map(
            lambda *xs: sum(xs) / len(xs), *finals
        )
        return loss, mean_stats

    return jax.value_and_grad(loss_fn, has_aux=True)(params)


@pytest.mark.slow
def test_dp_pp_train_step_matches_reference(bits):
    """DPxPP train step vs the per-replica sequential reference: loss,
    gradients (psum'd over the data axis by shard_map's transpose), and
    the cross-replica-averaged BN statistics must all match."""
    cfg, model, variables, _ = bits
    data, stages, micro = 2, 2, 2
    loss_cfg = LossConfig(lazy=True, ignore_zero_loss=False)
    train_cfg = TrainConfig(
        batch_num_queries=2, positives_per_query=2, negatives_per_query=4,
        base_learning_rate=1e-3, loss=loss_cfg,
    )
    batch = _tuple_batch(b=2)
    flat, p, m = _flatten_tuples(
        jax.tree_util.tree_map(jnp.asarray, batch)
    )
    b, t = 2, 1 + p + m + 1
    inputs = flat.reshape(micro, flat.shape[0] // micro, N, 3)

    (ref_loss, ref_stats), ref_grads = _dp_microbatched_reference(
        model, variables["params"], variables["batch_stats"], inputs,
        data, loss_cfg, b, t,
    )

    plan = build_plan(cfg, stages, variables)
    mesh = make_pp_mesh(stages, data=data)
    state = create_pp_train_state(plan, mesh, variables, train_cfg)
    step = make_pp_train_step(
        plan, loss_cfg, mesh, microbatches=micro, data_axis="data",
        donate=False,
    )
    new_state, loss = step(state, batch)

    assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)

    mu = new_state.opt_state[0].mu
    grad_vars = stacks_to_variables(
        plan, mu / (1.0 - 0.9), jnp.zeros_like(new_state.sstack)
    )
    flat_ref = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    }
    flat_pp = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(
            grad_vars["params"]
        )[0]
    }
    assert set(flat_ref) == set(flat_pp)
    for k in flat_ref:
        # Same two noise sources as the 1-D PP gradient check above.
        np.testing.assert_allclose(
            np.asarray(flat_pp[k]), np.asarray(flat_ref[k]),
            atol=5e-4, rtol=1e-2, err_msg=k,
        )

    pp_stats = stacks_to_variables(
        plan, new_state.pstack, new_state.sstack
    )["batch_stats"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        ref_stats, pp_stats,
    )


def test_pick_microbatches_row_divisor():
    from lpdnet_tpu.parallel.pp import pick_microbatches

    # 24 rows, 2 stages, rows must split over 4 replicas: m=4 -> bm=6 no;
    # the smallest fitting divisor >= 4 with bm % 4 == 0 is m=6 (bm=4).
    assert pick_microbatches(24, 2, row_divisor=4) == 6
    # Below-2*stages fallback: only m=2 (bm=4) splits over 4 replicas.
    assert pick_microbatches(8, 2, row_divisor=4) == 2
    with pytest.raises(ValueError, match="multiple of 4 rows"):
        pick_microbatches(24, 2, requested=4, row_divisor=4)
    with pytest.raises(ValueError, match="cannot split"):
        pick_microbatches(6, 2, row_divisor=4)
    # min_rows=2 (the train pick): 1-row-per-replica microbatches zero
    # batch-axis BNs, so m=8 (bm=2, 1 row/replica) must be rejected in
    # favor of m=4 (bm=4, 2 rows/replica).
    assert pick_microbatches(16, 4, row_divisor=2, min_rows=2) == 4
    with pytest.raises(ValueError, match="rows per replica"):
        pick_microbatches(16, 4, requested=8, row_divisor=2, min_rows=2)


def test_pp_train_step_rejects_single_row_microbatches(bits):
    """A train-mode forward over one submap zeroes every batch-axis BN
    (verified on the monolithic model), silently collapsing descriptors —
    the step must fail loud instead."""
    cfg, model, variables, _ = bits
    plan = build_plan(cfg, 2, variables)
    mesh = make_pp_mesh(2, data=2)
    state = create_pp_train_state(plan, mesh, variables, TrainConfig())
    step = make_pp_train_step(
        plan, LossConfig(), mesh, microbatches=8, data_axis="data",
        donate=False,
    )
    with pytest.raises(ValueError, match="single\\s+submap"):
        step(state, _tuple_batch(b=2))


@pytest.mark.slow
def test_pp_train_step_learns_pointnetvlad():
    """The baseline-trunk pipeline trains: finite falling loss through
    the staged schedule's BN-mutating branches."""
    cfg = ModelConfig(
        trunk="pointnetvlad", num_points=N, feature_dim=64,
        num_clusters=8, output_dim=32,
    )
    model, variables = init_model(cfg, jax.random.key(2), batch_size=1)
    loss_cfg = LossConfig(lazy=True)
    train_cfg = TrainConfig(
        batch_num_queries=2, positives_per_query=2, negatives_per_query=4,
        base_learning_rate=1e-3, loss=loss_cfg,
    )
    plan = build_plan(cfg, 3, variables)
    mesh = make_pp_mesh(3)
    state = create_pp_train_state(plan, mesh, variables, train_cfg)
    step = make_pp_train_step(plan, loss_cfg, mesh, microbatches=4)
    batch = _tuple_batch(b=2)
    losses = []
    for _ in range(4):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_pp_train_step_learns(bits):
    cfg, model, variables, _ = bits
    loss_cfg = LossConfig(lazy=True)
    train_cfg = TrainConfig(
        batch_num_queries=2, positives_per_query=2, negatives_per_query=4,
        base_learning_rate=1e-3, loss=loss_cfg,
    )
    plan = build_plan(cfg, 2, variables)
    mesh = make_pp_mesh(2)
    state = create_pp_train_state(plan, mesh, variables, train_cfg)
    step = make_pp_train_step(plan, loss_cfg, mesh, microbatches=2)
    batch = _tuple_batch(b=2)
    losses = []
    for _ in range(5):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5
    # The stacks really live stage-sharded on the mesh.
    assert len(state.pstack.sharding.device_set) == 2
