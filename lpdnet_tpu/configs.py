"""Frozen dataclass configuration (replaces the reference's mutable module
globals, reference: ``config.py`` — SURVEY C1).

The reference mutates import-time constants from argparse (``cfg.X = args.x``).
Here every run is described by an immutable tree of dataclasses; CLI overrides
produce a *new* config via ``dataclasses.replace``. Presets mirror the
reference's two training regimes: *baseline* (Oxford only, PointNetVLAD or
LPD trunk) and *refine* (Oxford + university/residential/business).

Reference constants (SURVEY C1, values corroborated by BASELINE.json):
``NUM_POINTS=4096``, ``FEATURE_OUTPUT_DIM=256``, ``BATCH_NUM_QUERIES=2``,
``TRAIN_POSITIVES_PER_QUERY=2``, ``TRAIN_NEGATIVES_PER_QUERY=18``,
``MARGIN_1=0.5``, ``MARGIN_2=0.2``.
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass, field
from typing import Optional, Tuple

# Once-per-process guard for the 'auto'->'lse' resolution notice below.
_AUTO_LSE_NOTICED = False


@dataclass(frozen=True)
class FeatureConfig:
    """Handcrafted 10-D eigen-feature stage (reference SURVEY C4).

    The ten features, in output order (appended after xyz -> 13-D points):
      0. change of curvature      lam3 / (lam1+lam2+lam3)
      1. omnivariance             (lam1*lam2*lam3)^(1/3)
      2. linearity                (lam1-lam2) / lam1
      3. eigenvalue entropy       -sum(e_i * ln e_i), e_i = lam_i / sum(lam)
      4. 2-D scattering           lam1_2d + lam2_2d  (xy-projected covariance)
      5. 2-D linearity            lam2_2d / lam1_2d
      6. max height difference    max(z_nbr) - min(z_nbr)
      7. height std               std(z_nbr)
      8. local point density      log1p(k / ((4/3) pi r_k^3))
      9. verticality              1 - |n_z|, n = eigvec of smallest eigenvalue
    """

    k: int = 20  # neighborhood size for the local covariance (incl. self)
    eps: float = 1e-8  # degenerate-neighborhood guard
    # Blockwise kNN tile size (query points per tile) for the feature stage
    # and the trunk graphs. 256 pairs with knn_window=128 so every candidate
    # window is block + 2w = 512, the round-4 sweep optimum on BOTH
    # aggregation paths (lse 5196 vs 4394 submaps/s at the old 512/256,
    # +18%; max 1348 vs 1322 — equal min cosine vs the exact oracle on
    # both; docs/PERF_LOG.md round 4). Power-of-two windows remain the
    # rule (the round-2 lesson: non-pow2 win 1536 lost ~13%).
    knn_block: int = 256
    # Per-neighbour recall of the approximate TPU selection (approx_min_k).
    # Descriptor fidelity is insensitive to this knob (cosine vs the 0.95
    # setting: 1.00000 at 0.9, 0.99999 at 0.8 — max-aggregation and
    # count-normalized statistics absorb swapped near-tie neighbours), and
    # selection cost falls steeply: 748 -> ~1000 -> ~1100 submaps/s at
    # 0.95 / 0.9 / 0.8 on v5e. Default 0.85.
    recall_target: float = 0.85
    # Pallas fused neighbourhood-stats kernel (phase-split selection +
    # VMEM-resident distance recompute). Measured SLOWER than the XLA
    # masked-moment scan on v5e (the split costs more fusion than the
    # kernel saves) — kept as an option for other shapes/hardware.
    fused_stats: bool = False


@dataclass(frozen=True)
class ModelConfig:
    """Model family + head (reference: ``models/PointNetVlad.py`` — SURVEY
    C10-C13)."""

    # 'pointnetvlad' = STN + shared-MLP trunk (SURVEY C10);
    # 'lpdnet' = per-point MLP + dual-graph aggregation trunk (SURVEY C11).
    trunk: str = "pointnetvlad"
    num_points: int = 4096
    # Channels of the raw input points: 3 (xyz) or 13 (xyz + 10-D features).
    input_dim: int = 3
    # Compute the 10-D features on device inside the forward pass (LPD path).
    compute_features_on_device: bool = True
    output_dim: int = 256  # FEATURE_OUTPUT_DIM
    # Trunk
    feature_dim: int = 1024  # per-point feature width fed to NetVLAD
    use_input_transform: bool = True  # STN3d 3x3 input alignment
    use_feature_transform: bool = False  # 64x64 feature alignment (off in ref)
    # LPD trunk (SURVEY C11): DGCNN-style edge convs on two graphs.
    graph_k: int = 20
    # EdgeConv BN placement: 'post' (after max aggregation, the TPU-fast
    # default — the edge tensor never reaches HBM) or 'edge' (per-edge
    # conv-BN-relu-max, the reference's literal placement).
    edge_bn_placement: str = "post"
    # NetVLAD head (SURVEY C12)
    num_clusters: int = 64
    add_batch_norm: bool = True  # BN (vs bias) on the soft-assignment logits
    # Reference bn2: unconditional BatchNorm on the NetVLAD output projection.
    post_projection_bn: bool = True
    gating: bool = True  # GatingContext on the output descriptor
    normalize_output: bool = True  # L2-normalize the final descriptor
    features: FeatureConfig = field(default_factory=FeatureConfig)
    # Numerics: bfloat16 activations on the matmul path, fp32 params/reductions.
    compute_dtype: str = "float32"
    # Pallas aligned-slab max-gather for inference EdgeConv aggregation:
    # 'auto' = on for TPU backends, off on CPU; 'on' | 'off' force it.
    pallas_gather: str = "auto"
    # Exact kNN selection everywhere (lax.top_k; slow on TPU) — for
    # fidelity audits of the approximate default.
    exact_knn: bool = False
    # Morton-window kNN (LPD trunk): sort each submap by Morton code inside
    # the forward (the model is permutation-invariant, so this is free
    # semantically) and restrict every kNN candidate scan to +-knn_window
    # sorted rows around the query block. Shrinks the HBM-bound distance/
    # mask tiles by ~N/(block+2w); measured ~96-98% neighbour recall at
    # 256-512 on submap-like clouds and descriptor cosine >= 0.9996 vs the
    # exact full scan (worst case over 64 submaps). None = full scans.
    # Degenerates to the full scan when the window covers N; disabled
    # automatically under exact_knn (the fidelity-audit path stays exact).
    # 128 with knn_block=256 keeps every candidate window at a power of two
    # (512), the round-4 sweep optimum for both aggregations
    # (docs/PERF_LOG.md; the round-2 default was 256/512 -> win 1024).
    knn_window: Optional[int] = 128
    # LPD trunk neighbour aggregation (ops/lse.py):
    #   'auto' — (default since round 4) resolves to 'lse' for the LPD
    #     trunk and 'max' (inert) for aggregation-free trunks; read the
    #     resolved value via ``resolved_aggregation``.
    #   'max' — select indices + gather + hard max (Pallas slab kernel on
    #     the hot path); the reference's literal semantics. The escape
    #     hatch for parity work and degenerate-geometry inputs (see the
    #     tie-explosion caveat in docs/PERF_LOG.md round 4).
    #   'lse' — gather-free smooth max: the selection's k-th distance masks
    #     the SAME distance tile and the aggregation becomes a masked
    #     log-sum-exp matmul on the MXU (backward = matmuls too, no custom
    #     VJP) — measured 2.7x inference / 1.7x train / 2.2x eval
    #     end-to-end over 'max' at flagship scale (docs/PERF_LOG.md round
    #     4, with the fidelity gates: flagship rehearsal converges,
    #     768-query retrieval audit at exact-oracle parity). Smooth-max
    #     bias <= ~log(k)*std_c/lse_t0 per channel. Requires
    #     edge_bn_placement='post'.
    aggregation: str = "auto"
    # Dimensionless LSE sharpness: effective temperature t0/std_c per
    # submap channel. Larger = closer to hard max, but values more than
    # ~(87 + (lse_levels-1)*64)*std_c/t0 below their block-window anchor
    # underflow (clamped at the row's own value).
    lse_t0: float = 24.0
    # Anchor levels for the LSE exp range (ops/lse.py): each extra level
    # is one more mask matmul per scan block and extends the underflow
    # horizon by 64 exponent units (~6.3 std at 2, ~9 std at 3, for the
    # default t0).
    lse_levels: int = 2
    # Per-row tie-explosion bias correction (ops/lse.py tie_correction):
    # subtract log(max(m/k, 1))/t where m is the row's mask count. On
    # tie-degenerate geometry (coplanar ground sheets — the nominal case
    # for real LiDAR submaps) the d<=kth mask keeps m >> k candidates and
    # the per-row smooth-max bias log(m)/t destroys descriptor fidelity
    # (cosine 0.64 vs 'max' measured on sheets, docs/PERF_LOG.md round
    # 4); the correction renormalizes exploded rows to the same
    # log(k)/t-class bias as normal rows and is a no-op when m <= k.
    # Stays opt-in: at the shipped 256/128 geometry (window 512, which
    # already caps m) it is a measured retrieval no-op — identical
    # recall on the hard AND ground audit worlds, cosine moved <= 1e-3
    # (PERF_LOG round 5 tie-explosion decision, world_audit.json). For
    # ground-plane-heavy deployments the reference-semantics escape
    # hatch is aggregation='max' (measured +1.4 r@1 pts on the ground
    # world, -1.4 on hard — geometry-dependent, audit-resolution-sized).
    lse_tie_correction: bool = False
    # Fused Pallas kernel for the LSE aggregation
    # (ops/pallas/lse_fused.py): the whole scan body — distance tile,
    # EXACT bf16 k-th-distance search (replacing the recall_target-0.85
    # approx_min_k), masks, level exps, both matmuls — runs in VMEM, one
    # HBM trip in and out. 'off' (default) = the XLA scan (ops/lse.py);
    # 'on' = require the kernel (config error when its static gates fail
    # — models/lpdnet.py lse_fused_enabled; CPU tests wrap the forward in
    # force_tpu_interpret_mode). The default stays 'off' as a MEASURED
    # negative for throughput (docs/PERF_LOG.md round 5: the XLA scan's
    # batched blocks beat the kernel's per-(batch, tile) grid at the
    # shipped geometry; the in-kernel exact search costs ~2.5 ms that
    # approx_min_k does for ~1.0); 'on' buys exact tie-inclusive masks —
    # no selection approximation — for ~equal feature-graph rate, the
    # audit/escape hatch when recall_target misses matter.
    lse_fused: str = "off"

    def __post_init__(self):
        if self.aggregation not in ("auto", "max", "lse"):
            raise ValueError(
                f"model.aggregation must be 'auto', 'max' or 'lse', got "
                f"{self.aggregation!r}"
            )
        if self.lse_fused not in ("off", "on"):
            raise ValueError(
                f"model.lse_fused must be 'off' or 'on', got "
                f"{self.lse_fused!r}"
            )
        if self.lse_fused == "on" and self.resolved_aggregation != "lse":
            # Catches explicit aggregation='max' AND every 'auto' case
            # that resolves away from 'lse' (non-LPD trunk, 'edge' BN
            # placement) — DescriptorNet only consults lse_fused on the
            # LSE path, so anything else would silently ignore the flag
            # and the user would audit the wrong semantics.
            raise ValueError(
                "model.lse_fused='on' is an LSE-path setting, but the "
                f"aggregation resolves to {self.resolved_aggregation!r} "
                f"(aggregation={self.aggregation!r}, trunk={self.trunk!r}, "
                f"edge_bn_placement={self.edge_bn_placement!r}); the fused "
                "kernel would never run"
            )
        if self.lse_levels < 1:
            raise ValueError(
                f"model.lse_levels must be >= 1, got {self.lse_levels}"
            )
        if self.aggregation == "lse" and self.trunk != "lpdnet":
            # The baseline PointNet trunk has no neighbour aggregation at
            # all — silently ignoring the flag would let a user believe
            # they measured/trained the LSE path when they didn't.
            raise ValueError(
                "model.aggregation='lse' is an LPD-trunk setting "
                f"(trunk={self.trunk!r} has no neighbour aggregation); "
                "use --trunk lpdnet or drop the aggregation override"
            )
        if self.aggregation == "lse" and self.edge_bn_placement == "edge":
            # 'auto' resolves this combination to 'max'; an EXPLICIT 'lse'
            # would otherwise only fail at trace time deep inside
            # EdgeConv.__call__ (advisor round-4 finding). The per-edge BN
            # needs the (B, N, k, C) edge tensor LSE never materializes.
            raise ValueError(
                "model.aggregation='lse' requires edge_bn_placement='post' "
                "(the 'edge' torch-parity placement normalizes the per-edge "
                "tensor the LSE path never materializes); drop one of the "
                "two overrides"
            )

    @property
    def effective_input_dim(self) -> int:
        if self.trunk == "lpdnet" and self.compute_features_on_device:
            return 3 + 10
        return self.input_dim

    @property
    def resolved_aggregation(self) -> str:
        """The concrete aggregation mode: 'auto' resolves per trunk at
        READ time (not construction), so trunk changes via presets /
        --trunk / --set keep the right default; explicit 'max'/'lse'
        always win. The 'edge' BN placement (the torch-parity path,
        which needs the per-edge tensor LSE never materializes) also
        resolves 'auto' to 'max'."""
        if self.aggregation != "auto":
            return self.aggregation
        if self.trunk != "lpdnet" or self.edge_bn_placement == "edge":
            return "max"
        # One-time notice (advisor round-4): 'auto'->'lse' is a deliberate
        # semantic departure from the reference's hard-max EdgeConv —
        # descriptors are smooth-max approximations (cosine >= ~0.93 vs
        # 'max' at the default t0/levels). A consumer who REBUILDS a
        # ModelConfig instead of loading a saved config.json gets this
        # silently; the log line makes mixed-version eval setups notice.
        global _AUTO_LSE_NOTICED
        if not _AUTO_LSE_NOTICED:
            _AUTO_LSE_NOTICED = True
            logging.getLogger(__name__).info(
                "model.aggregation='auto' resolved to 'lse' (gather-free "
                "smooth-max; use --set model.aggregation=max for the "
                "reference's literal hard-max semantics)"
            )
        return "lse"


@dataclass(frozen=True)
class LossConfig:
    """Lazy quadruplet loss (reference: ``loss/pointnetvlad_loss.py`` — SURVEY
    C14)."""

    kind: str = "quadruplet"  # 'quadruplet' | 'triplet'
    margin_1: float = 0.5  # MARGIN_1
    margin_2: float = 0.2  # MARGIN_2
    lazy: bool = True  # max over negatives (lazy) vs sum
    use_min: bool = False  # easiest-positive (min) vs hardest-positive (max)
    ignore_zero_loss: bool = False  # average over active tuples only


@dataclass(frozen=True)
class DataConfig:
    """Dataset artifacts (reference: ``generating_queries/*`` + pickle layout —
    SURVEY C2/C7-C9)."""

    dataset_folder: str = "benchmark_datasets"
    train_file: str = "training_queries_baseline.pickle"
    test_file: str = "test_queries_baseline.pickle"
    eval_database_file: str = "oxford_evaluation_database.pickle"
    eval_query_file: str = "oxford_evaluation_query.pickle"
    num_points: int = 4096
    # Augmentation (SURVEY C5): rotation about vertical axis + clipped jitter.
    rotation_max_deg: float = 180.0
    jitter_sigma: float = 0.005
    jitter_clip: float = 0.05
    augment_rotate: bool = True
    augment_jitter: bool = True


@dataclass(frozen=True)
class MiningConfig:
    """Hard-negative remining (reference: ``train_pointnetvlad.py``
    ``get_random_hard_negatives`` / ``TRAINING_LATENT_VECTORS`` — SURVEY C16)."""

    warmup_epochs: int = 5  # epochs of purely random negatives
    hard_negatives_per_query: int = 10  # hard picks mixed into each tuple
    # Refresh the cached full-train-set descriptors every this many queries.
    cache_refresh_queries: int = 1000
    sampled_negatives: int = 4000  # random candidate pool per query


@dataclass(frozen=True)
class TrainConfig:
    """Training driver (reference: ``train_pointnetvlad.py`` — SURVEY C15/C17)."""

    batch_num_queries: int = 2  # BATCH_NUM_QUERIES
    positives_per_query: int = 2  # TRAIN_POSITIVES_PER_QUERY
    negatives_per_query: int = 18  # TRAIN_NEGATIVES_PER_QUERY
    max_epoch: int = 20
    base_learning_rate: float = 5e-5
    decay_step: int = 200_000  # examples, exponential stair decay
    decay_rate: float = 0.7
    # Reference clips the decayed LR at 1e-5 (ADVICE round 1).
    min_learning_rate: float = 1e-5
    momentum: float = 0.9
    optimizer: str = "adam"  # 'adam' | 'momentum'
    seed: int = 0
    log_dir: str = "log"
    model_filename: str = "model.ckpt"
    resume: bool = False
    # Evaluate + checkpoint cadence (reference: per epoch).
    eval_every_epochs: int = 1
    checkpoint_every_epochs: int = 1
    # >0: ALSO async-checkpoint every N steps, carrying the exact position
    # (epoch, next batch, queries done) and the mining cache, so a crash
    # mid-epoch resumes at the exact step (SURVEY §5 failure-recovery row).
    # 0 = epoch-granular only.
    checkpoint_every_steps: int = 0
    keep_checkpoints: int = 3
    # Wire format of the per-step tuple upload (the step decodes back to
    # f32 before compute, mirroring the eval sweeps' wire — utils/wire.py):
    # 'float16' (~6e-4 quantization) or 'int16' fixed-point (~3e-5) halve
    # the host->device batch transfer. 'auto' (default) = 'int16' when
    # jitter augmentation is on (jitter sigma 5e-3 dwarfs the
    # quantization) but 'float32' when jitter is disabled, where wire
    # rounding would otherwise become the dominant input perturbation and
    # silently change training numerics (ADVICE round 2). Set explicitly
    # to force a format.
    transfer_dtype: str = "auto"
    loss: LossConfig = field(default_factory=LossConfig)
    mining: MiningConfig = field(default_factory=MiningConfig)

    @property
    def tuples_per_batch(self) -> int:
        """Submaps per training example: query + positives + negatives +
        other_neg."""
        return 1 + self.positives_per_query + self.negatives_per_query + 1


def resolve_transfer_dtype(value: str, jitter_enabled: bool) -> str:
    """Resolve TrainConfig.transfer_dtype's 'auto' sentinel: a half-size
    wire only by default when jitter augmentation already perturbs the
    inputs at >100x the int16 quantization step."""
    if value == "auto":
        return "int16" if jitter_enabled else "float32"
    return value


@dataclass(frozen=True)
class EvalConfig:
    """Retrieval benchmark (reference: ``evaluate.py`` — SURVEY C18)."""

    batch_size: int = 64  # EVAL_BATCH_SIZE (descriptor extraction)
    top_k: int = 25  # recall@1..25 curve
    output_file: str = "results.txt"
    # Wire format for descriptor-sweep uploads (eval + mining,
    # utils/wire.py): 'int8' fixed-point QUARTERS the host->device
    # transfer (the bottleneck on tunneled/slow-DMA hosts; 12 KB per
    # 4096-pt submap). Quantization ~7.8e-3 on normalized submaps is
    # measured retrieval-neutral at full scale: flagship descriptor
    # cosine >= 0.99999 vs the f32 upload (PERF_LOG round 3). 'int16'
    # (~3e-5, half-size) for audits; out-of-range batches (|x| > 2)
    # fall back to f16 with a warning. The decode to f32 precedes all
    # compute.
    transfer_dtype: str = "int8"
    # >1: chain this many batches per device dispatch via lax.scan
    # (make_embed_many_fn) — pays only on hosts with fast DMA; 0/1 =
    # per-batch dispatches with deep async pipelining (default).
    sweep_chunk: int = 0


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh data parallelism (replaces ``nn.DataParallel`` — SURVEY
    C20/C21)."""

    data_axis: str = "data"
    # None -> use all visible devices on the data axis.
    num_devices: Optional[int] = None
    # Tensor parallelism (parallel/tp.py): with model_devices > 1 the loop
    # builds a 2-D (data, model) mesh — the NetVLAD head (the parameter bulk:
    # hidden1 is K*D x output_dim) shards Megatron-style over the model axis,
    # the batch over the data axis (num_devices / model_devices wide).
    # num_clusters must be divisible by model_devices. NB: TP is a MEMORY
    # dial, not a throughput one — the trunk stays replicated, so at the
    # flagship sizes (head ~17M params, fits one chip easily) giving
    # devices to the model axis almost certainly LOSES throughput vs pure
    # DP over the same mesh; use it when the head/optimizer state does not
    # fit, or for param-heavy output_dim/cluster configs.
    model_axis: str = "model"
    model_devices: int = 1
    # How the train batch relates to the mesh:
    #   'per_device': each device carries batch_num_queries queries — the
    #     global batch scales with the mesh (what nn.DataParallel gives each
    #     replica); no chip idles.
    #   'fit': global batch stays batch_num_queries and the mesh shrinks to
    #     its largest divisor (the reference DataParallel's idling behavior).
    batch_scaling: str = "per_device"
    # Pipeline parallelism (parallel/pp.py): with pipeline_stages > 1 the
    # loop trains over a ('stage',) mesh — the lpdnet trunk's unit groups
    # one-per-device, microbatches streaming GPipe-style. Exclusive with
    # model_devices > 1 and multi-process runs; checkpoints stay in the
    # standard payload (stage stacks convert losslessly), so PP runs
    # save/restore interchangeably with every other path. At flagship
    # scale this is a capability/latency-memory trade, not a throughput
    # win (the whole replica fits one chip — see parallel/pp.py).
    pipeline_axis: str = "stage"
    pipeline_stages: int = 0
    # Microbatch COUNT for the pipelined train step; 0 -> auto (smallest
    # divisor of the flattened tuple batch >= 2*stages, keeping the GPipe
    # bubble fraction (S-1)/(m+S-1) reasonable).
    pipeline_microbatches: int = 0
    # DPxPP: with pipeline_data_replicas > 1 the loop builds a 2-D
    # (data, stage) mesh of that many data-parallel pipeline replicas —
    # microbatch rows shard over the data axis, gradients all-reduce
    # across replicas, per-device batch scaling applies (global batch =
    # batch_num_queries x replicas under 'per_device'). BatchNorm is
    # per-replica with one cross-replica stats average per step (the
    # parallel/ddp.py convention).
    pipeline_data_replicas: int = 1


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


# ---------------------------------------------------------------------------
# Presets mirroring the reference's training regimes.
# ---------------------------------------------------------------------------

def baseline_config() -> Config:
    """PointNetVLAD baseline on Oxford (reference baseline training)."""
    return Config()


def lpd_baseline_config() -> Config:
    """LPD-Net trunk on Oxford baseline tuples."""
    cfg = Config()
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, trunk="lpdnet", input_dim=3)
    )


def refine_config(trunk: str = "lpdnet") -> Config:
    """Refined training: Oxford + university/residential/business (SURVEY C8);
    positives radius 12.5 m, quadruplet loss with hard negatives."""
    cfg = Config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, trunk=trunk),
        data=dataclasses.replace(
            cfg.data,
            train_file="training_queries_refine.pickle",
            test_file="test_queries_baseline.pickle",
        ),
    )


PRESETS = {
    "baseline": baseline_config,
    "lpd_baseline": lpd_baseline_config,
    "refine": refine_config,
}


def parse_override_value(text: str):
    """Parse a CLI ``--set key=value`` value: JSON when it parses (ints,
    floats, bools, null->None, quoted strings), bare string otherwise."""
    import json

    try:
        return json.loads(text)
    except (ValueError, TypeError):
        return text


def apply_overrides(cfg: Config, **overrides) -> Config:
    """Apply dotted-path overrides, e.g. ``apply_overrides(cfg,
    **{'train.max_epoch': 5})`` — the CLI surface's replacement for the
    reference's argparse-mutates-module-globals pattern."""
    for key, value in overrides.items():
        parts = key.split(".")
        node_path = []
        node = cfg
        for p in parts[:-1]:
            node_path.append((node, p))
            node = getattr(node, p)
        node = dataclasses.replace(node, **{parts[-1]: value})
        for parent, name in reversed(node_path):
            node = dataclasses.replace(parent, **{name: node})
        cfg = node
    return cfg
