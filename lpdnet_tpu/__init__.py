"""lpdnet_tpu — TPU-native point-cloud place recognition.

A brand-new JAX / XLA / Pallas framework with the capabilities of the
PyTorch reference ``qiaozhijian/LPD-Net-Pytorch`` (see SURVEY.md): global
submap descriptors for large-scale LiDAR place recognition on the Oxford
RobotCar benchmark, trained with a lazy quadruplet loss and hard-negative
remining.

Design stance (SURVEY.md §7):
  * everything device-side is pure-functional JAX; batch-first ``(B, N, C)``
    shapes (the reference's ``(B, 1, N, C)`` quirk lives only in compat shims);
  * the reference's per-submap NumPy handcrafted-feature stage (reference:
    ``loading_pointclouds.py`` / prep script — SURVEY C4) is a batched,
    jitted device op built on a closed-form 3x3 symmetric eigensolver;
  * kNN graphs (reference: ``models`` ``knn``/``get_graph_feature`` — SURVEY
    C11) are blockwise pairwise-distance + top-k, with a Pallas TPU kernel
    on the hot path and a pure-XLA fallback used as a correctness oracle;
  * parallelism is ``jax.sharding.Mesh`` + ``NamedSharding`` data parallelism
    (replacing the reference's ``nn.DataParallel`` — SURVEY C20/C21).
"""

__version__ = "0.1.0"

from lpdnet_tpu import configs  # noqa: F401
