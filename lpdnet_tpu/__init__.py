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
from lpdnet_tpu.configs import Config, PRESETS, apply_overrides  # noqa: F401


def __getattr__(name):
    """Lazy convenience exports (keep `import lpdnet_tpu` light — the model
    stack pulls in flax/optax)."""
    if name in ("DescriptorNet", "build_model", "init_model"):
        from lpdnet_tpu.models import model as _m

        return getattr(_m, name)
    if name == "DescriptorIndex":
        from lpdnet_tpu.serve import DescriptorIndex

        return DescriptorIndex
    if name in ("make_train_step", "make_embed_fn"):
        from lpdnet_tpu.train import step as _s

        return getattr(_s, name)
    if name == "run_training":
        # NOTE: not exported as "train" — that name is the subpackage, and
        # the import inside this function would permanently shadow it.
        from lpdnet_tpu.train.loop import train

        return train
    if name == "evaluate_model":
        from lpdnet_tpu.eval.evaluate import evaluate_model

        return evaluate_model
    raise AttributeError(f"module 'lpdnet_tpu' has no attribute {name!r}")
