"""Device ops: the performance-critical algorithms of the reference rebuilt as
batched XLA/Pallas primitives (SURVEY §2 "First-class TPU counterparts").

- ``eigen``      closed-form symmetric 3x3 / 2x2 eigensolvers (no ``eigh``)
- ``pairwise``   squared pairwise distances via one matmul
- ``knn``        blockwise kNN: tiled distances + streaming top-k
- ``gather``     neighbor feature gather for graph ops
- ``features``   the handcrafted 10-D eigen-feature stage, batched
- ``edgeconv``   DGCNN-style edge features + max aggregation helpers
- ``netvlad``    functional NetVLAD soft-assignment/residual core
- ``morton``     Z-order spatial sort (windowed-kNN locality)
"""

from lpdnet_tpu.ops.eigen import eigvals_sym3x3, eigvals_sym2x2, smallest_eigvec_sym3x3
from lpdnet_tpu.ops.pairwise import pairwise_sqdist
from lpdnet_tpu.ops.knn import knn_indices, knn_indices_and_dists
from lpdnet_tpu.ops.lse import knn_lse_aggregate
from lpdnet_tpu.ops.gather import gather_neighbors
from lpdnet_tpu.ops.features import (
    eigen_features,
    eigen_features_and_knn,
    attach_features,
)
from lpdnet_tpu.ops.edgeconv import edge_features
from lpdnet_tpu.ops.netvlad import netvlad_aggregate
from lpdnet_tpu.ops.morton import morton_codes, morton_sort

__all__ = [
    "morton_codes",
    "morton_sort",
    "eigvals_sym3x3",
    "eigvals_sym2x2",
    "smallest_eigvec_sym3x3",
    "pairwise_sqdist",
    "knn_indices",
    "knn_indices_and_dists",
    "knn_lse_aggregate",
    "gather_neighbors",
    "eigen_features",
    "eigen_features_and_knn",
    "attach_features",
    "edge_features",
    "netvlad_aggregate",
]
