"""Pallas TPU kernels for the hot ops (SURVEY §7: kNN/top-k and neighbour
gather dominate the submaps/sec budget). Each kernel has a pure-XLA
equivalent in ``lpdnet_tpu.ops`` used as its correctness oracle and as the
portable fallback."""

from lpdnet_tpu.ops.pallas.gather_mxu import gather_neighbors_mxu
from lpdnet_tpu.ops.pallas.edge_gather import edge_max_gather

__all__ = ["gather_neighbors_mxu", "edge_max_gather"]
