"""Host-side data layer (reference: ``loading_pointclouds.py`` +
``generating_queries/`` — SURVEY C2-C9).

Disk formats match the reference exactly (pickle dict layouts, float64
``.bin`` point files) so artifacts are interchangeable; batching/tuple
assembly produce batch-first ``(B, N, C)`` NumPy arrays ready for the
jitted device path.
"""

from lpdnet_tpu.data.pickles import get_queries_dict, get_sets_dict
from lpdnet_tpu.data.binio import load_pc_file, load_pc_files, save_pc_file
from lpdnet_tpu.data.augment import jitter_point_cloud, rotate_point_cloud
from lpdnet_tpu.data.tuples import TupleSampler, TrainingTuple

__all__ = [
    "get_queries_dict",
    "get_sets_dict",
    "load_pc_file",
    "load_pc_files",
    "save_pc_file",
    "jitter_point_cloud",
    "rotate_point_cloud",
    "TupleSampler",
    "TrainingTuple",
]
