"""Flax models: trunks + NetVLAD head composed into descriptor networks
(reference: ``models/PointNetVlad.py`` + LPD feature net — SURVEY C10-C13)."""

from lpdnet_tpu.models.pointnet import STN3d, PointNetFeat
from lpdnet_tpu.models.lpdnet import LPDNetFeat
from lpdnet_tpu.models.netvlad import NetVLADLoupe, GatingContext
from lpdnet_tpu.models.model import DescriptorNet, build_model

__all__ = [
    "STN3d",
    "PointNetFeat",
    "LPDNetFeat",
    "NetVLADLoupe",
    "GatingContext",
    "DescriptorNet",
    "build_model",
]
