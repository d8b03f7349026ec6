"""Flax (linen) model zoo — NHWC, bf16-compute / fp32-param policy.

Components (reference parity targets cited in each module):
  common.py   ConvBlock / DepthwiseConvBlock / Bottleneck / C2f
  backbone.py ConvNeXt-Tiny feature extractor (strides 8/16/32) + C2f adapters
  bifpn.py    BiFPN neck with ELU-normalised learned fusion weights
  heads.py    anchor-free Detect (DFL), Segment (protos + coeffs), image-cls
  model.py    MultitaskModel — v1 (detect+segment heads) and v2 (single-head)
"""

from .common import ConvBlock, DepthwiseConvBlock, Bottleneck, C2f
from .backbone import ConvNeXtTiny, ConvNeXtFeatures
from .bifpn import BiFPN, BiFPNUnit
from .heads import DetectHead, SegmentHead, Proto
from .model import MultitaskModel, ModelConfig

__all__ = [
    "ConvBlock",
    "DepthwiseConvBlock",
    "Bottleneck",
    "C2f",
    "ConvNeXtTiny",
    "ConvNeXtFeatures",
    "BiFPN",
    "BiFPNUnit",
    "DetectHead",
    "SegmentHead",
    "Proto",
    "MultitaskModel",
    "ModelConfig",
]
