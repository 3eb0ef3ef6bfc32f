"""Linen layer library: conv blocks, windowed 3-D attention, hourglass
aggregation, heads, and the MobileViTv2 backbone."""

from semstereo_tpu.nn.attention import WindowedAttention3D
from semstereo_tpu.nn.backbone import MobileViTv2Backbone
from semstereo_tpu.nn.heads import ChannelAtt, SegmentHead, SSRUpsample
from semstereo_tpu.nn.hourglass import Classifier3D, Hourglass3D
from semstereo_tpu.nn.layers import (
    BasicConv,
    Conv2x,
    ConvBn,
    TorchConv,
    TorchConvTranspose,
    batch_norm,
)

__all__ = [
    "WindowedAttention3D",
    "MobileViTv2Backbone",
    "ChannelAtt",
    "SegmentHead",
    "SSRUpsample",
    "Classifier3D",
    "Hourglass3D",
    "BasicConv",
    "Conv2x",
    "ConvBn",
    "TorchConv",
    "TorchConvTranspose",
    "batch_norm",
]
