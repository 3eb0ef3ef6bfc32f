"""3-D conv hourglass cost aggregation with windowed attention bottleneck.

Re-design of /root/reference/models/SemStereo.py:106-182 (hourglass /
hourglass2 differ only in the attention window depth: (4,4,4) vs (6,4,4)).
Volumes are [B, D, H, W, C]; convs are NDHWC ``conv_general_dilated`` which
XLA lowers to MXU-tiled implicit GEMMs; transposed convs use torch geometry
(k3 s2 p1 op1 => exact x2 upsample).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from semstereo_tpu.nn.attention import WindowedAttention3D
from semstereo_tpu.nn.layers import BasicConv, ConvBn, TorchConv


class Hourglass3D(nn.Module):
    channels: int = 32
    att_window: tuple[int, int, int] = (4, 4, 4)
    num_heads: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        conv1 = BasicConv(c * 2, 3, stride=2, padding=1, dims=3, name="conv1")(x, train)
        conv2 = BasicConv(c * 2, 3, stride=1, padding=1, dims=3, name="conv2")(conv1, train)
        conv3 = BasicConv(c * 4, 3, stride=2, padding=1, dims=3, name="conv3")(conv2, train)
        conv4 = BasicConv(c * 4, 3, stride=1, padding=1, dims=3, name="conv4")(conv3, train)
        conv4 = WindowedAttention3D(self.num_heads, self.att_window, name="attention")(conv4)

        up5 = BasicConv(
            c * 2, 3, stride=2, padding=1, dims=3, deconv=True, output_padding=1,
            relu=False, name="conv5",
        )(conv4, train)
        redir2 = ConvBn(c * 2, 1, padding=0, dims=3, name="redir2")(conv2, train)
        conv5 = nn.relu(up5 + redir2)

        up6 = BasicConv(
            c, 3, stride=2, padding=1, dims=3, deconv=True, output_padding=1,
            relu=False, name="conv6",
        )(conv5, train)
        redir1 = ConvBn(c, 1, padding=0, dims=3, name="redir1")(x, train)
        return nn.relu(up6 + redir1)


class Classifier3D(nn.Module):
    """convbn_3d + ReLU + 1-channel 3x3x3 conv (reference classif/classif_att_)."""

    channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv(self.channels, 3, stride=1, padding=1, dims=3, name="conv0")(x, train)
        return TorchConv(1, 3, stride=1, padding=1, dims=3, use_bias=False, name="conv1")(x)
