"""3-D conv hourglass cost aggregation with windowed attention bottleneck.

Re-design of /root/reference/models/SemStereo.py:106-182 (hourglass /
hourglass2 differ only in the attention window depth: (4,4,4) vs (6,4,4)).
Volumes are [B, D, H, W, C]; convs are NDHWC ``conv_general_dilated`` which
XLA lowers to MXU-tiled implicit GEMMs; transposed convs use torch geometry
(k3 s2 p1 op1 => exact x2 upsample).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax.numpy as jnp

from semstereo_tpu.nn.attention import WindowedAttention3D
from semstereo_tpu.nn.layers import BasicConv, ConvBn, TorchConv
from semstereo_tpu.ops.convops import (
    classifier_head_fused,
    classifier_head_fused_v2,
)


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
    """convbn_3d + ReLU + 1-channel 3x3x3 conv (reference classif/classif_att_).

    Eval default: the v2 fused chain (SEMSTEREO_FUSED_CLASSIFIER=2) — conv0
    stays the D-tiled fold and conv1 the full-D fold, but the unfold+refold
    transposes between them are COMPOSED into one relayout and conv1 uses
    the truncated-band kernel (no D-pad copy).  Whole-model A/B at the
    flagship shape (r5, interleaved x2): v2 19.12/19.10 pairs/s vs 18.89/
    18.89 per-conv (+1.2%).  The v1 variant (=1: group-local conv1 with
    halo channel-concats) measured 18.33/18.31 — the concats cost more than
    the transposes they remove — and stays opt-in for the record.
    SEMSTEREO_FUSED_CLASSIFIER=0 restores the per-conv dispatch."""

    channels: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv0 = BasicConv(self.channels, 3, stride=1, padding=1, dims=3, name="conv0")
        conv1 = TorchConv(1, 3, stride=1, padding=1, dims=3, use_bias=False, name="conv1")
        mode = os.environ.get("SEMSTEREO_FUSED_CLASSIFIER", "2")
        fused = not train and x.shape[1] % 4 == 0 and mode in ("1", "2")
        if not fused:
            return conv1(conv0(x, train))
        # Materialize the identical param tree without running the modular
        # path: eval-mode calls on a dummy mutate nothing and the dead conv
        # is DCE'd by XLA.
        dummy = jnp.zeros((1, 4, 4, 4, x.shape[-1]), x.dtype)
        conv1(conv0(dummy, False))
        p0 = self.get_variable("params", "conv0")
        bs0 = self.get_variable("batch_stats", "conv0")
        k1 = self.get_variable("params", "conv1")["kernel"]
        # BN affine fold (eval running stats; flax BatchNorm eps 1e-5)
        var = bs0["bn"]["var"].astype(jnp.float32)
        mean = bs0["bn"]["mean"].astype(jnp.float32)
        s = p0["bn"]["scale"].astype(jnp.float32) / jnp.sqrt(var + 1e-5)
        b = p0["bn"]["bias"].astype(jnp.float32) - mean * s
        fn = classifier_head_fused if mode == "1" else classifier_head_fused_v2
        return fn(x, p0["conv"]["kernel"], s, b, k1)
