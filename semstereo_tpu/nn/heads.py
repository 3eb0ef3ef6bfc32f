"""Prediction heads: segmentation head, semantic-gated volume attention,
Semantic Super-Resolution disparity upsampling.

Re-designs /root/reference/models/submodule.py:31-52 (segmenthead),
/root/reference/models/SemStereo.py:89-103 (channelAtt) and
/root/reference/models/submodule.py:412-431 (SSR_upsample) in channels-last
linen.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from semstereo_tpu.nn.layers import BasicConv, TorchConv, batch_norm
from semstereo_tpu.ops.resize import resize_bilinear


class SegmentHead(nn.Module):
    """BasicConv 3x3 -> 1x1 logits -> bilinear x scale_factor."""

    interplanes: int
    num_classes: int
    scale_factor: int | None = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv(self.interplanes, 3, padding=1, name="conv1")(x, train)
        out = TorchConv(self.num_classes, 1, padding=0, use_bias=True, name="conv2")(x)
        if self.scale_factor is not None:
            h, w = x.shape[1] * self.scale_factor, x.shape[2] * self.scale_factor
            out = resize_bilinear(out, (h, w))
        return out


class ChannelAtt(nn.Module):
    """Semantic/feature-guided cost-volume gating: 2-D features -> sigmoid
    channel attention broadcast over the disparity axis."""

    cv_channels: int

    @nn.compact
    def __call__(self, cv, im, train: bool = False):
        # cv: [B, D, H, W, Cv], im: [B, H, W, Ci]
        a = BasicConv(im.shape[-1] // 2, 1, padding=0, name="im_att0")(im, train)
        a = TorchConv(self.cv_channels, 1, padding=0, use_bias=True, name="im_att1")(a)
        return jax.nn.sigmoid(a)[:, None] * cv


class SSRUpsample(nn.Module):
    """Semantic Super-Resolution upsample: bilinear x4 of the coarse disparity
    plus a residual gated by the predicted semantics and the spx weights."""

    num_classes: int

    @nn.compact
    def __call__(self, depth_low, spx_weights, pred_label, train: bool = False):
        # depth_low: [B, h, w, 1]; spx_weights, pred_label: [B, 4h, 4w, nc]
        b, h, w, _ = depth_low.shape
        label_prob = jax.nn.softmax(pred_label, axis=-1)
        depth_up = resize_bilinear(depth_low, (h * 4, w * 4))

        d = batch_norm(train, name="conv_bn0")(depth_up)
        d = TorchConv(self.num_classes, 3, padding=1, use_bias=True, name="conv")(d)
        d = batch_norm(train, name="conv_bn1")(d)

        p = TorchConv(self.num_classes, 1, use_bias=True, name="conv1")(
            label_prob * spx_weights
        )
        p = jax.nn.sigmoid(batch_norm(train, name="conv1_bn")(p))
        p = TorchConv(self.num_classes, 1, use_bias=True, name="conv2")(p * spx_weights)
        p = jax.nn.sigmoid(batch_norm(train, name="conv2_bn")(p))

        res = TorchConv(1, 1, use_bias=True, name="conv3")(d * p)
        return (depth_up + res)[..., 0]  # [B, 4h, 4w]
