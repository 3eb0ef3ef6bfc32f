"""MobileViTv2 feature backbone (width 1.0), implemented from the paper spec
("Separable Self-attention for Mobile Vision Transformers", arXiv:2206.02680).

The reference wraps timm's pretrained ``mobilevitv2_100`` in features_only
mode (/root/reference/models/SemStereo.py:33-56) producing a pyramid at
strides /2../32 with channels [64, 128, 256, 384, 512].  This is a fresh JAX
implementation of the same architecture: a conv stem, MobileNetV2 inverted
residuals, and MobileViTv2 blocks whose separable (linear-complexity)
self-attention contracts over the token axis with a single softmax-weighted
sum — an einsum that maps straight onto the TPU MXU/VPU.

Weights train from scratch by default; ``semstereo_tpu.utils.timm_convert``
can import a torch ``mobilevitv2_100`` checkpoint when one is available.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from semstereo_tpu.nn.layers import TorchConv, batch_norm


class ConvNormAct(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel_size // 2
        x = TorchConv(
            self.features,
            self.kernel_size,
            self.stride,
            pad,
            groups=self.groups,
            use_bias=False,
            name="conv",
        )(x)
        x = batch_norm(train, name="bn")(x)
        return nn.silu(x) if self.act else x


class InvertedResidual(nn.Module):
    """MobileNetV2 block, expansion 2, SiLU."""

    features: int
    stride: int = 1
    expand: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = cin * self.expand
        y = ConvNormAct(mid, 1, name="expand")(x, train)
        y = ConvNormAct(mid, 3, stride=self.stride, groups=mid, name="dw")(y, train)
        y = ConvNormAct(self.features, 1, act=False, name="project")(y, train)
        if self.stride == 1 and cin == self.features:
            y = y + x
        return y


class SeparableSelfAttention(nn.Module):
    """Linear self-attention: softmax context scores over the token axis,
    broadcast context vector, ReLU-gated values.  x: [B, P, N, C]."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        qkv = nn.Dense(1 + 2 * c, use_bias=True, name="qkv")(x)
        q, k, v = qkv[..., :1], qkv[..., 1 : 1 + c], qkv[..., 1 + c :]
        scores = jax.nn.softmax(q, axis=2)  # over tokens N
        context = jnp.sum(k * scores, axis=2, keepdims=True)  # [B, P, 1, C]
        out = nn.relu(v) * context
        return nn.Dense(c, use_bias=True, name="proj")(out)


class LinearTransformerBlock(nn.Module):
    ffn_mult: int = 2

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.GroupNorm(num_groups=1, name="norm1")(x)
        x = x + SeparableSelfAttention(name="attn")(y)
        y = nn.GroupNorm(num_groups=1, name="norm2")(x)
        y = nn.Dense(self.ffn_mult * c, name="ffn1")(y)
        y = nn.Dense(c, name="ffn2")(nn.silu(y))
        return x + y


class MobileViTv2Block(nn.Module):
    dim: int
    depth: int
    patch: tuple[int, int] = (2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h0, w0, c = x.shape
        ph, pw = self.patch
        # local representation: depthwise 3x3 + 1x1 projection to dim
        y = ConvNormAct(c, 3, groups=c, name="local_dw")(x, train)
        y = TorchConv(self.dim, 1, use_bias=False, name="local_proj")(y)

        pad_b, pad_r = (-h0) % ph, (-w0) % pw
        h, w = h0 + pad_b, w0 + pad_r
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        # unfold to [B, P, N, dim]: P = patch cells, N = patches
        y = y.reshape(b, h // ph, ph, w // pw, pw, self.dim)
        y = y.transpose(0, 2, 4, 1, 3, 5).reshape(b, ph * pw, (h // ph) * (w // pw), self.dim)

        for i in range(self.depth):
            y = LinearTransformerBlock(name=f"block{i}")(y)
        y = nn.GroupNorm(num_groups=1, name="norm")(y)

        # fold back
        y = y.reshape(b, ph, pw, h // ph, w // pw, self.dim)
        y = y.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, self.dim)
        if pad_b or pad_r:
            y = y[:, :h0, :w0]
        return ConvNormAct(c, 1, act=False, name="proj_out")(y, train)


class MobileViTv2Backbone(nn.Module):
    """Returns the [/2, /4, /8, /16, /32] pyramid with channels
    [64, 128, 256, 384, 512] (width multiplier 1.0)."""

    channels: Sequence[int] = (64, 128, 256, 384, 512)
    vit_dims: Sequence[int] = (128, 192, 256)
    vit_depths: Sequence[int] = (2, 4, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        x = ConvNormAct(32, 3, stride=2, name="stem")(x, train)
        x2 = InvertedResidual(c[0], 1, name="stage0_0")(x, train)
        y = InvertedResidual(c[1], 2, name="stage1_0")(x2, train)
        x4 = InvertedResidual(c[1], 1, name="stage1_1")(y, train)
        y = InvertedResidual(c[2], 2, name="stage2_0")(x4, train)
        x8 = MobileViTv2Block(self.vit_dims[0], self.vit_depths[0], name="stage2_1")(y, train)
        y = InvertedResidual(c[3], 2, name="stage3_0")(x8, train)
        x16 = MobileViTv2Block(self.vit_dims[1], self.vit_depths[1], name="stage3_1")(y, train)
        y = InvertedResidual(c[4], 2, name="stage4_0")(x16, train)
        x32 = MobileViTv2Block(self.vit_dims[2], self.vit_depths[2], name="stage4_1")(y, train)
        return [x2, x4, x8, x16, x32]
