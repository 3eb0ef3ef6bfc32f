"""Load the PyTorch reference (/root/reference) as a numerical oracle.

The reference imports ``timm`` (pretrained MobileViTv2 backbone,
/root/reference/models/SemStereo.py:37) and ``torchvision`` (TB image grids),
neither of which is installed here.  This module injects:

  * a fake ``timm`` whose ``create_model('mobilevitv2_100', features_only=True)``
    returns a from-scratch torch MobileViTv2-1.0 implementing exactly the
    architecture of ``semstereo_tpu.nn.backbone`` with timm's byobnet module
    naming (stem/stages_i, conv1_1x1/conv2_kxk/conv3_1x1, conv_kxk/conv_1x1/
    transformer.N/norm/conv_proj) so ``utils.timm_convert`` key mapping is
    exercised end-to-end;
  * a no-op ``torchvision`` stub.

Used by tests/test_model_parity_torch.py for full-graph parity and by
tests/test_backbone_convert.py for leaf-complete conversion checks.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvNormAct(nn.Module):
    """timm ConvNormAct: .conv + .bn (+ SiLU)."""

    def __init__(self, cin, cout, k=1, stride=1, groups=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, k // 2, groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.silu(x) if self.act else x


class BottleneckBlock(nn.Module):
    """timm byobnet bottleneck with bottle_in semantics (mid = cin * 2):
    conv1_1x1 -> conv2_kxk (depthwise, stride) -> conv3_1x1 (linear)."""

    def __init__(self, cin, cout, stride=1, expand=2):
        super().__init__()
        mid = cin * expand
        self.conv1_1x1 = ConvNormAct(cin, mid, 1)
        self.conv2_kxk = ConvNormAct(mid, mid, 3, stride=stride, groups=mid)
        self.conv3_1x1 = ConvNormAct(mid, cout, 1, act=False)
        self.residual = stride == 1 and cin == cout

    def forward(self, x):
        y = self.conv3_1x1(self.conv2_kxk(self.conv1_1x1(x)))
        return x + y if self.residual else y


class LinearSelfAttention(nn.Module):
    """MobileViTv2 separable self-attention on [B, C, P, N] (timm naming)."""

    def __init__(self, dim):
        super().__init__()
        self.qkv_proj = nn.Conv2d(dim, 1 + 2 * dim, 1, bias=True)
        self.out_proj = nn.Conv2d(dim, dim, 1, bias=True)
        self.dim = dim

    def forward(self, x):
        qkv = self.qkv_proj(x)
        q, k, v = torch.split(qkv, [1, self.dim, self.dim], dim=1)
        scores = F.softmax(q, dim=-1)  # over tokens N
        context = (k * scores).sum(dim=-1, keepdim=True)
        return self.out_proj(F.relu(v) * context)


class LinearTransformerBlock(nn.Module):
    def __init__(self, dim, ffn_mult=2):
        super().__init__()
        self.norm1 = nn.GroupNorm(1, dim)
        self.attn = LinearSelfAttention(dim)
        self.norm2 = nn.GroupNorm(1, dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Conv2d(dim, ffn_mult * dim, 1)
        self.mlp.fc2 = nn.Conv2d(ffn_mult * dim, dim, 1)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        y = self.mlp.fc2(F.silu(self.mlp.fc1(self.norm2(x))))
        return x + y


class MobileVitV2Block(nn.Module):
    def __init__(self, cin, dim, depth, patch=(2, 2)):
        super().__init__()
        self.patch = patch
        self.conv_kxk = ConvNormAct(cin, cin, 3, groups=cin)
        self.conv_1x1 = nn.Conv2d(cin, dim, 1, bias=False)
        self.transformer = nn.Sequential(*[LinearTransformerBlock(dim) for _ in range(depth)])
        self.norm = nn.GroupNorm(1, dim)
        self.conv_proj = ConvNormAct(dim, cin, 1, act=False)

    def forward(self, x):
        b, c, h0, w0 = x.shape
        ph, pw = self.patch
        y = self.conv_1x1(self.conv_kxk(x))
        pad_b, pad_r = (-h0) % ph, (-w0) % pw
        if pad_b or pad_r:
            y = F.pad(y, (0, pad_r, 0, pad_b))
        h, w = h0 + pad_b, w0 + pad_r
        d = y.shape[1]
        # unfold -> [B, dim, P, N], P in (pi, pj) row-major, N in (hi, wj) row-major
        y = y.reshape(b, d, h // ph, ph, w // pw, pw)
        y = y.permute(0, 1, 3, 5, 2, 4).reshape(b, d, ph * pw, (h // ph) * (w // pw))
        y = self.norm(self.transformer(y))
        y = y.reshape(b, d, ph, pw, h // ph, w // pw)
        y = y.permute(0, 1, 4, 2, 5, 3).reshape(b, d, h, w)
        if pad_b or pad_r:
            y = y[:, :, :h0, :w0]
        return self.conv_proj(y)


class FakeTimmMobileViTv2(nn.Module):
    """features_only surface used by the reference Feature wrapper
    (/root/reference/models/SemStereo.py:37-45): .stem + .stages_0..4."""

    def __init__(self):
        super().__init__()
        c = (64, 128, 256, 384, 512)
        self.stem = ConvNormAct(3, 32, 3, stride=2)
        self.stages_0 = nn.Sequential(BottleneckBlock(32, c[0], 1))
        self.stages_1 = nn.Sequential(
            BottleneckBlock(c[0], c[1], 2), BottleneckBlock(c[1], c[1], 1)
        )
        self.stages_2 = nn.Sequential(
            BottleneckBlock(c[1], c[2], 2), MobileVitV2Block(c[2], 128, 2)
        )
        self.stages_3 = nn.Sequential(
            BottleneckBlock(c[2], c[3], 2), MobileVitV2Block(c[3], 192, 4)
        )
        self.stages_4 = nn.Sequential(
            BottleneckBlock(c[3], c[4], 2), MobileVitV2Block(c[4], 256, 3)
        )


def install_stubs():
    """Install fake timm/torchvision into sys.modules (idempotent)."""
    if "timm" not in sys.modules or not getattr(sys.modules["timm"], "_semstereo_fake", False):
        timm = types.ModuleType("timm")
        timm._semstereo_fake = True

        def create_model(name, pretrained=False, features_only=False, **kw):
            assert name == "mobilevitv2_100", name
            return FakeTimmMobileViTv2()

        timm.create_model = create_model
        sys.modules["timm"] = timm
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu


def load_reference_semstereo(**kwargs):
    """Import the reference package (with stubs) and build its SemStereo.

    kwargs forward to the reference constructor
    (maxdisp, att_weights_only, seg_if, stereo_if, num_classes)."""
    install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models import SemStereo as TorchSemStereo  # noqa: PLC0415

    torch.manual_seed(0)
    return TorchSemStereo(
        kwargs.get("maxdisp", 64),
        kwargs.get("att_weights_only", False),
        kwargs.get("seg_if", True),
        kwargs.get("stereo_if", True),
        kwargs.get("num_classes", 6),
    )
