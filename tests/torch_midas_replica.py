"""Torch replica of the hub MiDaS_small model (midas_v21_small_256).

Reconstructs the exact module tree / state_dict key schema the reference
loads via torch.hub (`flowmap/model/backbone/backbone_midas.py:50-56`):
timm tf_efficientnet_lite3 encoder wrapped as `pretrained.layer{1-4}`
Sequentials + the MiDaS scratch decoder. Used as the ORACLE for the weight
converter (tests/test_torch_convert.py): random weights, eval mode, output
must match the converted JAX forward. Zero-egress image: the real
checkpoint cannot be downloaded, so schema + numerics are validated against
this replica instead (the key names follow timm/MiDaS sources).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class Conv2dSame(nn.Conv2d):
    """TF-style 'SAME' padding (timm tf_ variants): asymmetric, more on
    the bottom/right for even sizes."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(
            x, self.weight, self.bias, self.stride, 0, self.dilation, self.groups
        )


def _bn(c):
    return nn.BatchNorm2d(c, eps=1e-3)


class InvertedResidual(nn.Module):
    """timm EfficientNet block (lite: no squeeze-excite), key schema
    conv_pw/bn1/conv_dw/bn2/conv_pwl/bn3."""

    def __init__(self, cin, cout, expand, kernel, stride):
        super().__init__()
        mid = cin * expand
        self.has_expansion = expand != 1
        if self.has_expansion:
            self.conv_pw = Conv2dSame(cin, mid, 1, bias=False)
            self.bn1 = _bn(mid)
            self.conv_dw = Conv2dSame(
                mid, mid, kernel, stride=stride, groups=mid, bias=False
            )
            self.bn2 = _bn(mid)
            self.conv_pwl = Conv2dSame(mid, cout, 1, bias=False)
            self.bn3 = _bn(cout)
        else:
            # DepthwiseSeparableConv schema: conv_dw/bn1 + conv_pw/bn2.
            self.conv_dw = Conv2dSame(
                cin, cin, kernel, stride=stride, groups=cin, bias=False
            )
            self.bn1 = _bn(cin)
            self.conv_pw = Conv2dSame(cin, cout, 1, bias=False)
            self.bn2 = _bn(cout)
        self.use_residual = stride == 1 and cin == cout

    def forward(self, x):
        shortcut = x
        if self.has_expansion:
            x = F.relu6(self.bn1(self.conv_pw(x)))
            x = F.relu6(self.bn2(self.conv_dw(x)))
            x = self.bn3(self.conv_pwl(x))
        else:
            x = F.relu6(self.bn1(self.conv_dw(x)))
            x = self.bn2(self.conv_pw(x))
        if self.use_residual:
            x = x + shortcut
        return x


_LITE3_STAGES = [
    (1, 24, 1, 1, 3),
    (6, 32, 3, 2, 3),
    (6, 48, 3, 2, 5),
    (6, 96, 5, 2, 3),
    (6, 136, 5, 1, 5),
    (6, 232, 6, 2, 5),
    (6, 384, 1, 1, 3),
]


def _make_stage(cin, spec):
    expand, cout, repeats, stride, kernel = spec
    blocks = []
    for r in range(repeats):
        blocks.append(
            InvertedResidual(cin, cout, expand, kernel, stride if r == 0 else 1)
        )
        cin = cout
    return nn.Sequential(*blocks), cout


class Pretrained(nn.Module):
    """MiDaS wrapper layout: layer1 = stem + stages 0-1, layer2 = stage 2,
    layer3 = stages 3-4, layer4 = stages 5-6 (taps at 32/48/136/384 ch)."""

    def __init__(self):
        super().__init__()
        stem_conv = Conv2dSame(3, 32, 3, stride=2, bias=False)
        stem_bn = _bn(32)
        stem_act = nn.ReLU6(inplace=False)
        s0, c = _make_stage(32, _LITE3_STAGES[0])
        s1, c = _make_stage(c, _LITE3_STAGES[1])
        self.layer1 = nn.Sequential(stem_conv, stem_bn, stem_act, s0, s1)
        s2, c = _make_stage(c, _LITE3_STAGES[2])
        self.layer2 = nn.Sequential(s2)
        s3, c = _make_stage(c, _LITE3_STAGES[3])
        s4, c = _make_stage(c, _LITE3_STAGES[4])
        self.layer3 = nn.Sequential(s3, s4)
        s5, c = _make_stage(c, _LITE3_STAGES[5])
        s6, c = _make_stage(c, _LITE3_STAGES[6])
        self.layer4 = nn.Sequential(s5, s6)

    def forward(self, x):
        l1 = self.layer1(x)
        l2 = self.layer2(l1)
        l3 = self.layer3(l2)
        l4 = self.layer4(l3)
        return l1, l2, l3, l4


class ResidualConvUnit(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, padding=1)
        self.conv2 = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        out = self.conv1(F.relu(x))
        out = self.conv2(F.relu(out))
        return x + out


class FeatureFusionBlock(nn.Module):
    def __init__(self, c, c_out):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnit(c)
        self.resConfUnit2 = ResidualConvUnit(c)
        self.out_conv = nn.Conv2d(c, c_out, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(
            x, scale_factor=2, mode="bilinear", align_corners=True
        )
        return self.out_conv(x)


class Scratch(nn.Module):
    def __init__(self):
        super().__init__()
        taps = (32, 48, 136, 384)
        widths = (64, 128, 256, 512)
        for i in range(4):
            self.add_module(
                f"layer{i + 1}_rn",
                nn.Conv2d(taps[i], widths[i], 3, padding=1, bias=False),
            )
        self.refinenet4 = FeatureFusionBlock(512, 256)
        self.refinenet3 = FeatureFusionBlock(256, 128)
        self.refinenet2 = FeatureFusionBlock(128, 64)
        self.refinenet1 = FeatureFusionBlock(64, 64)
        self.output_conv = nn.Sequential(
            nn.Conv2d(64, 32, 3, padding=1),
            # Upstream MiDaS `blocks.py` Interpolate defaults
            # align_corners=False and output_conv does not override it (the
            # FeatureFusion upsamples pass True explicitly).
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False),
            nn.Conv2d(32, 32, 3, padding=1),
            nn.ReLU(False),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(False),
        )


class MidasSmallTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.pretrained = Pretrained()
        self.scratch = Scratch()

    def forward(self, x, split_head: bool = True):
        l1, l2, l3, l4 = self.pretrained(x)
        s = self.scratch
        r4 = s.refinenet4(s.layer4_rn(l4))
        r3 = s.refinenet3(r4, s.layer3_rn(l3))
        r2 = s.refinenet2(r3, s.layer2_rn(l2))
        r1 = s.refinenet1(r2, s.layer1_rn(l1))
        head = s.output_conv(r1)
        return head[:, 0], r1
