"""Real ``torch.nn`` re-creations of the reference's module skeletons.

VERDICT r2 Weak #4: converter tests that fabricate state dicts from
hand-typed key lists can't catch key-ORDER or weight-TRANSPOSITION bugs.
These modules rebuild the reference constructors (file:line cited per
class) so tests consume genuine ``module.state_dict()`` output — and,
where the forward is cheap to mirror, compare numerics torch-vs-flax.

Only used by tests; torch (CPU) is baked into the image.
"""

from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# torchvision-style resnet18 (reference UniFuse networks/resnet.py:136-266;
# the checkpoints store exactly torchvision's key layout)
# ---------------------------------------------------------------------------

class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return F.relu(h + idt)


class TorchResNet18(nn.Module):
    """Feature-pyramid resnet18 with torchvision key names; forward taps
    the 5 levels the way reference ``networks/unifuse.py:100-126`` does."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def layer(cin, cout, stride):
            return nn.Sequential(TorchBasicBlock(cin, cout, stride),
                                 TorchBasicBlock(cout, cout, 1))

        self.layer1 = layer(64, 64, 1)
        self.layer2 = layer(64, 128, 2)
        self.layer3 = layer(128, 256, 2)
        self.layer4 = layer(256, 512, 2)

    def forward(self, x):
        f0 = F.relu(self.bn1(self.conv1(x)))
        f1 = self.layer1(self.maxpool(f0))
        f2 = self.layer2(f1)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        return [f0, f1, f2, f3, f4]


# ---------------------------------------------------------------------------
# UniFuse decoder building blocks (reference networks/layers.py)
# ---------------------------------------------------------------------------

class TorchConv3x3(nn.Module):
    """networks/layers.py:7-22 (zero-pad + 3x3)."""

    def __init__(self, cin, cout, bias=True):
        super().__init__()
        self.pad = nn.ZeroPad2d(1)
        self.conv = nn.Conv2d(cin, cout, 3, bias=bias)

    def forward(self, x):
        return self.conv(self.pad(x))


class TorchConvBlock(nn.Module):
    """networks/layers.py:49-61 (Conv3x3 + ELU)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TorchConv3x3(cin, cout)
        self.nonlin = nn.ELU(inplace=True)

    def forward(self, x):
        return self.nonlin(self.conv(x))


class TorchSELayer(nn.Module):
    """networks/layers.py:196-211."""

    def __init__(self, channel, reduction=16):
        super().__init__()
        self.avg_pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Sequential(
            nn.Linear(channel, channel // reduction, bias=False),
            nn.ReLU(inplace=True),
            nn.Linear(channel // reduction, channel, bias=False),
            nn.Sigmoid())

    def forward(self, x):
        b, c = x.shape[:2]
        y = self.fc(self.avg_pool(x).view(b, c)).view(b, c, 1, 1)
        return x * y


class TorchCEELayer(nn.Module):
    """networks/layers.py:214-242 (fusion with SE)."""

    def __init__(self, channels, SE=True):
        super().__init__()
        self.res_conv1 = nn.Conv2d(channels * 2, channels, 1, bias=False)
        self.res_bn1 = nn.BatchNorm2d(channels)
        self.res_conv2 = nn.Conv2d(channels, channels, 3, padding=1,
                                   bias=False)
        self.res_bn2 = nn.BatchNorm2d(channels)
        self.relu = nn.ReLU(inplace=True)
        if SE:
            self.selayer = TorchSELayer(channels * 2)
        self.conv = nn.Conv2d(channels * 2, channels, 1, bias=False)

    def forward(self, equi_feat, c2e_feat):
        x = torch.cat([equi_feat, c2e_feat], 1)
        x = self.relu(self.res_bn1(self.res_conv1(x)))
        shortcut = self.res_bn2(self.res_conv2(x))
        x = torch.cat([equi_feat, c2e_feat + shortcut], 1)
        x = self.selayer(x)
        return self.relu(self.conv(x))


def build_unifuse_decoder(num_ch_enc=(64, 64, 128, 256, 512),
                          num_ch_dec=(16, 32, 64, 128, 256)):
    """The decoder ModuleList EXACTLY as the reference constructor
    registers it (networks/unifuse.py:62-95): an OrderedDict filled in
    source order, then ``nn.ModuleList(list(values()))`` — the order the
    converter's ``_UNIFUSE_DECODER_ORDER`` must reproduce."""
    enc, dec = num_ch_enc, num_ch_dec
    d = OrderedDict()
    d["fusion_5"] = TorchCEELayer(enc[4])
    d["upconv_5"] = TorchConvBlock(enc[4], dec[4])
    d["fusion_4"] = TorchCEELayer(enc[3])
    d["deconv_4"] = TorchConvBlock(dec[4] + enc[3], dec[4])
    d["upconv_4"] = TorchConvBlock(dec[4], dec[3])
    d["fusion_3"] = TorchCEELayer(enc[2])
    d["deconv_3"] = TorchConvBlock(dec[3] + enc[2], dec[3])
    d["upconv_3"] = TorchConvBlock(dec[3], dec[2])
    d["fusion_2"] = TorchCEELayer(enc[1])
    d["deconv_2"] = TorchConvBlock(dec[2] + enc[1], dec[2])
    d["upconv_2"] = TorchConvBlock(dec[2], dec[1])
    d["fusion_1"] = TorchCEELayer(enc[0])
    d["deconv_1"] = TorchConvBlock(dec[1] + enc[0], dec[1])
    d["upconv_1"] = TorchConvBlock(dec[1], dec[0])
    d["deconv_0"] = TorchConvBlock(dec[0], dec[0])
    d["depthconv_0"] = TorchConv3x3(dec[0], 1)
    return nn.ModuleList(list(d.values())), list(d.keys())


# ---------------------------------------------------------------------------
# renderer dist decoder (reference network/dist_decoder.py:53-99)
# ---------------------------------------------------------------------------

class TorchAddBias(nn.Module):
    def __init__(self, val):
        super().__init__()
        self.val = val

    def forward(self, x):
        return x + self.val


class TorchMixtureLogisticsDistDecoder(nn.Module):
    def __init__(self, feats_dim=32, bias_val=0.05, use_vis=False):
        super().__init__()

        def head(out, final, bias=None):
            mods = [nn.Linear(feats_dim, feats_dim), nn.ELU(),
                    nn.Linear(feats_dim, feats_dim), nn.ELU(),
                    nn.Linear(feats_dim, out), final]
            if bias is not None:
                mods.append(TorchAddBias(bias))
            return nn.Sequential(*mods)

        self.mean_decoder = head(2, nn.Softplus())
        self.var_decoder = head(2, nn.Softplus(), bias_val)
        self.aw_decoder = head(1, nn.Sigmoid())
        if use_vis:
            self.vis_decoder = head(1, nn.Sigmoid())

    def forward(self, feats):
        return (self.mean_decoder(feats), self.var_decoder(feats),
                self.aw_decoder(feats))


# ---------------------------------------------------------------------------
# aggregation net linear stacks (reference network/ibrnet.py:239-320 —
# every stack is nn.Sequential(Linear, act, Linear[, act, Linear]))
# ---------------------------------------------------------------------------

def build_agg_sequentials(neuray_dim=32, in_feat_ch=32):
    f = in_feat_ch + 3
    mods = {
        "prob_embed": nn.Sequential(
            nn.Linear(neuray_dim + 2, 32), nn.ReLU(), nn.Linear(32, 32)),
        "ray_dir_fc": nn.Sequential(
            nn.Linear(4, 16), nn.ReLU(), nn.Linear(16, f)),
        "base_fc": nn.Sequential(
            nn.Linear(f * 5 + neuray_dim, 64), nn.ReLU(),
            nn.Linear(64, 32)),
        "vis_fc": nn.Sequential(
            nn.Linear(32, 32), nn.ReLU(), nn.Linear(32, 33)),
        "vis_fc2": nn.Sequential(
            nn.Linear(32, 32), nn.ReLU(), nn.Linear(32, 1)),
        "geometry_fc": nn.Sequential(
            nn.Linear(65, 64), nn.ReLU(), nn.Linear(64, 16)),
        "neuray_fc": nn.Sequential(
            nn.Linear(neuray_dim, 8), nn.ReLU(), nn.Linear(8, 1)),
        "out_geometry_fc": nn.Sequential(
            nn.Linear(16, 16), nn.ReLU(), nn.Linear(16, 1)),
        "rgb_fc": nn.Sequential(
            nn.Linear(32 + 1 + 4, 16), nn.ReLU(), nn.Linear(16, 8),
            nn.ReLU(), nn.Linear(8, 1)),
    }
    return mods
