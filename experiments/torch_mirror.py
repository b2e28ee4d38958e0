"""Trainable raw-torch mirror of the flagship DeepLabV3+ (resnet34, OS16).

Used ONLY for the end-to-end Dice-parity experiment (see dice_parity.py):
the mirror replicates the reference's trained architecture
(smp.DeepLabV3Plus(encoder_name="resnet34"), reference
``train_multiclass.py:347-353``) and can be initialized from the flax
flagship's variables so both frameworks start from identical weights.

Reuses the per-module mirrors already validated by the forward-parity tests
(tests/test_model_torch_parity.py, tests/test_encoder_torch_parity.py).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

_TESTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
if _TESTS_DIR not in sys.path:
    sys.path.insert(0, _TESTS_DIR)

from test_encoder_torch_parity import TorchResNet34Encoder  # noqa: E402
from test_model_torch_parity import _TorchConvBN, _TorchSepConvBN, _t  # noqa: E402


class TorchDeepLabV3Plus(nn.Module):
    """Reference-architecture DeepLabV3+ assembled from the validated mirrors."""

    def __init__(self, num_classes: int = 3, dropout: float = 0.0):
        super().__init__()
        self.encoder = TorchResNet34Encoder(output_stride=16)
        self.conv1x1 = _TorchConvBN(512, 256, k=1)
        self.atrous = nn.ModuleList(
            [_TorchSepConvBN(512, 256, dilation=r) for r in (12, 24, 36)]
        )
        self.pool_conv = _TorchConvBN(512, 256, k=1)
        self.project = _TorchConvBN(256 * 5, 256, k=1)
        self.drop = nn.Dropout(dropout)
        self.aspp_out = _TorchSepConvBN(256, 256)
        self.low_project = _TorchConvBN(64, 48, k=1)
        self.fuse = _TorchSepConvBN(256 + 48, 256)  # smp order: [aspp, low]
        self.head = nn.Conv2d(256, num_classes, 1)  # smp SegmentationHead k=1

    def forward(self, x):
        xe = torch.relu(self.encoder.bn1(self.encoder.conv1(x)))
        low = self.encoder.layer1(self.encoder.maxpool(xe))
        high = self.encoder.layer4(self.encoder.layer3(self.encoder.layer2(low)))
        branches = [self.conv1x1(high)] + [m(high) for m in self.atrous]
        pooled = self.pool_conv(high.mean(dim=(2, 3), keepdim=True))
        branches.append(pooled.expand_as(branches[0]))
        y = self.drop(self.project(torch.cat(branches, 1)))
        y = self.aspp_out(y)
        y = F.interpolate(y, size=low.shape[2:], mode="bilinear", align_corners=True)
        y = self.fuse(torch.cat([y, self.low_project(low)], 1))
        y = self.head(y)
        return F.interpolate(y, size=x.shape[2:], mode="bilinear", align_corners=True)

    # ------------------------------------------------------------------
    def load_from_flax(self, variables) -> None:
        """Copy the flax flagship's params + BN stats into this mirror
        (same mapping the forward-parity test uses)."""
        p, s = variables["params"], variables["batch_stats"]

        esd = {}
        ep, es = p["encoder"], s["encoder"]
        esd["conv1.weight"] = _t(ep["conv1"]["kernel"])
        esd["bn1.weight"] = torch.from_numpy(np.asarray(ep["bn1"]["scale"]).copy())
        esd["bn1.bias"] = torch.from_numpy(np.asarray(ep["bn1"]["bias"]).copy())
        esd["bn1.running_mean"] = torch.from_numpy(np.asarray(es["bn1"]["mean"]).copy())
        esd["bn1.running_var"] = torch.from_numpy(np.asarray(es["bn1"]["var"]).copy())
        for layer, blocks in [(1, 3), (2, 4), (3, 6), (4, 3)]:
            for b in range(blocks):
                fp, fs = ep[f"layer{layer}_block{b}"], es[f"layer{layer}_block{b}"]
                base = f"layer{layer}.{b}"
                for ci in (1, 2):
                    esd[f"{base}.conv{ci}.weight"] = _t(fp[f"conv{ci}"]["kernel"])
                    esd[f"{base}.bn{ci}.weight"] = torch.from_numpy(
                        np.asarray(fp[f"bn{ci}"]["scale"]).copy())
                    esd[f"{base}.bn{ci}.bias"] = torch.from_numpy(
                        np.asarray(fp[f"bn{ci}"]["bias"]).copy())
                    esd[f"{base}.bn{ci}.running_mean"] = torch.from_numpy(
                        np.asarray(fs[f"bn{ci}"]["mean"]).copy())
                    esd[f"{base}.bn{ci}.running_var"] = torch.from_numpy(
                        np.asarray(fs[f"bn{ci}"]["var"]).copy())
                if "downsample_conv" in fp:
                    esd[f"{base}.downsample.0.weight"] = _t(fp["downsample_conv"]["kernel"])
                    esd[f"{base}.downsample.1.weight"] = torch.from_numpy(
                        np.asarray(fp["downsample_bn"]["scale"]).copy())
                    esd[f"{base}.downsample.1.bias"] = torch.from_numpy(
                        np.asarray(fp["downsample_bn"]["bias"]).copy())
                    esd[f"{base}.downsample.1.running_mean"] = torch.from_numpy(
                        np.asarray(fs["downsample_bn"]["mean"]).copy())
                    esd[f"{base}.downsample.1.running_var"] = torch.from_numpy(
                        np.asarray(fs["downsample_bn"]["var"]).copy())
        self.encoder.load_state_dict(esd)

        ap, asb = p["aspp"], s["aspp"]
        self.conv1x1.load(ap["conv1x1"], asb["conv1x1"])
        for i in range(3):
            self.atrous[i].load(ap[f"atrous{i}"], asb[f"atrous{i}"])
        self.pool_conv.load(ap["pool_conv"], asb["pool_conv"])
        self.project.load(ap["project"], asb["project"])
        self.aspp_out.load(p["aspp_out"], s["aspp_out"])
        self.low_project.load(p["low_project"], s["low_project"])
        self.fuse.load(p["fuse"], s["fuse"])
        self.head.weight.data = _t(p["head"]["kernel"])
        self.head.bias.data = torch.from_numpy(np.asarray(p["head"]["bias"]).copy())
