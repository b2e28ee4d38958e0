"""Numerical forward parity: flax ResNet34 encoder vs a torch mirror.

torchvision is unavailable offline, so this test hand-builds the standard
torchvision-style ResNet34 in raw torch, loads the SAME synthetic state dict
into both (via models.import_torch for the flax side), and compares forward
activations.  This validates conv padding, BN eps/affine semantics, stride
placement, and the OS16 dilation pattern numerically — the prerequisites for
checkpoint-level Dice parity with the reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecologysemanticsegmentation_tpu.models import resnet34
from ecologysemanticsegmentation_tpu.models.import_torch import resnet_encoder_from_torch

torch = pytest.importorskip("torch")
nn = torch.nn


class TorchBasicBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class TorchResNet34Encoder(nn.Module):
    def __init__(self, output_stride=16):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths, sizes = (64, 128, 256, 512), (3, 4, 6, 3)
        in_ch = 64
        for li, (w, n) in enumerate(zip(widths, sizes), start=1):
            dilate = li == 4 and output_stride == 16
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and li > 1 and not dilate) else 1
                dil = 2 if dilate else 1
                blocks.append(TorchBasicBlock(in_ch, w, stride, dil))
                in_ch = w
            setattr(self, f"layer{li}", nn.Sequential(*blocks))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


def test_resnet34_forward_parity(rng):
    t_model = TorchResNet34Encoder(output_stride=16).eval()
    # randomize BN stats too so the test is not trivially mean-0/var-1
    sd = t_model.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.from_numpy(rng.normal(0, 0.2, v.shape).astype(np.float32))
        elif k.endswith("running_var"):
            sd[k] = torch.from_numpy((0.5 + rng.rand(*v.shape)).astype(np.float32))
        elif v.dtype == torch.float32:
            sd[k] = torch.from_numpy((0.1 * rng.normal(size=tuple(v.shape))).astype(np.float32))
    t_model.load_state_dict(sd)

    # torch layerN.M.downsample.{0,1} naming matches the importer's contract
    params, stats = resnet_encoder_from_torch(sd)
    enc = resnet34(output_stride=16, dtype=jnp.float32)

    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = t_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = enc.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )[-1]
    ours = np.asarray(ours).transpose(0, 3, 1, 2)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)
