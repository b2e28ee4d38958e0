"""Full-model numerical parity: flax DeepLabV3+ vs a raw-torch mirror.

Extends the encoder parity test to the whole flagship model: the same weights
are loaded into both frameworks and eval-mode forward outputs are compared.
Covers ASPP (incl. the pooling-branch broadcast), separable convs, the
align_corners=True bilinear upsampling path, BN eval semantics, and the head.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecologysemanticsegmentation_tpu.models import DeepLabV3Plus

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

from test_encoder_torch_parity import TorchResNet34Encoder  # noqa: E402


def _t(x):  # flax HWIO -> torch OIHW
    return torch.from_numpy(np.asarray(x).transpose(3, 2, 0, 1).copy())


class _TorchConvBN(nn.Module):
    def __init__(self, in_ch, out_ch, k=3, dilation=1, bias=False, act=True):
        super().__init__()
        pad = (k - 1) * dilation // 2
        self.conv = nn.Conv2d(in_ch, out_ch, k, 1, pad, dilation=dilation, bias=bias)
        self.bn = nn.BatchNorm2d(out_ch)
        self.act = act

    def load(self, p, s):
        self.conv.weight.data = _t(p["conv"]["kernel"])
        self.bn.weight.data = torch.from_numpy(np.asarray(p["bn"]["scale"]).copy())
        self.bn.bias.data = torch.from_numpy(np.asarray(p["bn"]["bias"]).copy())
        self.bn.running_mean.data = torch.from_numpy(np.asarray(s["bn"]["mean"]).copy())
        self.bn.running_var.data = torch.from_numpy(np.asarray(s["bn"]["var"]).copy())

    def forward(self, x):
        x = self.bn(self.conv(x))
        return torch.relu(x) if self.act else x


class _TorchSepConvBN(nn.Module):
    def __init__(self, in_ch, out_ch, dilation=1):
        super().__init__()
        pad = 2 * dilation // 2
        self.dw = nn.Conv2d(in_ch, in_ch, 3, 1, pad, dilation=dilation,
                            groups=in_ch, bias=False)
        self.pw = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)

    def load(self, p, s):
        self.dw.weight.data = _t(p["depthwise"]["kernel"])
        self.pw.weight.data = _t(p["pointwise"]["kernel"])
        self.bn.weight.data = torch.from_numpy(np.asarray(p["bn"]["scale"]).copy())
        self.bn.bias.data = torch.from_numpy(np.asarray(p["bn"]["bias"]).copy())
        self.bn.running_mean.data = torch.from_numpy(np.asarray(s["bn"]["mean"]).copy())
        self.bn.running_var.data = torch.from_numpy(np.asarray(s["bn"]["var"]).copy())

    def forward(self, x):
        return torch.relu(self.bn(self.pw(self.dw(x))))


def test_deeplabv3plus_forward_parity(rng):
    num_classes = 3
    model = DeepLabV3Plus(num_classes=num_classes, dtype=jnp.float32)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    # randomize BN stats so eval-mode normalization is exercised
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(rng.normal(0, 0.1, v.shape).astype(np.float32))
        if v.ndim == 1 else v,
        variables["batch_stats"],
    )
    stats = jax.tree_util.tree_map(lambda v: jnp.abs(v) + 0.5, stats)
    variables = {"params": variables["params"], "batch_stats": stats}

    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    # ---- build + load the torch mirror
    p, s = variables["params"], variables["batch_stats"]

    enc = TorchResNet34Encoder(output_stride=16)
    esd = {}
    ep, es = p["encoder"], s["encoder"]
    esd["conv1.weight"] = _t(ep["conv1"]["kernel"])
    for nm, tree, suffix in [("weight", ep, "scale"), ("bias", ep, "bias")]:
        esd[f"bn1.{nm}"] = torch.from_numpy(np.asarray(tree["bn1"][suffix]).copy())
    esd["bn1.running_mean"] = torch.from_numpy(np.asarray(es["bn1"]["mean"]).copy())
    esd["bn1.running_var"] = torch.from_numpy(np.asarray(es["bn1"]["var"]).copy())
    for layer, blocks in [(1, 3), (2, 4), (3, 6), (4, 3)]:
        for b in range(blocks):
            fp = ep[f"layer{layer}_block{b}"]
            fs = es[f"layer{layer}_block{b}"]
            base = f"layer{layer}.{b}"
            for ci in (1, 2):
                esd[f"{base}.conv{ci}.weight"] = _t(fp[f"conv{ci}"]["kernel"])
                for nm, suffix in [("weight", "scale"), ("bias", "bias")]:
                    esd[f"{base}.bn{ci}.{nm}"] = torch.from_numpy(
                        np.asarray(fp[f"bn{ci}"][suffix]).copy())
                esd[f"{base}.bn{ci}.running_mean"] = torch.from_numpy(
                    np.asarray(fs[f"bn{ci}"]["mean"]).copy())
                esd[f"{base}.bn{ci}.running_var"] = torch.from_numpy(
                    np.asarray(fs[f"bn{ci}"]["var"]).copy())
            if "downsample_conv" in fp:
                esd[f"{base}.downsample.0.weight"] = _t(fp["downsample_conv"]["kernel"])
                for nm, suffix in [("weight", "scale"), ("bias", "bias")]:
                    esd[f"{base}.downsample.1.{nm}"] = torch.from_numpy(
                        np.asarray(fp["downsample_bn"][suffix]).copy())
                esd[f"{base}.downsample.1.running_mean"] = torch.from_numpy(
                    np.asarray(fs["downsample_bn"]["mean"]).copy())
                esd[f"{base}.downsample.1.running_var"] = torch.from_numpy(
                    np.asarray(fs["downsample_bn"]["var"]).copy())
    enc.load_state_dict(esd)
    enc.eval()

    ap, asb = p["aspp"], s["aspp"]
    conv1x1 = _TorchConvBN(512, 256, k=1); conv1x1.load(ap["conv1x1"], asb["conv1x1"])
    atrous = []
    for i, rate in enumerate((12, 24, 36)):
        m = _TorchSepConvBN(512, 256, dilation=rate)
        m.load(ap[f"atrous{i}"], asb[f"atrous{i}"])
        atrous.append(m.eval())
    pool_conv = _TorchConvBN(512, 256, k=1); pool_conv.load(ap["pool_conv"], asb["pool_conv"])
    project = _TorchConvBN(256 * 5, 256, k=1); project.load(ap["project"], asb["project"])
    aspp_out = _TorchSepConvBN(256, 256); aspp_out.load(p["aspp_out"], s["aspp_out"])
    low_project = _TorchConvBN(64, 48, k=1); low_project.load(p["low_project"], s["low_project"])
    fuse = _TorchSepConvBN(256 + 48, 256); fuse.load(p["fuse"], s["fuse"])
    head_w = _t(p["head"]["kernel"])
    head_b = torch.from_numpy(np.asarray(p["head"]["bias"]).copy())
    for m in (conv1x1, pool_conv, project, aspp_out, low_project, fuse):
        m.eval()

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        xe = torch.relu(enc.bn1(enc.conv1(xt)))
        low = enc.layer1(enc.maxpool(xe))
        high = enc.layer4(enc.layer3(enc.layer2(low)))

        branches = [conv1x1(high)] + [m(high) for m in atrous]
        pooled = pool_conv(high.mean(dim=(2, 3), keepdim=True))
        branches.append(pooled.expand_as(branches[0]))
        y = project(torch.cat(branches, dim=1))
        y = aspp_out(y)
        y = F.interpolate(y, size=low.shape[2:], mode="bilinear", align_corners=True)
        y = fuse(torch.cat([y, low_project(low)], dim=1))
        y = F.conv2d(y, head_w, head_b)  # smp head: 1x1, no padding
        ref = F.interpolate(y, size=(64, 64), mode="bilinear", align_corners=True)

    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-4)
