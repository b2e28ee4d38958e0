"""Numerical forward parity: flax VGGUNet (max_channels=256) vs a torch mirror.

Validates the truncated VGG19-BN encoder, pre-MaxPool skip collection, the
decoder channel plan, nearest x2 upsampling, the concat(encoder, x) order,
LeakyReLU, and the BN+LeakyReLU-on-final-head quirk — all with shared weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecologysemanticsegmentation_tpu.models import VGGUNet
from ecologysemanticsegmentation_tpu.models.vgg import VGG19_CFG, _decoder_plan

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


def _t(x):
    return torch.from_numpy(np.asarray(x).transpose(3, 2, 0, 1).copy())


def _load_bn(bn, p, s):
    bn.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    bn.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())
    bn.running_mean.data = torch.from_numpy(np.asarray(s["mean"]).copy())
    bn.running_var.data = torch.from_numpy(np.asarray(s["var"]).copy())


class TorchDeconvBlock(nn.Module):
    """Mirror of DeconvNormActivation (N x conv/bn/leaky, dropout eval=noop)."""

    def __init__(self, in_ch, out_ch, k, num_blocks, bias=False):
        super().__init__()
        self.stages = nn.ModuleList()
        for i in range(num_blocks):
            conv = nn.Conv2d(in_ch if i == 0 else out_ch, out_ch, k,
                             padding=k // 2, bias=bias)
            self.stages.append(nn.ModuleList([conv, nn.BatchNorm2d(out_ch)]))

    def load(self, p, s):
        for i, (conv, bn) in enumerate(self.stages):
            conv.weight.data = _t(p[f"conv{i}"]["kernel"])
            if conv.bias is not None:
                conv.bias.data = torch.from_numpy(np.asarray(p[f"conv{i}"]["bias"]).copy())
            _load_bn(bn, p[f"bn{i}"], s[f"bn{i}"])

    def forward(self, x):
        for conv, bn in self.stages:
            x = F.leaky_relu(bn(conv(x)), 0.01)
        return x


def test_vgg_unet_forward_parity(rng):
    max_channels = 256
    model = VGGUNet(num_classes=2, max_channels=max_channels, dropout_p=0.05,
                    dtype=jnp.float32)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, jnp.asarray(x), train=False)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.abs(jnp.asarray(rng.normal(0, 0.1, v.shape).astype(np.float32))) + 0.5,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    p_enc, s_enc = variables["params"]["encoder"], variables["batch_stats"]["encoder"]
    p_dec, s_dec = variables["params"]["decoder"], variables["batch_stats"]["decoder"]

    # ---- torch encoder: truncated vgg19_bn features with pre-pool skips
    convs, bns = [], []
    ci = 0
    layer_plan = []  # sequence of ("conv", i) / ("pool",)
    for spec in VGG19_CFG:
        if spec == "M":
            layer_plan.append(("pool",))
            continue
        if int(spec) > max_channels:
            break
        conv = nn.Conv2d(3 if ci == 0 else prev, int(spec), 3, padding=1, bias=True)
        bn = nn.BatchNorm2d(int(spec))
        conv.weight.data = _t(p_enc[f"conv{ci}"]["kernel"])
        conv.bias.data = torch.from_numpy(np.asarray(p_enc[f"conv{ci}"]["bias"]).copy())
        _load_bn(bn, p_enc[f"bn{ci}"], s_enc[f"bn{ci}"])
        convs.append(conv.eval()); bns.append(bn.eval())
        layer_plan.append(("conv", ci))
        prev = int(spec)
        ci += 1

    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        skips = []
        k = 0
        for entry in layer_plan:
            if entry[0] == "pool":
                skips.append(t)
                t = F.max_pool2d(t, 2, 2)
            else:
                t = torch.relu(bns[k](convs[k](t)))
                k += 1
        skips = list(reversed(skips))

        # ---- torch decoder per the channel plan
        channels, upsample = _decoder_plan(max_channels)
        si = 0
        for idx in range(len(channels) - 1):
            out_ch = channels[idx + 1]
            if upsample[idx]:
                t = F.interpolate(t, scale_factor=2)  # nearest
                t = torch.cat([skips[si], t], dim=1)
                si += 1
            nb = 1 if idx == 0 and max_channels == 512 else 3
            blk = TorchDeconvBlock(t.shape[1], out_ch, 3, nb)
            blk.load(p_dec[f"channel_block{idx}"], s_dec[f"channel_block{idx}"])
            t = blk.eval()(t)
            if idx != 0:
                blk2 = TorchDeconvBlock(out_ch, out_ch, 1, 2)
                blk2.load(p_dec[f"conv_block{idx}"], s_dec[f"conv_block{idx}"])
                t = blk2.eval()(t)
        final = TorchDeconvBlock(t.shape[1], 2, 1, 1, bias=True)
        final.load(p_dec["final_conv"], s_dec["final_conv"])
        ref = final.eval()(t).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-4)
