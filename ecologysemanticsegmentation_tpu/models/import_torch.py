"""PyTorch checkpoint -> flax parameter importer.

Pretrained ImageNet encoder init is load-bearing for the reference's accuracy
(SURVEY.md §7 "hard parts"), so this module maps torch state dicts onto the
flax module trees defined in this package:

* torchvision-style ResNet encoder state dicts (``conv1.weight``,
  ``layerN.M.convK.weight``, …) -> :class:`..models.resnet.ResNetEncoder`.
* The reference's own ``torch.save(net.state_dict())`` DeepLabV3Plus
  checkpoints can be mapped for Dice-parity evaluation, including the
  sequential script's ``smp_deeplab_model.``-prefix remap fallback
  (reference ``train_multiclass_sequential_densenetloss.py:392-414``).

Conventions: torch convs are OIHW, flax convs are HWIO; BN
``weight/bias/running_mean/running_var`` map to
``scale/bias``(params) and ``mean/var``(batch_stats).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _t2f_conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def resnet_encoder_from_torch(
    state_dict: Mapping[str, Any], prefix: str = ""
) -> tuple[dict, dict]:
    """Convert a torchvision ResNet state dict into (params, batch_stats)
    trees matching :class:`..models.resnet.ResNetEncoder`.

    ``prefix`` strips a leading namespace (e.g. ``"encoder."`` for smp
    checkpoints).  Classifier (``fc.*``) entries are ignored.
    """
    params: dict = {}
    stats: dict = {}

    def np_(key):
        v = state_dict[prefix + key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def bn(src: str, dst: tuple[str, ...]) -> None:
        _set(params, dst + ("scale",), np_(f"{src}.weight"))
        _set(params, dst + ("bias",), np_(f"{src}.bias"))
        _set(stats, dst + ("mean",), np_(f"{src}.running_mean"))
        _set(stats, dst + ("var",), np_(f"{src}.running_var"))

    _set(params, ("conv1", "kernel"), _t2f_conv(np_("conv1.weight")))
    bn("bn1", ("bn1",))

    layer = 1
    while f"{prefix}layer{layer}.0.conv1.weight" in dict(state_dict) or any(
        k.startswith(f"{prefix}layer{layer}.") for k in state_dict
    ):
        block = 0
        while any(k.startswith(f"{prefix}layer{layer}.{block}.") for k in state_dict):
            src = f"layer{layer}.{block}"
            dst = f"layer{layer}_block{block}"
            conv = 1
            while f"{prefix}{src}.conv{conv}.weight" in state_dict:
                _set(params, (dst, f"conv{conv}", "kernel"), _t2f_conv(np_(f"{src}.conv{conv}.weight")))
                bn(f"{src}.bn{conv}", (dst, f"bn{conv}"))
                conv += 1
            if f"{prefix}{src}.downsample.0.weight" in state_dict:
                _set(
                    params, (dst, "downsample_conv", "kernel"),
                    _t2f_conv(np_(f"{src}.downsample.0.weight")),
                )
                bn(f"{src}.downsample.1", (dst, "downsample_bn"))
            block += 1
        layer += 1
        if layer > 4:
            break
    return params, stats


def vgg19_bn_encoder_from_torch(
    state_dict: Mapping[str, Any], max_channels: int = 512, prefix: str = "features."
) -> tuple[dict, dict]:
    """Convert torchvision ``vgg19_bn`` features into the
    :class:`..models.vgg.VGGUNetEncoder` tree, honoring the ``max_channels``
    truncation rule so widths line up."""
    from .vgg import VGG19_CFG

    params: dict = {}
    stats: dict = {}

    def np_(key):
        v = state_dict[prefix + key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    torch_idx = 0  # index in the torch Sequential
    conv_idx = 0  # our conv counter
    for spec in VGG19_CFG:
        if spec == "M":
            torch_idx += 1
            continue
        if int(spec) > max_channels:
            break
        _set(params, (f"conv{conv_idx}", "kernel"), _t2f_conv(np_(f"{torch_idx}.weight")))
        _set(params, (f"conv{conv_idx}", "bias"), np_(f"{torch_idx}.bias"))
        bn_src = f"{torch_idx + 1}"
        _set(params, (f"bn{conv_idx}", "scale"), np_(f"{bn_src}.weight"))
        _set(params, (f"bn{conv_idx}", "bias"), np_(f"{bn_src}.bias"))
        _set(stats, (f"bn{conv_idx}", "mean"), np_(f"{bn_src}.running_mean"))
        _set(stats, (f"bn{conv_idx}", "var"), np_(f"{bn_src}.running_var"))
        torch_idx += 3  # conv, bn, relu
        conv_idx += 1
    return params, stats


def strip_smp_deeplab_prefix(state_dict: Mapping[str, Any]) -> dict:
    """The sequential script's warm-start remap: strip the
    ``smp_deeplab_model.`` prefix and drop ``segmentation_head`` entries
    (reference ``train_multiclass_sequential_densenetloss.py:392-414``)."""
    out = {}
    for k, v in state_dict.items():
        if "segmentation_head" in k:
            continue
        out[k.removeprefix("smp_deeplab_model.")] = v
    return out
