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


def smp_deeplabv3plus_from_torch(
    state_dict: Mapping[str, Any], prefix: str = ""
) -> tuple[dict, dict]:
    """Map a full ``smp.DeepLabV3Plus(encoder_name="resnet34"|"resnet50")``
    state dict (segmentation-models-pytorch 0.3.3 module tree — the model the
    reference trains and checkpoints, ``train_multiclass.py:347-353``) onto
    (params, batch_stats) for :class:`..models.deeplabv3plus.DeepLabV3Plus`.

    smp 0.3.3 key layout (decoders/deeplabv3/decoder.py):

    ========================================  =================================
    smp key                                   flax destination
    ========================================  =================================
    encoder.conv1/bn1/layerN.M.*              encoder.* (torchvision layout)
    decoder.aspp.0.convs.0.{0,1}              aspp.conv1x1.{conv,bn}
    decoder.aspp.0.convs.{1,2,3}.0.{0,1},.1   aspp.atrous{i}.{depthwise,pointwise,bn}
    decoder.aspp.0.convs.4.{1,2}              aspp.pool_conv.{conv,bn} (idx 0 is AdaptiveAvgPool)
    decoder.aspp.0.project.{0,1}              aspp.project.{conv,bn}
    decoder.aspp.{1.0,1.1,2}                  aspp_out.{depthwise,pointwise,bn}
    decoder.block1.{0,1}                      low_project.{conv,bn}
    decoder.block2.0.{0,1}, block2.1          fuse.{depthwise,pointwise,bn}
    segmentation_head.0.{weight,bias}         head.{kernel,bias}
    ========================================  =================================
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

    def conv_bn(conv_src: str, bn_src: str, dst: str) -> None:
        _set(params, (dst, "conv", "kernel"), _t2f_conv(np_(f"{conv_src}.weight")))
        bn(bn_src, (dst, "bn"))

    def sep_conv_bn(sep_src: str, bn_src: str, dst: str) -> None:
        _set(params, (dst, "depthwise", "kernel"), _t2f_conv(np_(f"{sep_src}.0.weight")))
        _set(params, (dst, "pointwise", "kernel"), _t2f_conv(np_(f"{sep_src}.1.weight")))
        bn(bn_src, (dst, "bn"))

    enc_params, enc_stats = resnet_encoder_from_torch(state_dict, prefix=prefix + "encoder.")
    params["encoder"], stats["encoder"] = enc_params, enc_stats

    conv_bn("decoder.aspp.0.convs.0.0", "decoder.aspp.0.convs.0.1", "conv1x1")
    for i in range(3):
        sep_conv_bn(
            f"decoder.aspp.0.convs.{i + 1}.0", f"decoder.aspp.0.convs.{i + 1}.1",
            f"atrous{i}",
        )
    conv_bn("decoder.aspp.0.convs.4.1", "decoder.aspp.0.convs.4.2", "pool_conv")
    conv_bn("decoder.aspp.0.project.0", "decoder.aspp.0.project.1", "project")
    aspp = {k: params.pop(k) for k in
            ("conv1x1", "atrous0", "atrous1", "atrous2", "pool_conv", "project")}
    aspp_stats = {k: stats.pop(k) for k in list(aspp)}
    params["aspp"], stats["aspp"] = aspp, aspp_stats

    sep_conv_bn("decoder.aspp.1", "decoder.aspp.2", "aspp_out")
    conv_bn("decoder.block1.0", "decoder.block1.1", "low_project")
    sep_conv_bn("decoder.block2.0", "decoder.block2.1", "fuse")

    _set(params, ("head", "kernel"), _t2f_conv(np_("segmentation_head.0.weight")))
    _set(params, ("head", "bias"), np_("segmentation_head.0.bias"))
    return params, stats


def smp_checkpoint_to_variables(state_dict: Mapping[str, Any]) -> dict:
    """Convert a reference checkpoint (``torch.save(net.state_dict())``) into
    flax ``{"params", "batch_stats"}`` for the matching zoo model.

    Detects the ``--depthwiseconv`` wrapper layout
    (``smp_deeplab_model.*`` + ``last_layers.*``, reference
    ``model/deeplabv3plus_depthwise.py``) and maps it onto
    :class:`..models.deeplabv3plus.DeepLabV3PlusDepthwise`.
    """
    if any(k.startswith("smp_deeplab_model.") for k in state_dict):
        inner_p, inner_s = smp_deeplabv3plus_from_torch(
            state_dict, prefix="smp_deeplab_model."
        )
        params: dict = {"smp_deeplab_model": inner_p}
        stats: dict = {"smp_deeplab_model": inner_s}
        w = state_dict["last_layers.weight"]
        b = state_dict["last_layers.bias"]
        np_w = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)
        np_b = np.asarray(b.detach().cpu().numpy() if hasattr(b, "detach") else b)
        _set(params, ("last_layers", "kernel"), _t2f_conv(np_w))
        _set(params, ("last_layers", "bias"), np_b)
        return {"params": params, "batch_stats": stats}
    params, stats = smp_deeplabv3plus_from_torch(state_dict)
    return {"params": params, "batch_stats": stats}


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
