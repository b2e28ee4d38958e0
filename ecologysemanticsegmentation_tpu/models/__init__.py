"""Model zoo: DeepLabV3+ (flagship), ResNet U-Net, VGG19-BN U-Net.

The reference's live scripts train ``smp.DeepLabV3Plus(resnet34)``
(``train_multiclass.py:347-353``); its registry/README also describe
ResNet-Unet and a custom VGG U-Net.  All are provided here as NHWC flax
modules.  ``build_model`` is the factory the CLI entry points use
(equivalent of the sequential script's ``unet_model(depthwise)`` factory,
reference ``train_multiclass_sequential_densenetloss.py:434-451``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import StochasticDropout, ConvBNAct, SeparableConvBNAct
from .fold_bn import fold_batchnorm
from .deeplabv3plus import ASPP, DeepLabV3Plus, DeepLabV3PlusDepthwise
from .resnet import ResNetEncoder, resnet34, resnet50, ENCODER_FEATURES
from .efficientnet_v2s import (
    EfficientNetV2SEncoder,
    EfficientNetV2SUNet,
    FusedMBConv,
    MBConv,
)
from .mbdeconv import EfficientNetDeconvDecoder, MBDeconv
from .unet import UNet
from .vgg import VGGUNet, VGGUNetEncoder, VGGUNetDecoder, DeconvNormActivation

MODEL_NAMES = (
    "deeplabv3plus", "deeplabv3plus_depthwise", "unet", "vgg_unet",
    "efficientnet_v2s_unet",
)


def build_model(
    name: str = "deeplabv3plus",
    num_classes: int = 1,
    encoder_name: str = "resnet34",
    max_channels: int = 256,
    depthwise: bool = False,
    deepsupervision: bool = False,
    upsample_head: bool = True,
    remat: bool = False,
    dtype=jnp.bfloat16,
):
    """Factory over the zoo.  ``depthwise`` mirrors the ``--depthwiseconv``
    CLI flag (reference sequential trainer).  ``upsample_head=False`` makes
    DeepLabV3+ emit 1/4-resolution logits for the fused head-loss kernel
    (parameters are unchanged; checkpoints are interchangeable).  ``remat``
    enables the VGG U-Net's per-stage rematerialization (numerically
    identical; checkpoints are interchangeable)."""
    if depthwise or name == "deeplabv3plus_depthwise":
        return DeepLabV3PlusDepthwise(
            num_classes=num_classes, encoder_name=encoder_name, dtype=dtype
        )
    if name == "deeplabv3plus":
        return DeepLabV3Plus(
            num_classes=num_classes, encoder_name=encoder_name,
            upsample_head=upsample_head, dtype=dtype,
        )
    if name == "unet":
        return UNet(num_classes=num_classes, encoder_name=encoder_name, dtype=dtype)
    if name == "vgg_unet":
        return VGGUNet(
            num_classes=num_classes, max_channels=max_channels,
            deepsupervision=deepsupervision, remat=remat, dtype=dtype,
        )
    if name == "efficientnet_v2s_unet":
        return EfficientNetV2SUNet(num_classes=num_classes, dtype=dtype)
    raise ValueError(f"unknown model {name!r}; choose from {MODEL_NAMES}")


__all__ = [
    "ASPP", "DeepLabV3Plus", "DeepLabV3PlusDepthwise", "UNet", "VGGUNet",
    "VGGUNetEncoder", "VGGUNetDecoder", "DeconvNormActivation",
    "ResNetEncoder", "resnet34", "resnet50", "ENCODER_FEATURES",
    "MBDeconv", "EfficientNetDeconvDecoder",
    "EfficientNetV2SEncoder", "EfficientNetV2SUNet", "FusedMBConv", "MBConv",
    "StochasticDropout", "ConvBNAct", "SeparableConvBNAct",
    "build_model", "MODEL_NAMES",
]
